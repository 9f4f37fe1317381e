"""Attempt: full-scale VGGT-1B forward on the real chip (S=49 frames).

Round-1 status: remote compile of the 1B module broke the transport pipe.
The aggregator now runs as 4 segmented scans (program is one block pair per
segment), which should keep the HLO small.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from evoworld_tpu.config import EvoWorldConfig
from evoworld_tpu.runtime import build_reconstructor


def main():
    t0 = time.time()
    print("devices:", jax.devices(), flush=True)
    config = EvoWorldConfig()
    rec = build_reconstructor(config)
    print(f"reconstructor built (+{time.time()-t0:.0f}s)", flush=True)

    rng = np.random.default_rng(0)
    s = 49
    imgs = jnp.asarray(rng.uniform(size=(s, 384, 512, 3)).astype(np.float32))

    t0 = time.time()
    out = rec(imgs)
    print(f"dispatched (+{time.time()-t0:.1f}s)", flush=True)
    cs = float(jnp.sum(out["world_points"][::7, ::31, ::31]))
    print(f"first call (compile+run): {time.time()-t0:.1f}s checksum={cs:.3f}", flush=True)
    for _ in range(2):
        t0 = time.time()
        out = rec(imgs)
        cs = float(jnp.sum(out["world_points"][::7, ::31, ::31]))
        print(f"steady: {time.time()-t0:.2f}s checksum={cs:.3f}")
    print("shapes:", {k: tuple(v.shape) for k, v in out.items()})


if __name__ == "__main__":
    main()
