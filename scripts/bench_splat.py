"""Time the memory splat renderer on the real chip (24 views, ~4.5M points).

Round-1 scatter renderer measured 26.6 s for this workload; target <5 s.
Timing forces a scalar readback (block_until_ready is a no-op over the
TPU tunnel, CLAUDE.md).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from evoworld_tpu.memory.render import render_memory_panoramas


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    n = 4_500_000
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 5.0
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    valid = rng.uniform(size=(n,)) > 0.1
    poses = np.tile(np.eye(4, dtype=np.float32)[:3], (24, 1, 1))
    poses[:, :, 3] = rng.normal(size=(24, 3)) * 0.5

    fn = jax.jit(lambda p, c, v, t: render_memory_panoramas(p, c, v, t))
    args = [jnp.asarray(x) for x in (pts, cols, valid, poses)]

    t0 = time.time()
    out = fn(*args)
    s = float(jnp.sum(out[:, ::97, ::97]))
    print(f"first call (compile+run): {time.time()-t0:.2f}s checksum={s:.3f}")

    for _ in range(2):
        t0 = time.time()
        out = fn(*args)
        s = float(jnp.sum(out[:, ::97, ::97]))
        dt = time.time() - t0
        print(f"steady: {dt:.2f}s ({dt/24*1000:.0f} ms/view) checksum={s:.3f}")


if __name__ == "__main__":
    main()
