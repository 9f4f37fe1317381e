"""Block-level UNet cost decomposition on the real chip.

Each candidate module runs 16x inside a lax.scan so the ~30 ms tunnel sync
floor and dispatch amortize away; reported number is per-iteration. Shapes
are the full-scale L0/L1 shapes (CFG batch 2 x 25 frames).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from flax import linen as nn

REPS = 16


def scan_bench(name, module, *args, extra=None):
    """Time module.apply repeated REPS times via lax.scan (params zero-init)."""
    shapes = jax.eval_shape(lambda k: module.init(k, *args), jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.bfloat16 else s.dtype), shapes)

    def body(x, _):
        out = module.apply(params, x, *args[1:])
        # keep shapes closed: feed the first-arg-shaped output back in
        return (out if out.shape == x.shape else x), ()

    fn = jax.jit(lambda x: jax.lax.scan(body, x, None, length=REPS)[0])
    x = args[0]
    out = fn(x)
    _ = float(jnp.sum(out.astype(jnp.float32).ravel()[:64]))
    ts = []
    for _i in range(3):
        t0 = time.time()
        out = fn(x)
        _ = float(jnp.sum(out.astype(jnp.float32).ravel()[:64]))
        ts.append(time.time() - t0)
    per = (min(ts)) / REPS * 1e3
    print(f"{name}: {per:.2f} ms/iter  (scan total {min(ts)*1e3:.0f} ms)", flush=True)
    return per


def main():
    from evoworld_tpu.models.layers import (
        GroupNorm, SpatioTemporalResBlock, TransformerSpatioTemporalModel,
    )

    print(jax.devices(), flush=True)
    key = jax.random.key(0)
    f = 25
    bf = 2 * f  # batch*frames rows

    for ch, h, w, heads, label in [(320, 72, 128, 5, "L0"), (640, 36, 64, 10, "L1")]:
        x = jax.random.normal(key, (bf, h, w, ch), jnp.bfloat16)
        temb = jnp.zeros((bf, 1280), jnp.bfloat16)
        ind = jnp.zeros((2, f), jnp.bfloat16)
        ctx = jnp.zeros((bf, 1, 1024), jnp.bfloat16)

        res = SpatioTemporalResBlock(ch)
        scan_bench(f"{label} SpatioTemporalResBlock ({ch}ch {h}x{w})", res, x, temb, f, ind)

        tr = TransformerSpatioTemporalModel(heads, ch // heads, cross_dim=1024)
        scan_bench(f"{label} TransformerSpatioTemporal ({ch}ch)", tr, x, ctx, f, ind)

        gn = GroupNorm()
        scan_bench(f"{label} GroupNorm", gn, x)


if __name__ == "__main__":
    main()
