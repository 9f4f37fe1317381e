"""Full-architecture UNet forward bench at the production hot shape.

The single unit whose 25x repeat dominates the clip time
(/root/reference/evoworld/pipeline/pipeline_evoworld.py:689-725 — 25 Euler
steps x 2-way CFG). Prints `forward N ms`; used standalone and as the child
of scripts/exp_xla_flags.py (flags must be set before backend init, so the
sweep re-execs this in subprocesses).

Run on the TPU tunnel: python scripts/exp_unet_fwd.py
"""

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from evoworld_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def unet_forward():
    from evoworld_tpu.models import unet as unet_mod

    config = unet_mod.UNetConfig()
    model = unet_mod.UNetSpatioTemporal(config)
    f, h, w = 25, 72, 128
    sample = jnp.zeros((2, f, h, w, config.in_channels), jnp.bfloat16)
    context = jnp.zeros((2, 1, config.cross_attention_dim), jnp.bfloat16)
    time_ids = jnp.zeros((2, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda k: model.init(k, sample[:1, :2], jnp.asarray(1.0), context[:1], time_ids[:1]),
        jax.random.key(0),
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes)
    fn = jax.jit(lambda p, s: model.apply(p, s, jnp.asarray(1.0), context, time_ids))
    # TPU-only compiler flags can't ride XLA_FLAGS here: flag parsing is
    # client-side (CPU build, dies on unknown flags) while the compile is
    # server-side over the tunnel. Per-jit compiler_options reach the
    # backend compiler directly. EVW_COMPILER_OPTIONS='{"flag": "val"}'.
    opts = os.environ.get("EVW_COMPILER_OPTIONS")
    if opts:
        compiled = fn.lower(params, sample).compile(
            compiler_options=json.loads(opts))
        fn = lambda p, s: compiled(p, s)  # noqa: E731
    t0 = time.time()
    out = fn(params, sample)
    float(jnp.sum(out[..., 0, 0, 0]))
    print(f"unet: compile+run {time.time()-t0:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.time()
        out = fn(params, sample)
        float(jnp.sum(out[..., 0, 0, 0]))
        times.append(time.time() - t0)
    print(f"unet: forward {min(times)*1000:.0f} ms", flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    unet_forward()
