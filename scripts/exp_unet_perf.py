"""UNet forward perf ablations on the real chip (full 1024x576x25 shape).

Baseline (round 1): 2.12 s per CFG-batched forward = ~41% MXU.
Variants:
  base      — as shipped (fp32 norm statistics)
  bf16norm  — norm statistics in bf16 (measures the fp32 cast-chain cost)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def build(norm_dtype):
    from evoworld_tpu.models import layers

    # _NORM_DTYPE is read at trace time inside the norm __call__s, so setting
    # it before (re)jitting is sufficient.
    layers._NORM_DTYPE = norm_dtype
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
    return fn, params, sample


def bench(name, norm_dtype):
    fn, params, sample = build(norm_dtype)
    t0 = time.time()
    out = fn(params, sample)
    _ = float(jnp.sum(out[:, ::7, ::17, ::31].astype(jnp.float32)))
    print(f"{name}: compile+run {time.time()-t0:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.time()
        out = fn(params, sample)
        _ = float(jnp.sum(out[:, ::7, ::17, ::31].astype(jnp.float32)))
        times.append(time.time() - t0)
    print(f"{name}: steady {min(times):.3f}s (all: {[f'{t:.3f}' for t in times]})", flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    bench("base_fp32norm", jnp.float32)
    bench("bf16norm", jnp.bfloat16)
