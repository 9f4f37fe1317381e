"""In-graph UNet forward ablations at full scale (1024x576x25, CFG batch 2).

Monkeypatches the single attention call site in models/layers.py to measure
what each routing decision is worth inside the compiled graph (micro-benches
carry a ~30 ms tunnel-sync floor each; these don't).

  current  — ops.attention auto routing (kv=1 broadcast shortcut included)
  no_attn  — attention replaced by identity(q): total attention prize pool
  l1_xla   — spatial seq<=2304 routed to the einsum path (fp32 logits in HBM)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def build(variant):
    from evoworld_tpu.models import layers
    from evoworld_tpu.ops import attention as att

    if variant == "current":
        layers.multi_head_attention = att.multi_head_attention
    elif variant == "no_attn":
        layers.multi_head_attention = lambda q, k, v, impl="auto": jnp.broadcast_to(
            v[:, :1], q.shape
        ).astype(q.dtype)
    elif variant == "l1_xla":
        def route(q, k, v, impl="auto"):
            if 1024 <= q.shape[1] <= 2304:
                return att.multi_head_attention(q, k, v, impl="xla")
            return att.multi_head_attention(q, k, v, impl="auto")
        layers.multi_head_attention = route
    else:
        raise ValueError(variant)

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


def bench(variant):
    fn, params, sample = build(variant)
    t0 = time.time()
    out = fn(params, sample)
    _ = float(jnp.sum(out[:, ::7, ::17, ::31].astype(jnp.float32)))
    print(f"{variant}: compile+run {time.time()-t0:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.time()
        out = fn(params, sample)
        _ = float(jnp.sum(out[:, ::7, ::17, ::31].astype(jnp.float32)))
        times.append(time.time() - t0)
    print(f"{variant}: steady {min(times):.3f}s (all: {[f'{t:.3f}' for t in times]})", flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    for v in sys.argv[1:] or ["current", "no_attn", "l1_xla"]:
        bench(v)
