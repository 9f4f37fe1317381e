"""Round-3 denoise-path hunt: can the L1 spatial attention (S=2304, 5 layers)
or the fp32-softmax einsum path be beaten inside the full compiled forward?

Round-2 established: forward floor ~1.955 s with S=2304 on the einsum path
(fp32 logits; ~10.6 GB transient per layer) and S=9216 on the builtin flash
kernel with 1024-tiles. The builtin flash at S=2304 with default 256-tiles
measured slightly WORSE (2.013 s) — hypothesis: grid overhead (500 batch x
9x9 tiles). Variants here test bigger tiles (768) and a bf16-softmax einsum.

Run on the TPU tunnel: python scripts/exp_l1_attn.py [variant ...]
Variants: current l1_flash768 l1_flash_default l1_bf16sm no_attn
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from evoworld_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def flash_with_tiles(q, k, v, scale, bq, bk):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention,
    )

    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    blk = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_q_dkv=bq,
        block_k_dkv=bk, block_q_dq=bq, block_k_dq=bk, block_k_major_dq=bk,
    )
    out = flash_attention(qt, kt, vt, causal=False, sm_scale=scale, block_sizes=blk)
    return jnp.swapaxes(out, 1, 2)


def bf16_softmax_attention(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale   # stays bf16
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def build(variant):
    from evoworld_tpu.models import layers
    from evoworld_tpu.ops import attention as att

    def route(q, k, v, impl="auto"):
        s = q.shape[1]
        if s == 2304:
            scale = 1.0 / (q.shape[-1] ** 0.5)
            if variant == "l1_flash768":
                return flash_with_tiles(q, k, v, scale, 768, 768)
            if variant == "l1_flash_default":
                return att.multi_head_attention(q, k, v, impl="builtin")
            if variant == "l1_bf16sm":
                return bf16_softmax_attention(q, k, v, scale)
        return att.multi_head_attention(q, k, v, impl="auto")

    if variant == "current":
        layers.multi_head_attention = att.multi_head_attention
    elif variant == "no_attn":
        layers.multi_head_attention = lambda q, k, v, impl="auto": jnp.broadcast_to(
            v[:, :1], q.shape
        ).astype(q.dtype)
    else:
        layers.multi_head_attention = route

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
    float(jnp.sum(out[..., 0, 0, 0]))
    print(f"{variant}: compile+run {time.time()-t0:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.time()
        out = fn(params, sample)
        float(jnp.sum(out[..., 0, 0, 0]))
        times.append(time.time() - t0)
    print(f"{variant}: forward {min(times)*1000:.0f} ms", flush=True)


if __name__ == "__main__":
    variants = sys.argv[1:] or ["current", "l1_flash768", "l1_bf16sm"]
    for v in variants:
        bench(v)
