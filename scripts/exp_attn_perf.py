"""Attention + block-level microbenches on the real chip.

Decomposes the 2.12 s full-scale UNet forward (1024x576x25, CFG batch 2)
into its attention shapes to find the non-MXU time. Level shapes mirror
models/unet.py at latents 72x128:

  level 0: 50x(72*128=9216) tokens, 320 ch,  5 heads   (flash path)
  level 1: 50x(36*64=2304)  tokens, 640 ch, 10 heads   (flash path)
  level 2: 50x(18*32=576)   tokens, 1280 ch, 20 heads  (XLA path: seq<1024)
  mid:     50x(18*32=576)   tokens, 1280 ch, 20 heads
  temporal (per level): (2*S) x 25 tokens
  cross   (per level): S q-tokens x 1 kv-token
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, n=3):
    out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32).ravel()[:128]))
    ts = []
    for _i in range(n):
        t0 = time.time()
        out = fn(*args)
        _ = float(jnp.sum(out.astype(jnp.float32).ravel()[:128]))
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms  (all {[f'{t*1e3:.0f}' for t in ts]})", flush=True)
    return min(ts)


def main():
    from evoworld_tpu.ops.attention import multi_head_attention

    print(jax.devices(), flush=True)
    key = jax.random.key(0)

    total = 0.0
    # (label, B, S, H, D, impl)
    shapes = [
        ("spatial_L0 (B50 S9216 H5)", 50, 9216, 5, 64),
        ("spatial_L1 (B50 S2304 H10)", 50, 2304, 10, 64),
        ("spatial_L2 (B50 S576 H20)", 50, 576, 20, 64),
        ("spatial_mid (B50 S576 H20)", 50, 576, 20, 64),
    ]
    for label, b, s, h, d in shapes:
        q = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
        fn = jax.jit(lambda q: multi_head_attention(q, q, q, impl="auto"))
        t = timeit(f"{label} auto", fn, q)
        total += t
        if s <= 2304:  # larger: fp32 logits don't fit HBM
            fn2 = jax.jit(lambda q: multi_head_attention(q, q, q, impl="xla"))
            timeit(f"{label} xla ", fn2, q)
        if s % 256 == 0:
            fn3 = jax.jit(lambda q: multi_head_attention(q, q, q, impl="builtin"))
            timeit(f"{label} flsh", fn3, q)

    # temporal attention per level (x2 per transformer block: only 1 temporal
    # self-attn per block in SVD; B = 2*spatial_tokens)
    for label, b, s, h, d in [
        ("temporal_L0 (B18432 S25 H5)", 2 * 9216, 25, 5, 64),
        ("temporal_L1 (B4608 S25 H10)", 2 * 2304, 25, 10, 64),
        ("temporal_L2 (B1152 S25 H20)", 2 * 576, 25, 20, 64),
    ]:
        q = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
        fn = jax.jit(lambda q: multi_head_attention(q, q, q, impl="auto"))
        t = timeit(f"{label} auto", fn, q)
        total += t

    # cross attention: kv len 1
    for label, b, s, h, d in [
        ("cross_L0 (B50 S9216 Skv1 H5)", 50, 9216, 5, 64),
    ]:
        q = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
        kv = jax.random.normal(key, (b, 1, h, d), jnp.bfloat16)
        fn = jax.jit(lambda q, kv: multi_head_attention(q, kv, kv, impl="auto"))
        t = timeit(f"{label} auto", fn, q, kv)
        total += t

    print(f"one-shot attention total (x block counts gives full-model share): {total*1e3:.0f} ms")

    # Conv anchor: one spatial 3x3 resnet conv at L0 and a temporal conv.
    x = jax.random.normal(key, (50, 72, 128, 320), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 320, 320), jnp.bfloat16) * 0.02
    conv = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
    timeit("conv3x3_L0 (50x72x128x320->320)", conv, x, w)

    xt = jax.random.normal(key, (2, 25, 9216, 320), jnp.bfloat16)
    wt = jax.random.normal(key, (3, 1, 320, 320), jnp.bfloat16) * 0.02
    convt = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x.reshape(2, 25, 9216, 320), w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    timeit("temporal_conv3 (2x25x9216x320)", convt, xt, wt)


if __name__ == "__main__":
    main()
