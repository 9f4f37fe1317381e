"""GroupNorm/LayerNorm variants on chip: flax vs hand-rolled vs Pallas.

The flax GroupNorm measures 3.5 ms at (4600, 72x128x320) vs ~1.2 ms
bandwidth bound (bf16 read+write + fused fp32 stats).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from flax import linen as nn

REPS = 16


def scan_bench(name, fn, x, *params):
    def body(h, _):
        return fn(h, *params), ()

    jfn = jax.jit(lambda h: jax.lax.scan(body, h, None, length=REPS)[0])
    out = jfn(x)
    _ = float(jnp.sum(out.astype(jnp.float32).ravel()[:64]))
    ts = []
    for _i in range(3):
        t0 = time.time()
        out = jfn(x)
        _ = float(jnp.sum(out.astype(jnp.float32).ravel()[:64]))
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)/REPS*1e3:.2f} ms/iter", flush=True)


def gn_flax(x, scale, bias, groups=32, eps=1e-6):
    mod = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=jnp.float32, param_dtype=jnp.float32)
    return mod.apply({"params": {"scale": scale, "bias": bias}}, x.astype(jnp.float32)).astype(x.dtype)


def gn_hand(x, scale, bias, groups=32, eps=1e-6):
    """One-pass E[x],E[x^2] in fp32 without materializing a cast tensor."""
    b, h, w, c = x.shape
    xg = x.reshape(b, h * w, groups, c // groups)
    xf = xg.astype(jnp.float32)
    s1 = jnp.mean(xf, axis=(1, 3), keepdims=True)
    s2 = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True)
    var = s2 - jnp.square(s1)
    inv = jax.lax.rsqrt(var + eps)
    out = (xg.astype(jnp.float32) - s1) * inv
    out = out.reshape(b, h, w, c) * scale + bias
    return out.astype(x.dtype)


def gn_hand_bf16_apply(x, scale, bias, groups=32, eps=1e-6):
    """fp32 stats, but the normalize/affine applied in bf16 arithmetic."""
    b, h, w, c = x.shape
    xg = x.reshape(b, h * w, groups, c // groups)
    xf = xg.astype(jnp.float32)
    s1 = jnp.mean(xf, axis=(1, 3), keepdims=True)
    s2 = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True)
    inv = jax.lax.rsqrt(s2 - jnp.square(s1) + eps)
    mul = inv.astype(x.dtype)
    sub = (s1 * inv).astype(jnp.float32)
    out = xg.astype(jnp.float32) * mul - sub
    out = out.reshape(b, h, w, c) * scale + bias
    return out.astype(x.dtype)


def ln_flax(x, scale, bias, eps=1e-5):
    mod = nn.LayerNorm(epsilon=eps, dtype=jnp.float32, param_dtype=jnp.float32)
    return mod.apply({"params": {"scale": scale, "bias": bias}}, x.astype(jnp.float32)).astype(x.dtype)


def ln_hand(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    out = (xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias
    return out.astype(x.dtype)


def main():
    print(jax.devices(), flush=True)
    key = jax.random.key(0)
    x = jax.random.normal(key, (50, 72, 128, 320), jnp.bfloat16)
    g_scale = jnp.ones((320,), jnp.float32)
    g_bias = jnp.zeros((320,), jnp.float32)

    scan_bench("GN flax fp32", gn_flax, x, g_scale, g_bias)
    scan_bench("GN hand fp32", gn_hand, x, g_scale, g_bias)
    scan_bench("GN hand bf16-apply", gn_hand_bf16_apply, x, g_scale, g_bias)

    xl = jax.random.normal(key, (50, 9216, 320), jnp.bfloat16)
    scan_bench("LN flax fp32", ln_flax, xl, g_scale, g_bias)
    scan_bench("LN hand fp32", ln_hand, xl, g_scale, g_bias)


if __name__ == "__main__":
    main()
