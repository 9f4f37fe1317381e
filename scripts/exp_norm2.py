"""Norm variants round 2: avoid fp32 materialization and minor-dim reshapes.

Key ideas: jnp.mean(..., dtype=f32) accumulates in fp32 WITHOUT writing a
cast tensor to HBM; group-combining stats on the tiny (B, C) array instead
of reshaping the big tensor to (..., G, C//G) (C//G=10 lanes forces a
relayout); einsum self-dot for sum-of-squares (bf16 products accumulate
exactly in fp32 on the MXU/VPU).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

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


def gn_v2(x, scale, bias, groups=32, eps=1e-6):
    """Stats via dtype-accumulated reduces over N; group combine on (B, C)."""
    b, h, w, c = x.shape
    xf = x.reshape(b, h * w, c)
    n = h * w * (c // groups)
    s1 = jnp.sum(xf, axis=1, dtype=jnp.float32)                       # (B, C)
    s2 = jnp.einsum("bnc,bnc->bc", xf, xf, preferred_element_type=jnp.float32)
    g1 = s1.reshape(b, groups, c // groups).sum(-1) / n               # (B, G)
    g2 = s2.reshape(b, groups, c // groups).sum(-1) / n
    inv = jax.lax.rsqrt(g2 - g1 * g1 + eps)                           # (B, G)
    mul = jnp.repeat(inv, c // groups, axis=-1) * scale               # (B, C)
    add = bias - jnp.repeat(g1 * inv, c // groups, axis=-1) * scale
    out = x.astype(jnp.float32) * mul[:, None, None, :] + add[:, None, None, :]
    return out.astype(x.dtype)


def ln_v2(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, dtype=jnp.float32)                       # (...,)
    msq = jnp.einsum("...c,...c->...", x, x, preferred_element_type=jnp.float32) / x.shape[-1]
    inv = jax.lax.rsqrt(msq - mu * mu + eps)
    mul = inv[..., None] * scale
    add = bias - (mu * inv)[..., None] * scale
    return (x.astype(jnp.float32) * mul + add).astype(x.dtype)


def main():
    print(jax.devices(), flush=True)
    key = jax.random.key(0)
    x = jax.random.normal(key, (50, 72, 128, 320), jnp.bfloat16)
    g_scale = jnp.ones((320,), jnp.float32)
    g_bias = jnp.zeros((320,), jnp.float32)
    scan_bench("GN v2", gn_v2, x, g_scale, g_bias)

    xl = jax.random.normal(key, (50, 9216, 320), jnp.bfloat16)
    scan_bench("LN v2", ln_v2, xl, g_scale, g_bias)

    xt = jax.random.normal(key, (18432, 25, 320), jnp.bfloat16)
    scan_bench("LN v2 temporal (18432x25x320)", ln_v2, xt, g_scale, g_bias)


if __name__ == "__main__":
    main()
