"""On-chip A/B: einsum vs padded builtin flash for VGGT frame attention.

The aggregator's frame-wise attention runs at S=1041 (32x32 patch tokens +
camera + register tokens per frame), which sits below the current
flash-routing threshold (S>=4096 in ops/attention.py), so it rides the
einsum path: fp32 logits are 49*16*1041^2*4B ~ 3.4 GB of HBM transient per
layer across 24 aggregator blocks. The padded+segment-masked builtin flash
(already production for the 51k global attention) may win here too.

Run on the TPU tunnel: python scripts/exp_vggt_attn.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from evoworld_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

REPS = 8


def scan_bench(name, fn, q, k, v):
    def body(x, _):
        return fn(x, k, v), ()

    jitted = jax.jit(lambda x: jax.lax.scan(body, x, None, length=REPS)[0])
    out = jitted(q)
    _ = float(jnp.sum(out.astype(jnp.float32).ravel()[:64]))
    ts = []
    for _i in range(3):
        t0 = time.time()
        out = jitted(q)
        _ = float(jnp.sum(out.astype(jnp.float32).ravel()[:64]))
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)/REPS*1e3:.2f} ms/iter", flush=True)


def main():
    from evoworld_tpu.ops import attention as att

    key = jax.random.key(0)
    # Frame attention at 25- and 49-frame reconstruction windows.
    for frames in (25, 49):
        q = jax.random.normal(key, (frames, 1041, 16, 64), jnp.bfloat16)
        k = jax.random.normal(key, (frames, 1041, 16, 64), jnp.bfloat16)
        v = jax.random.normal(key, (frames, 1041, 16, 64), jnp.bfloat16)
        scale = 0.125
        scan_bench(f"F={frames} einsum ", lambda x, k_, v_: att._xla_attention(x, k_, v_, scale), q, k, v)
        scan_bench(f"F={frames} flash  ", lambda x, k_, v_: att._builtin_flash(x, k_, v_, scale), q, k, v)
        ref = att._xla_attention(q, k, v, scale)
        got = att._builtin_flash(q, k, v, scale)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
        print(f"F={frames} flash max|err| vs einsum: {err:.3e}", flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    main()
