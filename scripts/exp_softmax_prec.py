"""Softmax-precision / VPU-transcendental A/B at the production hot shapes.

VERDICT r4 #4: the roofline writeup attributes ~0.8 s of each 1.955 s UNet
forward to the flash stack's fp32 softmax transcendentals at S=9216/D=64 and
names two untried kernel-level knobs — bf16 softmax (bf16 exp, fp32
accumulate) and 2-head lane packing. This script measures what the v5e VPU
actually gives for each, scan-amortized (the ~30 ms tunnel sync floor makes
single-shot microbenches useless — scripts/README.md calibration):

  1. raw transcendental rates: exp / exp2 / max over f32 vs bf16 tiles —
     does the VPU run bf16 transcendentals any faster at all?
  2. our streaming flash kernel (ops/flash_attention.py) exp vs use_exp2
     (log2e folded into the matmul scale = one fewer VPU multiply pass per
     KV tile) vs the jax builtin kernel, at the UNet L0 hot shape
     (50, 9216, 5, 64) and the VGGT global shape (1, 51009, 16, 64).
  3. numerics: max |delta| of each variant vs the fp32 einsum reference on
     a small slice (the golden-anchor gate runs separately in tests).

Run on the TPU tunnel: python scripts/exp_softmax_prec.py
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


def timeit(name, fn, *args, n=3):
    out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32).ravel()[:128]))
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        _ = float(jnp.sum(out.astype(jnp.float32).ravel()[:128]))
        ts.append(time.time() - t0)
    best = min(ts)
    print(f"{name}: {best * 1e3:.1f} ms (all {[f'{t*1e3:.0f}' for t in ts]})", flush=True)
    return best


def scan_amortized(fn, x, reps=REPS):
    """Repeat fn in a lax.scan so per-iteration time excludes dispatch."""

    def body(c, _):
        return fn(c), ()

    def run(x):
        y, _ = jax.lax.scan(body, x, None, length=reps)
        return y

    return jax.jit(run), reps


def transcendental_rates():
    print("== 1. raw VPU transcendental rates (scan-amortized) ==", flush=True)
    shape = (4096, 4096)  # 64 MB f32
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jax.random.normal(jax.random.key(0), shape, dtype) * 0.1
        for label, op in (
            ("exp ", jnp.exp),
            ("exp2", jnp.exp2),
            ("mul ", lambda t: t * 1.0001),  # pure-bandwidth baseline
        ):
            fn, reps = scan_amortized(lambda t, op=op: op(t).astype(t.dtype), x)
            t = timeit(f"  {label} {jnp.dtype(dtype).name:9s} {shape}", fn, x)
            per = t / reps
            gels = x.size / per / 1e9
            print(f"      -> {per * 1e3:.2f} ms/pass = {gels:.0f} Gelem/s", flush=True)


def kernel_ab():
    from evoworld_tpu.ops.attention import _builtin_flash
    from evoworld_tpu.ops.flash_attention import flash_attention

    print("== 2. flash kernel A/B at production shapes ==", flush=True)
    for label, (b, s, h, d) in (
        ("UNet_L0 (50,9216,5,64)", (50, 9216, 5, 64)),
        ("VGGT_global (1,51009,16,64)", (1, 51009, 16, 64)),
    ):
        q = jax.random.normal(jax.random.key(1), (b, s, h, d), jnp.bfloat16) * 0.1
        scale = 1.0 / (d ** 0.5)
        variants = {
            "ours_exp ": jax.jit(lambda q: flash_attention(q, q, q, scale=scale)),
            "ours_exp2": jax.jit(
                lambda q: flash_attention(q, q, q, scale=scale, use_exp2=True)
            ),
            "builtin  ": jax.jit(lambda q: _builtin_flash(q, q, q, scale)),
        }
        results = {}
        for name, fn in variants.items():
            results[name] = timeit(f"  {label} {name}", fn, q)
        base = results["builtin  "]
        for name, t in results.items():
            print(f"      {name}: {t / base:.3f}x of builtin", flush=True)

        # Numerics vs fp32 einsum on a slice the HBM can hold.
        from evoworld_tpu.ops.attention import _xla_attention

        qs = q[:, : min(s, 2048)]
        want = _xla_attention(
            qs.astype(jnp.float32), qs.astype(jnp.float32), qs.astype(jnp.float32), scale
        )
        for name, fn in (
            ("ours_exp ", lambda x: flash_attention(x, x, x, scale=scale)),
            ("ours_exp2", lambda x: flash_attention(x, x, x, scale=scale, use_exp2=True)),
        ):
            got = fn(qs).astype(jnp.float32)
            err = float(jnp.max(jnp.abs(got - want)))
            print(f"      {name} max|delta| vs fp32 einsum (S=2048 slice): {err:.2e}", flush=True)


def main():
    print(jax.devices(), flush=True)
    transcendental_rates()
    kernel_ab()


if __name__ == "__main__":
    main()
