"""On-chip A/B: fused small-seq kernel vs einsum for the temporal attention.

The S=25 temporal self-attention runs at <1% MFU on the einsum path (23 ms
at the L0 shape — padding + relayout bound, see scripts/README.md). The
block-diagonal Pallas kernel (ops/small_attention.py) keeps logits/probs in
VMEM. This measures both (plus the masked-einsum groupped variant) at the
UNet's three temporal shapes, scan-amortized, then the full-UNet in-graph
effect of routing S<=32 onto the kernel.

Run on the TPU tunnel: python scripts/exp_temporal_attn.py [micro|unet ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from evoworld_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

REPS = 16


def scan_bench(name, fn, q, k, v):
    # k/v ride as jit ARGUMENTS: closing over them would bake ~300 MB
    # constants into the program and blow the tunnel's upload limit (413).
    def run(q_, k_, v_):
        def body(x, _):
            out = fn(x, k_, v_)
            return (out if out.shape == x.shape else x), ()

        return jax.lax.scan(body, q_, None, length=REPS)[0]

    jitted = jax.jit(run)
    out = jitted(q, k, v)
    _ = float(jnp.sum(out.astype(jnp.float32).ravel()[:64]))
    ts = []
    for _i in range(3):
        t0 = time.time()
        out = jitted(q, k, v)
        _ = float(jnp.sum(out.astype(jnp.float32).ravel()[:64]))
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)/REPS*1e3:.2f} ms/iter", flush=True)


def micro():
    from evoworld_tpu.ops import attention as att
    from evoworld_tpu.ops.small_attention import small_seq_attention

    key = jax.random.key(0)
    # (batch, seq, heads, head_dim) at the L0/L1/L2 temporal shapes:
    # spatial positions fold into batch, frames are the sequence.
    for b, h, label in [(2 * 9216, 5, "L0"), (2 * 2304, 10, "L1"), (2 * 576, 20, "L2")]:
        q = jax.random.normal(key, (b, 25, h, 64), jnp.bfloat16)
        k = jax.random.normal(key, (b, 25, h, 64), jnp.bfloat16)
        v = jax.random.normal(key, (b, 25, h, 64), jnp.bfloat16)
        scale = 0.125
        scan_bench(f"{label} einsum   (B={b} H={h})",
                   lambda x, k_, v_: att._xla_attention(x, k_, v_, scale), q, k, v)
        scan_bench(f"{label} blockdiag(B={b} H={h})",
                   lambda x, k_, v_: att._blockdiag_small_seq(x, k_, v_, scale), q, k, v)
        scan_bench(f"{label} pallas   (B={b} H={h})",
                   lambda x, k_, v_: small_seq_attention(x, k_, v_, scale), q, k, v)
        # parity spot check on-chip
        ref = att._xla_attention(q, k, v, scale)
        got = small_seq_attention(q, k, v, scale)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
        print(f"{label} pallas max|err| vs einsum: {err:.3e}", flush=True)


def unet(route_small: bool):
    from evoworld_tpu.ops import attention as att

    # The production auto-route (ops/attention.py) now carries the tiny-seq
    # kernel; A/B by flipping its switch and clearing the inner jit cache so
    # the route is re-traced.
    att._SMALL_SEQ_KERNEL = route_small
    att._multi_head_attention.clear_cache()

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
    t0 = time.time()
    out = fn(params, sample)
    float(jnp.sum(out[..., 0, 0, 0]))
    print(f"unet route_small={route_small}: compile+run {time.time()-t0:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.time()
        out = fn(params, sample)
        float(jnp.sum(out[..., 0, 0, 0]))
        times.append(time.time() - t0)
    print(f"unet route_small={route_small}: forward {min(times)*1000:.0f} ms", flush=True)


if __name__ == "__main__":
    modes = sys.argv[1:] or ["micro", "unet"]
    print(jax.devices(), flush=True)
    for m in modes:
        if m == "micro":
            micro()
        elif m == "unet":
            unet(False)
            unet(True)
        elif m == "unet_base":
            unet(False)
        elif m == "unet_small":
            unet(True)
