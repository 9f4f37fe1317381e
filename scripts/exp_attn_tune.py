"""Round 2 of attention tuning: sync-floor calibration, flash block sweeps,
kv=1 shortcut, small-seq (temporal) block-diagonal batching."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32).ravel()[:128]))
    ts = []
    for _i in range(n):
        t0 = time.time()
        out = fn(*args)
        _ = float(jnp.sum(out.astype(jnp.float32).ravel()[:128]))
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)
    return min(ts)


def flash_with_blocks(q, k, v, scale, bq, bk):
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes, flash_attention

    qt, kt, vt = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
    blk = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                     block_q_major_dkv=bq, block_k_major_dkv=bk, block_q_dkv=bq,
                     block_k_dkv=bk, block_q_dq=bq, block_k_dq=bk, block_k_major_dq=bk)
    out = flash_attention(qt, kt, vt, causal=False, sm_scale=scale, block_sizes=blk)
    return jnp.swapaxes(out, 1, 2)


from evoworld_tpu.ops.attention import _blockdiag_small_seq as blockdiag_small_seq


def main():
    print(jax.devices(), flush=True)
    key = jax.random.key(0)

    # --- sync floor: trivial op + scalar readback --------------------
    tiny = jnp.ones((8, 128), jnp.float32)
    f0 = jax.jit(lambda x: x + 1.0)
    floor = timeit("sync_floor (trivial jit + readback)", f0, tiny)

    # --- spatial L0 flash block sweep --------------------------------
    scale = 1.0 / 8.0
    q0 = jax.random.normal(key, (50, 9216, 5, 64), jnp.bfloat16)
    for bq, bk in [(512, 512), (512, 1024), (1024, 1024)]:  # larger K tiles fail VMEM
        if 9216 % bq or 9216 % bk:
            continue
        fn = jax.jit(lambda q, bq=bq, bk=bk: flash_with_blocks(q, q, q, scale, bq, bk))
        timeit(f"L0 flash bq={bq} bk={bk}", fn, q0)

    # splash attention, if available
    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk, splash_attention_mask as sm)

        def splash(q):
            qt, kt, vt = (jnp.swapaxes(t, 1, 2) for t in (q, q, q))
            mask = sm.FullMask((9216, 9216))
            mgrid = sm.MultiHeadMask([mask] * 5)
            kernel = sk.make_splash_mha(mask=mgrid, head_shards=1, q_seq_shards=1)
            fn = jax.vmap(kernel)  # over batch
            return jnp.swapaxes(fn(qt * scale, kt, vt), 1, 2)

        timeit("L0 splash", jax.jit(splash), q0)
    except Exception as e:  # noqa: BLE001
        print("splash unavailable:", type(e).__name__, str(e)[:160])

    # --- kv=1 cross shortcut -----------------------------------------
    kv = jax.random.normal(key, (50, 1, 5, 64), jnp.bfloat16)
    from evoworld_tpu.ops.attention import multi_head_attention
    fn = jax.jit(lambda q, kv: multi_head_attention(q, kv, kv, impl="xla"))
    timeit("cross kv=1 xla", fn, q0, kv)
    fn2 = jax.jit(lambda q, kv: jnp.broadcast_to(kv, q.shape))
    timeit("cross kv=1 broadcast", fn2, q0, kv)

    # --- temporal small-seq variants ---------------------------------
    qt = jax.random.normal(key, (18432, 25, 5, 64), jnp.bfloat16)
    fn = jax.jit(lambda q: multi_head_attention(q, q, q, impl="xla"))
    timeit("temporal L0 xla", fn, qt)
    for g in (2, 4, 8):
        fn = jax.jit(lambda q, g=g: blockdiag_small_seq(q, q, q, 1 / 8.0, group=g))
        timeit(f"temporal L0 blockdiag g={g}", fn, qt)


if __name__ == "__main__":
    main()
