"""Attention kernels.

Replaces the reference's xformers/triton fused attention (used inside
diffusers' UNet blocks, /root/reference/requirements.txt) with TPU-native
paths:

  - "xla": einsum attention with fp32 softmax accumulation. XLA already fuses
    this well on TPU for moderate sequence lengths; used as the reference
    implementation and CPU/test path.
  - "flash": Pallas blockwise flash-attention kernel (evoworld_tpu/ops/
    flash_attention.py) for the long-sequence spatial attention
    (seq = 9216 tokens at 1024x576 latents).

The public entry point dispatches on sequence length and platform.
"""

from __future__ import annotations

import contextlib
import functools
import math

import jax
import jax.numpy as jnp

# When set (via `head_sharded_attention`), long-sequence self-attention is
# shard_mapped over the mesh on the HEAD axis: each device runs the flash
# kernel on its head slice with zero collectives inside (heads are
# independent), and GSPMD reshards activations around the region. This is
# the multi-chip path for VGGT's global attention (S = frames x 1041
# tokens, 16 heads), where batch is 1 and the sequence is unshardable
# without cross-device softmax.
_HEAD_SHARD_MESH = None
_HEAD_SHARD_MIN_SEQ = 4096  # default routing threshold (production: 51k VGGT)
_HEAD_SHARD_MIN_SEQ_OVERRIDE = None  # set via head_sharded_attention(min_seq=)

# Tiny-sequence (S=25 temporal) attention stays on the einsum path: a fused
# block-diagonal Pallas kernel won the isolated microbench but LOST the
# in-graph full-UNet A/B on v5e twice (1970 vs 1944 ms at BG=16; BG=32 blows
# the 16 MB scoped-VMEM limit) — XLA overlaps the einsum's padding traffic
# with neighboring ops and the pallas packing relayouts eat the VMEM win.
# The kernel was removed in round 4 (git history + scripts/README.md keep
# the design and numbers; _blockdiag_small_seq below is the XLA-level
# variant, also slower in-graph, retained as documentation-by-code).


@contextlib.contextmanager
def head_sharded_attention(mesh, min_seq: int | None = None):
    """Route long self-attention through a head-sharded shard_map on `mesh`.

    Must be active while the surrounding program is TRACED (the mesh is a
    static part of the compiled program). Callers that jit per-instance
    (e.g. vggt.make_reconstructor) can simply wrap every call.

    `min_seq` overrides the routing threshold (sequence length at which the
    shard_map engages) for the duration of the context — the supported way
    for tiny-shape gates/tests to exercise the sharded path; production code
    must never mutate the module globals directly.
    """
    global _HEAD_SHARD_MESH, _HEAD_SHARD_MIN_SEQ_OVERRIDE
    prev = (_HEAD_SHARD_MESH, _HEAD_SHARD_MIN_SEQ_OVERRIDE)
    _HEAD_SHARD_MESH = mesh
    _HEAD_SHARD_MIN_SEQ_OVERRIDE = min_seq
    try:
        yield
    finally:
        _HEAD_SHARD_MESH, _HEAD_SHARD_MIN_SEQ_OVERRIDE = prev


def _head_sharded(q, k, v, scale, mesh):
    """shard_map wrapper: heads split over all mesh axes, flash per shard."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    axes = tuple(mesh.axis_names)
    spec = P(None, None, axes if len(axes) > 1 else axes[0], None)

    def inner(q_, k_, v_):
        if jax.default_backend() not in ("cpu",):
            return _builtin_flash(q_, k_, v_, scale)
        return _xla_attention(q_, k_, v_, scale).astype(q_.dtype)

    fn = shard_map(inner, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Plain attention; logits/softmax in fp32, matmuls in input dtype."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _blockdiag_small_seq(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
    group: int = 4, pad_to: int = 32,
) -> jnp.ndarray:
    """Exact attention for tiny sequences (the 25-frame temporal attention).

    The naive einsum at S=25 is lane-padding-bound on TPU (25 is padded to
    128 in the logits' minor dim — ~5x wasted HBM traffic for a kernel with
    trivial FLOPs). Batch `group` independent sequences into one attention
    of length group*pad_to with a block-diagonal mask instead: the masked
    softmax is exactly per-sequence softmax, the logits tile becomes
    (group*pad_to)^2 = 128x128 (one MXU tile at the defaults), and traffic
    drops ~4x. The (group x) extra matmul FLOPs are noise at these sizes.
    """
    b, s, h, d = q.shape
    assert s <= pad_to, f"sequence {s} exceeds pad_to {pad_to}"
    g = group
    pb = (g - b % g) % g
    ps = pad_to - s
    qp = jnp.pad(q, ((0, pb), (0, ps), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, pb), (0, ps), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, pb), (0, ps), (0, 0), (0, 0)))
    bb = qp.shape[0] // g
    qg = qp.reshape(bb, g * pad_to, h, d)
    kg = kp.reshape(bb, g * pad_to, h, d)
    vg = vp.reshape(bb, g * pad_to, h, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qg, kg).astype(jnp.float32) * scale
    blk = jnp.arange(g * pad_to) // pad_to
    tok = jnp.arange(g * pad_to) % pad_to
    mask = (blk[:, None] == blk[None, :]) & (tok[None, :] < s)
    logits = jnp.where(mask, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1).astype(vg.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vg)
    return out.reshape(bb * g, pad_to, h, d)[:b, :s]


def _flash_tile(seq: int):
    """Largest flash tile dividing the sequence (the kernel requires exact
    tiling), or None if the sequence needs padding first."""
    for b in (1024, 512, 256, 128):
        if seq % b == 0:
            return b
    return None


def _pad_with_segment_mask(q, k, v):
    """Pad (B, S, H, D) q/k/v to flash-tile multiples with a padding mask.

    Returns (q, k, v, (ids_q, ids_kv), orig_seq_q) where the id arrays are
    (B, S_padded) int32 segment ids — real tokens id 1, padding id 0, so
    padded kv columns are masked away from real queries and padded query
    rows (which attend only padding) are sliced off by the caller via
    orig_seq_q. CPU-testable arithmetic for the TPU-only kernel path (the
    mask semantics themselves are parity-checked against exact softmax in
    tests/test_models.py).
    """
    seq_q, seq_kv = q.shape[1], k.shape[1]
    tile = 1024 if max(seq_q, seq_kv) >= 8192 else 128
    pq = (-seq_q) % tile
    pkv = (-seq_kv) % tile
    b = q.shape[0]
    ids_q = jnp.broadcast_to(
        (jnp.arange(seq_q + pq) < seq_q).astype(jnp.int32), (b, seq_q + pq)
    )
    ids_kv = jnp.broadcast_to(
        (jnp.arange(seq_kv + pkv) < seq_kv).astype(jnp.int32), (b, seq_kv + pkv)
    )
    q = jnp.pad(q, ((0, 0), (0, pq), (0, 0), (0, 0)))
    k = jnp.pad(k, ((0, 0), (0, pkv), (0, 0), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, pkv), (0, 0), (0, 0)))
    return q, k, v, (ids_q, ids_kv), seq_q


def _builtin_flash(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float) -> jnp.ndarray:
    """JAX's shipped Pallas TPU flash-attention ((B, H, S, D) layout)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    pick = _flash_tile
    seg = None
    seq_q = q.shape[1]
    if pick(seq_q) is None or pick(k.shape[1]) is None:
        # Non-tile-divisible sequence (e.g. VGGT's global attention over
        # 49 frames x 1041 tokens = 51009): pad to the next tile multiple and
        # mask the padding with segment ids. The padded builtin kernel runs
        # at 185 ms/layer at that shape vs 197 on our streaming fallback
        # (ops/flash_attention.py), and keeps one production kernel.
        q, k, v, (ids_q, ids_kv), seq_q = _pad_with_segment_mask(q, k, v)
        seg = SegmentIds(q=ids_q, kv=ids_kv)

    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    bq, bk = pick(qt.shape[2]), pick(kt.shape[2])
    blk = BlockSizes(
        block_q=bq,
        block_k_major=bk,
        block_k=bk,
        block_b=1,
        block_q_major_dkv=bq,
        block_k_major_dkv=bk,
        block_q_dkv=bq,
        block_k_dkv=bk,
        block_q_dq=bq,
        block_k_dq=bk,
        block_k_major_dq=bk,
    )
    out = flash_attention(
        qt, kt, vt, segment_ids=seg, causal=False, sm_scale=scale, block_sizes=blk
    )
    out = jnp.swapaxes(out, 1, 2)
    return out[:, :seq_q]


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    impl: str = "auto",
) -> jnp.ndarray:
    """Scaled dot-product attention over explicit heads.

    Args:
        q: (B, Sq, H, Dh) queries.
        k: (B, Skv, H, Dh) keys.
        v: (B, Skv, H, Dh) values.
        impl: "xla", "flash" (our kernel), "builtin" (jax-shipped kernel), or
            "auto" — on TPU, long sequences route to the jax-shipped flash
            kernel (production-tested; our streaming kernel in
            ops/flash_attention.py remains the CPU-testable reference).

    Returns:
        (B, Sq, H, Dh) attention output in q's dtype.
    """
    # The ambient head-shard mesh/threshold are read OUTSIDE the jitted impl
    # and passed as static arguments so they participate in the jit cache key
    # (a closed-over global would silently return the first-traced program).
    min_seq = _HEAD_SHARD_MIN_SEQ_OVERRIDE
    if min_seq is None:
        min_seq = _HEAD_SHARD_MIN_SEQ
    return _multi_head_attention(q, k, v, impl, _HEAD_SHARD_MESH, min_seq)


@functools.partial(jax.jit, static_argnames=("impl", "mesh", "min_seq"))
def _multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    impl: str,
    mesh,
    min_seq: int = _HEAD_SHARD_MIN_SEQ,
) -> jnp.ndarray:
    scale = 1.0 / (q.shape[-1] ** 0.5)
    if k.shape[1] == 1 and v.shape[-1] == q.shape[-1] and impl == "auto":
        # Softmax over a single key is identically 1, so attention reduces to
        # broadcasting V over the query positions — exact, and saves the
        # kv-dim lane padding (1 -> 128) the einsum path would pay. This is
        # the SVD cross-attention case: CLIP context is one token
        # (pipeline_evoworld.py passes (B, 1, 1024) image embeddings).
        return jnp.broadcast_to(v, q.shape).astype(q.dtype)
    on_accel = jax.default_backend() not in ("cpu",)
    # Flash only pays off for the longest spatial sequences: at S=2304 the
    # einsum path is faster in-graph (full-UNet A/B: 1.955 vs 2.013 s — XLA
    # fuses the fp32 logits chain well and the ~1 GB transient fits once
    # VGGT is host-offloaded). S>=4096 (the 9216-token L0) keeps the Pallas
    # flash kernel: its einsum logits would be 42 GB.
    if (
        mesh is not None
        and impl == "auto"
        and q.shape[1] == k.shape[1]
        and q.shape[1] >= min_seq
    ):
        if q.shape[2] % math.prod(mesh.devices.shape) == 0:
            return _head_sharded(q, k, v, scale, mesh)
        # Heads don't divide the mesh (e.g. VGGT's 16 heads on 32 chips):
        # fall back to sequence parallelism — ring attention rotates KV
        # shards over the ICI ring with a log-sum-exp merge
        # (ops/ring_attention.py).
        from evoworld_tpu.ops.ring_attention import seq_sharded_ring

        ring = seq_sharded_ring(q, k, v, scale, mesh)
        if ring is not None:
            return ring
    long_seq = q.shape[1] >= 4096
    if impl == "builtin" or (impl == "auto" and long_seq and on_accel):
        return _builtin_flash(q, k, v, scale)
    if impl == "flash":
        from evoworld_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale).astype(q.dtype)
