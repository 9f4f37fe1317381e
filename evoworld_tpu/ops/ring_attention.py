"""Ring attention: sequence-sharded exact attention over the device mesh.

Sequence parallelism for long self-attention whose HEAD count does not
divide the mesh (ops/attention.py routes head-sharding first when it can):
q/k/v shard on the sequence axis, each device computes blockwise
online-softmax attention of its query shard against the KV shard it
currently holds, then rotates the KV shard one hop around the ring with
`lax.ppermute`, merging the per-block partial results with a log-sum-exp
reduction. After N steps every query shard has seen every KV shard —
numerically identical to full attention (flash attention with the KV loop
distributed over chips; Liu et al., "Ring Attention with Blockwise
Transformers"). The N-1 permutes ride the ICI ring and overlap each step's
compute under XLA's latency-hiding scheduler.

Reference role: the reference runs VGGT's ~51k-token global attention on a
single GPU through xformers (/root/reference/evoworld/vggt usage at
unified_loop_consistency.py:336-368); it has no sequence-parallel analogue.
This is the TPU-native scaling path (SCALING.md) for meshes larger than the
attention head count, where head-sharded shard_map can no longer split the
work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG = -1e30  # finite -inf stand-in: keeps exp/logaddexp NaN-free on TPU


def _to_varying(x, names):
    """Mark `x` as varying over the manual mesh axes `names`.

    jax >= 0.9 renamed lax.pvary to lax.pcast(..., to='varying'); fall back
    for older versions so the module stays importable either way.
    """
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, names, to="varying")
    return jax.lax.pvary(x, names)


def _block_attn(q, kb, vb, scale, col0, kv_valid, chunk, vary_names=()):
    """Partial attention of q against one KV block -> (o, lse), both fp32.

    `o` is the block-locally-normalized output (B, H, Sq, D); `lse` the
    log-sum-exp of the block logits (B, H, Sq). Columns whose GLOBAL index
    (col0 + local column) is >= kv_valid — ring padding introduced so the
    sequence divides the mesh — are masked. KV streams in `chunk`-column
    slices (lax.scan) so the fp32 logits transient is (Sq, chunk) per head,
    not (Sq, S_block): at VGGT scale on an 8-ring that is ~0.4 GB instead of
    ~2.6 GB.
    """
    b, sq, h, d = q.shape
    skv = kb.shape[1]
    pad = (-skv) % chunk
    if pad:
        kb = jnp.pad(kb, ((0, 0), (0, pad), (0, 0), (0, 0)))
        vb = jnp.pad(vb, ((0, 0), (0, pad), (0, 0), (0, 0)))
    nck = kb.shape[1] // chunk

    m0 = jnp.full((b, h, sq), _NEG, jnp.float32)
    l0 = jnp.zeros((b, h, sq), jnp.float32)
    acc0 = jnp.zeros((b, h, sq, d), jnp.float32)
    if vary_names:
        # Inside shard_map the scan carry must match the body's
        # varying-manual-axes type (see ring_attention's varying note).
        m0, l0, acc0 = (_to_varying(x, vary_names) for x in (m0, l0, acc0))

    def fold(carry, xs):
        m, l, acc = carry
        kj, vj, j = xs
        # Input-dtype matmul with fp32 accumulation (MXU-native; matches
        # ops/flash_attention.py's kernel convention).
        logits = (
            jnp.einsum("bqhd,bkhd->bhqk", q, kj,
                       preferred_element_type=jnp.float32) * scale
        )
        col = j * chunk + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 3)
        ok = (col < skv) & (col0 + col < kv_valid)
        logits = jnp.where(ok, logits, _NEG)
        m_new = jnp.maximum(m, logits.max(axis=-1))
        p = jnp.exp(logits - m_new[..., None])
        alpha = jnp.exp(m - m_new)
        l = l * alpha + p.sum(axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p.astype(vj.dtype), vj,
            preferred_element_type=jnp.float32,
        )
        return (m_new, l, acc), None

    if nck == 1:
        (m, l, acc), _ = fold((m0, l0, acc0), (kb, vb, jnp.int32(0)))
    else:
        kc = jnp.moveaxis(kb.reshape(b, nck, chunk, h, d), 1, 0)
        vc = jnp.moveaxis(vb.reshape(b, nck, chunk, h, d), 1, 0)
        (m, l, acc), _ = jax.lax.scan(
            fold, (m0, l0, acc0), (kc, vc, jnp.arange(nck, dtype=jnp.int32))
        )
    o = acc / jnp.maximum(l, 1e-30)[..., None]
    lse = m + jnp.log(jnp.maximum(l, 1e-30))
    return o, lse


def ring_attention(q, k, v, *, scale, axis_name, n_shards, kv_valid,
                   chunk: int = 1024):
    """Exact attention over sequence shards inside a shard_map region.

    Args:
        q, k, v: (B, S_local, H, D) — the local sequence shard; the global
            sequence is n_shards * S_local with padding (if any) at the END
            and masked via kv_valid.
        scale: logit scale.
        axis_name: mesh axis name (or tuple of names) the sequence shards
            over; the ppermute ring runs over this axis.
        n_shards: static ring size (number of devices on the axis).
        kv_valid: global count of REAL kv tokens (<= n_shards * S_local);
            ring-padding columns beyond it are masked. Padded query rows
            compute garbage and must be sliced off by the caller.
        chunk: within-block KV streaming width.

    Returns:
        (B, S_local, H, D) local shard of the attention output, q's dtype.
    """
    names = axis_name if isinstance(axis_name, tuple) else (axis_name,)
    if n_shards == 1:
        o, _ = _block_attn(q, k, v, scale, jnp.int32(0), kv_valid, chunk,
                           vary_names=names)
        return jnp.swapaxes(o, 1, 2).astype(q.dtype)

    idx = jax.lax.axis_index(axis_name)
    s_loc = k.shape[1]
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    b, sq, h, d = q.shape

    o0 = jnp.zeros((b, h, sq, d), jnp.float32)
    lse0 = jnp.full((b, h, sq), _NEG, jnp.float32)
    # The zero-filled carries are "unvarying" to shard_map's varying-manual-
    # axes checker while the loop body's outputs vary over the ring axis;
    # mark them varying up front so the scan carry types match.
    o0 = _to_varying(o0, names)
    lse0 = _to_varying(lse0, names)

    def body(carry, i):
        o, lse, kb, vb = carry
        # Issue the rotation FIRST: the collective-permute is independent of
        # this step's compute, so the scheduler overlaps transfer with math.
        k_next = jax.lax.ppermute(kb, axis_name, perm)
        v_next = jax.lax.ppermute(vb, axis_name, perm)
        # Shards move +1 per step, so at step i we hold the shard that
        # originated on device (idx - i) — its global column offset:
        origin = jnp.mod(idx - i, n_shards)
        ob, lb = _block_attn(q, kb, vb, scale, origin * s_loc, kv_valid, chunk,
                             vary_names=names)
        new_lse = jnp.logaddexp(lse, lb)
        o = (o * jnp.exp(lse - new_lse)[..., None]
             + ob * jnp.exp(lb - new_lse)[..., None])
        return (o, new_lse, k_next, v_next), None

    # lax.scan (not fori_loop): the trip count is static and scan has a
    # reverse-mode rule, so gradients flow through the ring (the ppermute
    # transpose is the inverse-permutation ppermute) — required when VGGT
    # fine-tuning differentiates through the sequence-parallel path.
    steps = _to_varying(jnp.arange(n_shards, dtype=jnp.int32), names)
    (o, _, _, _), _ = jax.lax.scan(body, (o0, lse0, k, v), steps)
    return jnp.swapaxes(o, 1, 2).astype(q.dtype)


def seq_sharded_ring(q, k, v, scale, mesh, chunk: int = 1024):
    """shard_map wrapper: pad the sequence to the ring size and run the ring.

    Shards dim 1 of (B, S, H, D) over every mesh axis with size > 1 (size-1
    axes contribute nothing and a single-axis name keeps ppermute simple
    on the common {'data': N, 'model': 1} inference mesh).
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    big = [a for a in mesh.axis_names if mesh.shape[a] > 1]
    if not big:
        return None  # single-device mesh: nothing to shard
    axis_name = big[0] if len(big) == 1 else tuple(big)
    n = 1
    for a in big:
        n *= mesh.shape[a]

    s = q.shape[1]
    pad = (-s) % n
    if pad:
        cfg = ((0, 0), (0, pad), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, cfg), jnp.pad(k, cfg), jnp.pad(v, cfg)
    spec = P(None, axis_name, None, None)
    fn = shard_map(
        functools.partial(
            ring_attention, scale=scale, axis_name=axis_name,
            n_shards=n, kv_valid=s, chunk=chunk,
        ),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )
    out = fn(q, k, v)
    return out[:, :s]
