"""Fused attention for tiny sequences (the SVD temporal attention, S=25).

The reference runs the 25-frame temporal self-attention through xformers
(diffusers' ``TemporalBasicTransformerBlock``, consumed by
/root/reference/evoworld/models/unet_spatio_temporal_condition.py via the
diffusers block library). On TPU the equivalent einsum path is *padding
bound*, not FLOP bound: at the L0 shape (batch 92,160 sequences of length
25, head dim 64) the fp32 logits are padded 25->32 sublanes x 25->128
lanes, the probs pay the same again, and three relayout transposes move
~0.9 GB each — measured 23 ms/layer on v5e for a kernel with ~30 GFLOP of
useful work (<1% MFU).

This module keeps everything in VMEM instead. Sequences are packed in
groups of G=8 into one block-diagonal (G*32, G*32) masked attention so the
MXU sees a single well-shaped dot pair per group instead of 92k tiny ones;
logits/probs never touch HBM. Traffic collapses to the unavoidable
q/k/v/out streams (~1.2 GB at L0).

The kernel is forward-only; `small_seq_attention` wraps it in a
`jax.custom_vjp` whose backward differentiates the exact einsum
formulation (identical math), so the training path keeps working and only
(q, k, v) are saved as residuals.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Sequences are padded to SP tokens; G of them share one block-diagonal dot
# (G * SP = 256 rows -> two MXU passes per dot at lane width 128); BG groups
# are processed per program (block = BG * G sequences). BG=16 keeps the
# q/k/v/o blocks + fp32 logits under the 16 MB scoped-VMEM limit (BG=32
# measured 228 KB over on v5e).
SP = 32
G = 8
BG = 16


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq: int):
    """q/k/v/o refs: (BG, G*SP, D). Block-diagonal masked attention."""
    rows = G * SP
    blk_i = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // SP
    blk_j = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1) // SP
    tok_j = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1) % SP
    mask = (blk_i == blk_j) & (tok_j < seq)
    neg = jnp.float32(-1e30)
    for j in range(BG):
        qg = q_ref[j]
        kg = k_ref[j]
        vg = v_ref[j]
        logits = jax.lax.dot_general(
            qg, kg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        logits = jnp.where(mask, logits, neg)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(vg.dtype), vg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[j] = out.astype(o_ref.dtype)


def _forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
             interpret: bool = False) -> jnp.ndarray:
    b, s, h, d = q.shape
    if s > SP:
        raise ValueError(f"small_seq_attention requires seq <= {SP}, got {s}")
    n = b * h
    # (B, S, H, D) -> (N=B*H, SP, D), sequence padded to SP tokens.
    def pack(x):
        x = jnp.swapaxes(x, 1, 2).reshape(n, s, d)
        return jnp.pad(x, ((0, (-n) % (BG * G)), (0, SP - s), (0, 0)))
    qp, kp, vp = pack(q), pack(k), pack(v)
    npad = qp.shape[0]
    # (N, SP, D) -> (N/G, G*SP, D): groups of G sequences stacked along the
    # sublane axis (a no-op relayout: SP is a multiple of the sublane tile).
    qg = qp.reshape(npad // G, G * SP, d)
    kg = kp.reshape(npad // G, G * SP, d)
    vg = vp.reshape(npad // G, G * SP, d)
    grid = (npad // (BG * G),)
    spec = pl.BlockSpec((BG, G * SP, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, seq=s),
        out_shape=jax.ShapeDtypeStruct(qg.shape, q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * npad * SP * G * SP * d,
            bytes_accessed=4 * npad * SP * d * q.dtype.itemsize,
            transcendentals=npad * SP * G * SP,
        ),
    )(qg, kg, vg)
    out = out.reshape(npad, SP, d)[:n, :s]
    return jnp.swapaxes(out.reshape(b, h, s, d), 1, 2)


def _einsum_reference(q, k, v, scale):
    """Exact math the kernel implements (also used for the backward pass)."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def small_seq_attention(q, k, v, scale):
    """Fused tiny-sequence self-attention; (B, S<=32, H, D) -> same shape."""
    return _forward(q, k, v, scale)


def _fwd(q, k, v, scale):
    return _forward(q, k, v, scale), (q, k, v)


def _bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _einsum_reference(q_, k_, v_, scale), q, k, v)
    return vjp(g)


small_seq_attention.defvjp(_fwd, _bwd)
