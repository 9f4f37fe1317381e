"""Blockwise flash attention as a Pallas TPU kernel.

Online-softmax attention (Dao et al.) tiled for the MXU: the query sequence is
blocked over the grid, K/V live in VMEM per (batch, head) program, and the
kernel keeps running max / normalizer / accumulator in fp32 while the matmuls
run on the MXU. Non-causal, no masking beyond padded-length handling — exactly
the shape of the UNet's spatial (seq ~ 9216) and temporal (seq = 25) attention
(reference equivalent: xformers memory-efficient attention inside diffusers
blocks, /root/reference/requirements.txt).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int, kv_len: int):
    """One (batch*head, q-block) program: online softmax over K/V blocks."""
    q = q_ref[0].astype(jnp.float32) * scale          # (block_q, d)
    block_q, head_dim = q.shape
    padded_kv = k_ref.shape[1]
    num_kb = padded_kv // block_k

    def body(i, carry):
        m_prev, l_prev, acc_prev = carry
        kb = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        vb = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                              # (block_q, block_k)
        if kv_len % block_k != 0 or kv_len != padded_kv:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_k
            s = jnp.where(col < kv_len, s, _NEG_INF)
        m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + p.sum(axis=-1, keepdims=True)
        acc_new = acc_prev * alpha + jax.lax.dot_general(
            p, vb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, head_dim), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention over (B, S, H, D) tensors.

    Args:
        q: (B, Sq, H, D) queries.
        k, v: (B, Skv, H, D) keys/values.
        scale: logit scale; defaults to 1/sqrt(D).
        block_q, block_k: tile sizes (clamped to padded sequence lengths).
        interpret: run the Pallas interpreter (CPU testing).

    Returns:
        (B, Sq, H, D) output in q's dtype.
    """
    batch, sq, heads, dim = q.shape
    skv = k.shape[1]
    if scale is None:
        scale = 1.0 / (dim**0.5)

    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(skv, 128))
    sq_p = _round_up(sq, block_q)
    skv_p = _round_up(skv, block_k)

    def to_bh(x, s_pad):
        x = jnp.swapaxes(x, 1, 2).reshape(batch * heads, x.shape[1], dim)
        return jnp.pad(x, ((0, 0), (0, s_pad - x.shape[1]), (0, 0)))

    qf = to_bh(q, sq_p)
    kf = to_bh(k, skv_p)
    vf = to_bh(v, skv_p)

    grid = (batch * heads, sq_p // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k, kv_len=skv),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dim), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, skv_p, dim), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, skv_p, dim), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dim), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((batch * heads, sq_p, dim), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * heads * sq * skv * dim,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=batch * heads * sq * skv,
        ),
    )(qf, kf, vf)

    out = out[:, :sq].reshape(batch, heads, sq, dim)
    return jnp.swapaxes(out, 1, 2)
