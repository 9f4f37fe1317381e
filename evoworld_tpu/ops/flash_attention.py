"""Blockwise flash attention as a Pallas TPU kernel.

Online-softmax attention (Dao et al.) tiled for the MXU. The grid is
(batch*heads, q_blocks, kv_blocks) with the KV dimension innermost: each
program sees one (block_q, d) query tile and one (block_k, d) KV tile in
VMEM, carrying running max / normalizer / accumulator in VMEM scratch across
the KV sweep. K/V therefore stream from HBM block by block — VMEM usage is
O(block sizes), independent of sequence length (the full-KV-resident variant
OOMs VMEM at the VAE's 9216-token, 512-dim attention).

Non-causal, padded-length masking only — exactly the shape of the UNet's
spatial (seq ~ 9216) and temporal (seq = 25) attention and the VAE mid
attention (reference equivalent: xformers memory-efficient attention inside
diffusers blocks, /root/reference/requirements.txt).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


_LOG2_E = 1.4426950408889634  # log2(e)


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
    *, scale: float, block_k: int, kv_len: int, use_exp2: bool,
):
    """One (bh, qi, kj) program: fold one KV block into the running softmax."""
    j = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Keep the QK^T and PV matmuls in the INPUT dtype with fp32 accumulation
    # (preferred_element_type): bf16 x bf16 products are exact in the MXU's
    # fp32 accumulator, and an fp32 matmul runs at ~1/8 the bf16 MXU rate —
    # the earlier cast-then-dot version measured ~9x off the FLOP bound at
    # VGGT's 39k-token global attention.
    #
    # use_exp2: fold log2(e) into the logit scale and take 2^x instead of
    # e^x. exp() lowers to exp2(x * log2e) on the TPU VPU, so this removes
    # one full multiply pass over the (block_q, block_k) f32 tile per KV
    # step — the softmax stays exact (2^((s-m)*log2e) == e^(s-m), with the
    # running max tracked in the pre-scaled domain).
    q = q_ref[0]                                        # (block_q, d)
    kb = k_ref[0]                                       # (block_k, d)
    vb = v_ref[0]
    exp = jnp.exp2 if use_exp2 else jnp.exp
    eff_scale = scale * _LOG2_E if use_exp2 else scale
    s = jax.lax.dot_general(
        q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * eff_scale                                       # (block_q, block_k) f32
    if kv_len % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
    p = exp(s - m_new)
    alpha = exp(m_prev - m_new)
    m_ref[:] = m_new
    l_ref[:] = l_ref[:] * alpha + p.sum(axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == num_kb - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "interpret", "use_exp2"),
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
    use_exp2: bool = False,
) -> jnp.ndarray:
    """Flash attention over (B, S, H, D) tensors.

    Args:
        q: (B, Sq, H, D) queries.
        k, v: (B, Skv, H, D) keys/values.
        scale: logit scale; defaults to 1/sqrt(D).
        block_q, block_k: tile sizes (clamped to padded sequence lengths).
        interpret: run the Pallas interpreter (CPU testing).
        use_exp2: exact exp2-based softmax (log2e folded into the scale) —
            saves one VPU multiply pass per KV tile; A/B'd on chip in
            scripts/exp_softmax_prec.py.

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

    grid = (batch * heads, sq_p // block_q, skv_p // block_k)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k,
                          kv_len=skv, use_exp2=use_exp2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dim), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, dim), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, dim), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dim), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((batch * heads, sq_p, dim), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),     # running max
            pltpu.VMEM((block_q, 1), jnp.float32),     # running normalizer
            pltpu.VMEM((block_q, dim), jnp.float32),   # output accumulator
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * heads * sq * skv * dim,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=batch * heads * sq * skv,
        ),
    )(qf, kf, vf)

    out = out[:, :sq].reshape(batch, heads, sq, dim)
    return jnp.swapaxes(out, 1, 2)
