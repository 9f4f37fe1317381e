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

import functools

import jax
import jax.numpy as jnp


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Plain attention; logits/softmax in fp32, matmuls in input dtype."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _builtin_flash(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float) -> jnp.ndarray:
    """JAX's shipped Pallas TPU flash-attention ((B, H, S, D) layout)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    def pick(seq):
        # Largest tile dividing the sequence (the kernel requires exact tiling).
        for b in (1024, 512, 256, 128):
            if seq % b == 0:
                return b
        return None

    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    seq_q, seq_kv = qt.shape[2], kt.shape[2]
    bq, bk = pick(seq_q), pick(seq_kv)
    if bq is None or bk is None:
        from evoworld_tpu.ops.flash_attention import flash_attention as own_flash

        return own_flash(q, k, v, scale=scale)
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
    out = flash_attention(qt, kt, vt, causal=False, sm_scale=scale, block_sizes=blk)
    return jnp.swapaxes(out, 1, 2)


@functools.partial(jax.jit, static_argnames=("impl",))
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
    scale = 1.0 / (q.shape[-1] ** 0.5)
    on_accel = jax.default_backend() not in ("cpu",)
    long_seq = q.shape[1] >= 1024
    if impl == "builtin" or (impl == "auto" and long_seq and on_accel):
        return _builtin_flash(q, k, v, scale)
    if impl == "flash":
        from evoworld_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale).astype(q.dtype)
