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
        impl: "xla", "flash", or "auto" (flash for long sequences on TPU).

    Returns:
        (B, Sq, H, Dh) attention output in q's dtype.
    """
    scale = 1.0 / (q.shape[-1] ** 0.5)
    if impl == "flash" or (
        impl == "auto"
        and q.shape[1] >= 1024
        and jax.default_backend() not in ("cpu",)
    ):
        from evoworld_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale).astype(q.dtype)
