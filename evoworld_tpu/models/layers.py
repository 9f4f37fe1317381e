"""Building blocks for the spatio-temporal UNet and temporal VAE.

These are first-class Flax implementations of the block library the reference
consumes from diffusers (`diffusers.models.unet_3d_blocks` et al., imported at
/root/reference/evoworld/trainer/unet_plucker.py:13 — SURVEY.md §2.3 calls
this the largest hidden component). Layout is TPU-native channels-last:
spatial tensors are (B*F, H, W, C); temporal mixing reshapes to (B, F, ...).

Module attribute names mirror the torch block library (conv1/norm1/
time_emb_proj/...) so checkpoint conversion is a name-preserving transpose.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from evoworld_tpu.ops.attention import multi_head_attention


def sinusoidal_time_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal features for (continuous) timesteps: (B,) -> (B, dim).

    Matches the SVD conditioning convention (cos first)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """Two-layer SiLU MLP lifting sinusoidal features to the embed dim."""

    embed_dim: int
    out_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.embed_dim, name="linear_1", dtype=x.dtype)(x)
        x = nn.silu(x)
        x = nn.Dense(self.out_dim or self.embed_dim, name="linear_2", dtype=x.dtype)(x)
        return x


# Statistics dtype for the norms below. fp32 is the drift-safe default; the
# perf harness may set bf16 to measure the cast-chain cost (scripts/
# exp_unet_perf.py) — not a production switch unless parity tests stay green.
_NORM_DTYPE = jnp.float32


class GroupNorm(nn.Module):
    """GroupNorm over the trailing channel axis, statistics in fp32."""

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        out = nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=self.epsilon,
            dtype=_NORM_DTYPE,
            param_dtype=jnp.float32,
            name="norm",
        )(x.astype(_NORM_DTYPE))
        return out.astype(orig_dtype)


class Attention(nn.Module):
    """Multi-head attention with optional cross-attention source.

    Equivalent to diffusers' `Attention` as configured in the SVD UNet:
    no q/k/v bias, output projection with bias, scale 1/sqrt(head_dim).
    """

    num_heads: int
    head_dim: int
    cross_dim: Optional[int] = None
    out_dim: Optional[int] = None
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        inner = self.num_heads * self.head_dim
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=self.qkv_bias, name="to_q", dtype=x.dtype)(x)
        k = nn.Dense(inner, use_bias=self.qkv_bias, name="to_k", dtype=x.dtype)(ctx)
        v = nn.Dense(inner, use_bias=self.qkv_bias, name="to_v", dtype=x.dtype)(ctx)
        b, sq = q.shape[0], q.shape[1]
        skv = k.shape[1]
        q = q.reshape(b, sq, self.num_heads, self.head_dim)
        k = k.reshape(b, skv, self.num_heads, self.head_dim)
        v = v.reshape(b, skv, self.num_heads, self.head_dim)
        out = multi_head_attention(q, k, v)
        out = out.reshape(b, sq, inner)
        return nn.Dense(self.out_dim or inner, name="to_out", dtype=x.dtype)(out)


class GEGLUFeedForward(nn.Module):
    """Transformer MLP with GEGLU gating (dim -> 4*dim -> dim)."""

    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.mult
        proj = nn.Dense(inner * 2, name="proj_in", dtype=x.dtype)(x)
        gate, val = jnp.split(proj, 2, axis=-1)
        # diffusers GEGLU: hidden, gate = proj.chunk(2); out = hidden * gelu(gate)
        x = gate * nn.gelu(val, approximate=False)
        return nn.Dense(self.dim, name="proj_out", dtype=x.dtype)(x)


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig = x.dtype
        out = nn.LayerNorm(epsilon=self.epsilon, dtype=_NORM_DTYPE, param_dtype=jnp.float32, name="norm")(
            x.astype(_NORM_DTYPE)
        )
        return out.astype(orig)


class ResnetBlock2D(nn.Module):
    """Spatial residual block: GN -> SiLU -> conv3x3 (+temb) -> GN -> SiLU -> conv3x3."""

    out_channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        residual = x
        h = GroupNorm(epsilon=self.eps, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1", dtype=x.dtype)(h)
        if temb is not None:
            t = nn.Dense(self.out_channels, name="time_emb_proj", dtype=x.dtype)(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = GroupNorm(epsilon=self.eps, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2", dtype=x.dtype)(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut", dtype=x.dtype)(residual)
        return residual + h


class TemporalResnetBlock(nn.Module):
    """Residual block convolving along the frame axis (torch kernel (3,1,1)).

    Input is (B, F, H, W, C); the conv is a depth-3 conv over F implemented as
    nn.Conv with kernel (3, 1, 1) on the (F, H, W) spatial dims.
    """

    out_channels: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        residual = x
        h = GroupNorm(epsilon=self.eps, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)), name="conv1", dtype=x.dtype)(h)
        if temb is not None:
            # temb: (B, F, C_t) -> project and add per-frame.
            t = nn.Dense(self.out_channels, name="time_emb_proj", dtype=x.dtype)(nn.silu(temb))
            h = h + t[:, :, None, None, :]
        h = GroupNorm(epsilon=self.eps, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)), name="conv2", dtype=x.dtype)(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1, 1), name="conv_shortcut", dtype=x.dtype)(residual)
        return residual + h


class AlphaBlender(nn.Module):
    """Learned scalar blend of spatial and temporal branches.

    merge_strategy "learned_with_images": alpha = sigmoid(mix_factor) for
    video frames, forced to 1 (pure spatial) where image_only_indicator is
    set. `switch_to_temporal_mix` swaps the roles (used by the VAE decoder).
    """

    alpha_init: float = 0.5
    switch_to_temporal_mix: bool = False

    @nn.compact
    def __call__(
        self,
        x_spatial: jnp.ndarray,
        x_temporal: jnp.ndarray,
        image_only_indicator: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        mix = self.param("mix_factor", lambda _: jnp.asarray([self.alpha_init], jnp.float32))
        alpha = jax.nn.sigmoid(mix.astype(jnp.float32))[0]
        if image_only_indicator is not None:
            # (B, F) bool/float -> per-(B,F) alpha.
            alpha = jnp.where(image_only_indicator.astype(bool), 1.0, alpha)
            extra = x_spatial.ndim - alpha.ndim
            alpha = alpha.reshape(alpha.shape + (1,) * extra)
        alpha = jnp.asarray(alpha, x_spatial.dtype)
        if self.switch_to_temporal_mix:
            alpha = 1.0 - alpha
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


class SpatioTemporalResBlock(nn.Module):
    """Spatial ResNet -> temporal ResNet -> learned alpha blend.

    Operates on (B*F, H, W, C); `num_frames` recovers the batch split.
    """

    out_channels: int
    eps: float = 1e-6
    temporal_eps: float = 1e-6
    merge_strategy_switch: bool = False
    merge_alpha_init: float = 0.5

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        temb: Optional[jnp.ndarray],
        num_frames: int,
        image_only_indicator: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        h = ResnetBlock2D(self.out_channels, eps=self.eps, name="spatial_res_block")(x, temb)
        bf, height, width, ch = h.shape
        batch = bf // num_frames
        h_bt = h.reshape(batch, num_frames, height, width, ch)
        temb_bt = temb.reshape(batch, num_frames, -1) if temb is not None else None
        h_temporal = TemporalResnetBlock(self.out_channels, eps=self.temporal_eps, name="temporal_res_block")(
            h_bt, temb_bt
        )
        mixed = AlphaBlender(
            alpha_init=self.merge_alpha_init,
            switch_to_temporal_mix=self.merge_strategy_switch,
            name="time_mixer",
        )(
            x_spatial=h_bt,
            x_temporal=h_temporal,
            image_only_indicator=(
                image_only_indicator[:, :, None, None, None]
                if image_only_indicator is not None and image_only_indicator.ndim == 2
                else None
            ),
        )
        return mixed.reshape(bf, height, width, ch)


class BasicTransformerBlock(nn.Module):
    """Spatial transformer block: self-attn, cross-attn, GEGLU FF (pre-LN)."""

    dim: int
    num_heads: int
    head_dim: int
    cross_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = LayerNorm(name="norm1")(x)
        x = x + Attention(self.num_heads, self.head_dim, name="attn1")(h)
        h = LayerNorm(name="norm2")(x)
        x = x + Attention(self.num_heads, self.head_dim, cross_dim=self.cross_dim, name="attn2")(h, context)
        h = LayerNorm(name="norm3")(x)
        x = x + GEGLUFeedForward(self.dim, name="ff")(h)
        return x


class TemporalBasicTransformerBlock(nn.Module):
    """Temporal transformer block attending across frames per spatial token.

    Input (B*F, S, C); internally reshaped to (B*S, F, C). Includes the
    feed-forward-in projection unique to the temporal blocks.
    """

    dim: int
    num_heads: int
    head_dim: int
    cross_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_frames: int, context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        bf, seq, ch = x.shape
        batch = bf // num_frames
        h = x.reshape(batch, num_frames, seq, ch).transpose(0, 2, 1, 3).reshape(batch * seq, num_frames, ch)

        residual = h
        h = LayerNorm(name="norm_in")(h)
        h = GEGLUFeedForward(self.dim, name="ff_in")(h)
        h = h + residual

        n = LayerNorm(name="norm1")(h)
        h = h + Attention(self.num_heads, self.head_dim, name="attn1")(n)
        if self.cross_dim is not None and context is not None:
            n = LayerNorm(name="norm2")(h)
            h = h + Attention(self.num_heads, self.head_dim, cross_dim=self.cross_dim, name="attn2")(n, context)
        n = LayerNorm(name="norm3")(h)
        h = h + GEGLUFeedForward(self.dim, name="ff")(n)

        h = h.reshape(batch, seq, num_frames, ch).transpose(0, 2, 1, 3).reshape(bf, seq, ch)
        return h


class TransformerSpatioTemporalModel(nn.Module):
    """Spatial + temporal transformer pair with learned time mixing.

    (B*F, H, W, C) in/out. The temporal branch is conditioned on a per-frame
    positional embedding and cross-attends to the first-frame CLIP context.
    """

    num_heads: int
    head_dim: int
    num_layers: int = 1
    cross_dim: int = 1024

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray,
        num_frames: int,
        image_only_indicator: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        bf, height, width, ch = x.shape
        batch = bf // num_frames
        inner = self.num_heads * self.head_dim
        residual = x

        # Cross-attention context for the temporal branch: first frame's
        # context broadcast to every spatial token.
        ctx_first = context.reshape(batch, num_frames, -1, context.shape[-1])[:, 0]
        seq = height * width
        time_context = jnp.broadcast_to(
            ctx_first[:, None], (batch, seq, ctx_first.shape[1], ctx_first.shape[2])
        ).reshape(batch * seq, ctx_first.shape[1], ctx_first.shape[2])

        h = GroupNorm(epsilon=1e-6, name="norm")(x)
        h = h.reshape(bf, seq, ch)
        h = nn.Dense(inner, name="proj_in", dtype=x.dtype)(h)

        # Per-frame positional embedding added before the temporal block.
        frame_idx = jnp.tile(jnp.arange(num_frames, dtype=jnp.float32), (batch,))
        t_emb = sinusoidal_time_embedding(frame_idx, inner)
        emb = TimestepEmbedding(inner * 4, out_dim=inner, name="time_pos_embed")(
            t_emb.astype(x.dtype)
        )[:, None, :]

        # One shared blender across layers (diffusers shares time_mixer too;
        # creating it inside the loop would also be a duplicate flax name at
        # num_layers > 1).
        blender = AlphaBlender(name="time_mixer")
        for i in range(self.num_layers):
            h = BasicTransformerBlock(
                inner, self.num_heads, self.head_dim, cross_dim=self.cross_dim,
                name=f"transformer_blocks_{i}",
            )(h, context)
            h_mix = h + emb
            h_mix = TemporalBasicTransformerBlock(
                inner, self.num_heads, self.head_dim, cross_dim=self.cross_dim,
                name=f"temporal_transformer_blocks_{i}",
            )(h_mix, num_frames, time_context)
            h = blender(
                x_spatial=h.reshape(batch, num_frames, seq, inner),
                x_temporal=h_mix.reshape(batch, num_frames, seq, inner),
                image_only_indicator=(
                    image_only_indicator[:, :, None, None]
                    if image_only_indicator is not None
                    else None
                ),
            ).reshape(bf, seq, inner)

        h = nn.Dense(ch, name="proj_out", dtype=x.dtype)(h)
        return h.reshape(bf, height, width, ch) + residual


class Downsample2D(nn.Module):
    """Strided 3x3 conv. UNet variant pads symmetrically; the VAE encoder
    uses torch-style asymmetric (0,1) padding."""

    channels: int
    asymmetric_padding: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.asymmetric_padding:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            padding = "VALID"
        else:
            padding = ((1, 1), (1, 1))
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=padding, name="conv", dtype=x.dtype)(x)


class Upsample2D(nn.Module):
    """Nearest 2x upsample + 3x3 conv."""

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, name="conv", dtype=x.dtype)(x)
