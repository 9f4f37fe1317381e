"""VAE with temporal decoder (SVD's `AutoencoderKLTemporalDecoder`).

Functional equivalent of the frozen VAE the reference loads from the SVD
checkpoint (/root/reference/evoworld/pipeline/pipeline_evoworld.py:29,
train_evoworld.py:178-182): a standard SD image encoder producing 4-channel
latents (scaling factor 0.18215), and a decoder whose residual blocks carry a
frame-axis conv branch (SpatioTemporalResBlock with switched learned mixing)
plus a final depth-3 temporal output conv.

Layout: encoder works on (N, H, W, 3) frames; decoder takes (B*F, h, w, 4)
latents plus num_frames. bf16-friendly, norms in fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from evoworld_tpu.models.layers import (
    Downsample2D,
    GroupNorm,
    ResnetBlock2D,
    SpatioTemporalResBlock,
    Upsample2D,
)
from evoworld_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    scaling_factor: float = 0.18215


class VAEAttention(nn.Module):
    """Single-block spatial self-attention used in the VAE mid blocks:
    GroupNorm -> qkv (with bias) -> out -> +residual."""

    channels: int
    head_dim: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        n, h, w, c = x.shape
        y = GroupNorm(epsilon=1e-6, name="group_norm")(x).reshape(n, h * w, c)
        heads = max(c // self.head_dim, 1)
        dim = c // heads
        q = nn.Dense(c, name="to_q", dtype=x.dtype)(y).reshape(n, h * w, heads, dim)
        k = nn.Dense(c, name="to_k", dtype=x.dtype)(y).reshape(n, h * w, heads, dim)
        v = nn.Dense(c, name="to_v", dtype=x.dtype)(y).reshape(n, h * w, heads, dim)
        out = multi_head_attention(q, k, v).reshape(n, h * w, c)
        out = nn.Dense(c, name="to_out", dtype=x.dtype)(out).reshape(n, h, w, c)
        return out + residual


class Encoder(nn.Module):
    """SD image encoder -> (N, h, w, 2*latent) moments."""

    config: VAEConfig = VAEConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, name="conv_in", dtype=x.dtype)(x)
        num = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch, eps=1e-6, name=f"down_blocks_{i}_resnets_{j}")(x)
            if i != num - 1:
                x = Downsample2D(ch, asymmetric_padding=True, name=f"down_blocks_{i}_downsamplers_0")(x)
        ch = cfg.block_out_channels[-1]
        x = ResnetBlock2D(ch, eps=1e-6, name="mid_resnets_0")(x)
        x = VAEAttention(ch, name="mid_attn")(x)
        x = ResnetBlock2D(ch, eps=1e-6, name="mid_resnets_1")(x)
        x = GroupNorm(epsilon=1e-6, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, name="conv_out", dtype=x.dtype)(x)
        # quant_conv: 1x1 on the moments (AutoencoderKLTemporalDecoder keeps
        # quant_conv but has no post_quant_conv).
        x = nn.Conv(2 * cfg.latent_channels, (1, 1), name="quant_conv", dtype=x.dtype)(x)
        return x


class TemporalDecoder(nn.Module):
    """SVD temporal decoder: (B*F, h, w, 4) latents -> (B*F, H, W, 3) frames."""

    config: VAEConfig = VAEConfig()

    @nn.compact
    def __call__(self, z: jnp.ndarray, num_frames: int) -> jnp.ndarray:
        cfg = self.config
        top = cfg.block_out_channels[-1]
        x = nn.Conv(top, (3, 3), padding=1, name="conv_in", dtype=z.dtype)(z)

        def st_block(ch, name):
            return SpatioTemporalResBlock(
                ch,
                eps=1e-6,
                temporal_eps=1e-5,
                merge_strategy_switch=True,
                merge_alpha_init=0.0,
                name=name,
            )

        # Mid: res -> attention -> res.
        x = st_block(top, "mid_resnets_0")(x, None, num_frames)
        x = VAEAttention(top, name="mid_attn")(x)
        x = st_block(top, "mid_resnets_1")(x, None, num_frames)

        rev = list(reversed(cfg.block_out_channels))
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = st_block(ch, f"up_blocks_{i}_resnets_{j}")(x, None, num_frames)
            if i != len(rev) - 1:
                x = Upsample2D(ch, name=f"up_blocks_{i}_upsamplers_0")(x)

        x = GroupNorm(epsilon=1e-6, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(3, (3, 3), padding=1, name="conv_out", dtype=x.dtype)(x)

        # Final temporal conv over the frame axis (torch Conv3d (3,1,1)).
        bf, height, width, ch = x.shape
        batch = bf // num_frames
        xt = x.reshape(batch, num_frames, height, width, ch)
        xt = nn.Conv(3, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)), name="time_conv_out", dtype=x.dtype)(xt)
        return xt.reshape(bf, height, width, ch)


class AutoencoderKLTemporal(nn.Module):
    """Encoder + temporal decoder pair (frozen at train time, reference
    train_evoworld.py:204-207)."""

    config: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder(self.config)
        self.decoder = TemporalDecoder(self.config)

    def encode_moments(self, images: jnp.ndarray) -> jnp.ndarray:
        """(N, H, W, 3) -> (N, h, w, 8) mean/logvar moments."""
        return self.encoder(images)

    def encode_mode(self, images: jnp.ndarray) -> jnp.ndarray:
        """Deterministic latent (distribution mode): first 4 channels."""
        moments = self.encoder(images)
        return moments[..., : self.config.latent_channels]

    def encode_sample(self, images: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        moments = self.encoder(images)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)

    def decode(self, latents: jnp.ndarray, num_frames: int) -> jnp.ndarray:
        """(B*F, h, w, 4) unscaled latents -> (B*F, H, W, 3) in [-1, 1]."""
        return self.decoder(latents, num_frames)

    def __call__(self, images: jnp.ndarray, num_frames: int) -> jnp.ndarray:
        z = self.encode_mode(images)
        return self.decode(z, num_frames)
