"""Spatio-temporal conditional UNet (SVD architecture), TPU-native.

Functional equivalent of the reference's `UNetSpatioTemporalConditionModel`
(/root/reference/evoworld/trainer/unet_plucker.py:30-488 plus the diffusers
block library it delegates to): 18 input channels after conv_in surgery
(4 noisy + 4 first-frame cond + 4 memory cond + 6 Pluecker, SURVEY.md §2.6),
4 down blocks / mid / 4 up blocks with spatial+temporal resnets and
transformers, CLIP cross-attention, fps/motion/noise-aug micro-conditioning.

TPU-first design choices:
  - channels-last (B*F, H, W, C) activations so convs map directly onto MXU
    tiles without layout transposes;
  - bf16 activations/params with fp32 norms and softmax;
  - attention via `evoworld_tpu.ops.attention` (Pallas flash kernel for the
    9216-token spatial sequences);
  - pure function of (params, inputs) -> jit/pjit-shardable end to end.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from evoworld_tpu.models.layers import (
    Downsample2D,
    SpatioTemporalResBlock,
    TimestepEmbedding,
    TransformerSpatioTemporalModel,
    Upsample2D,
    GroupNorm,
    sinusoidal_time_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Architecture hyperparameters (SVD-XT defaults with EvoWorld's 18-ch input).

    Reference config: unet_plucker.py:68-105 (block_out_channels (320, 640,
    1280, 1280), heads (5, 10, 20, 20), cross_attention_dim 1024,
    addition_time_embed_dim 256, num_frames 25, layers_per_block 2).
    """

    in_channels: int = 18
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    num_attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    addition_time_embed_dim: int = 256
    num_frames: int = 25
    transformer_layers_per_block: int = 1
    # down/up block types: index 0..2 cross-attn, 3 plain (reference order).
    cross_attn_blocks: Tuple[bool, ...] = (True, True, True, False)
    # Rematerialize res/transformer blocks during the backward pass
    # (reference enable_gradient_checkpointing, train_evoworld.py:271-272).
    remat: bool = False


class CrossAttnBlockSpatioTemporal(nn.Module):
    """layers_per_block x (res block + transformer), optional downsample."""

    out_channels: int
    num_heads: int
    num_layers: int
    cross_dim: int
    add_downsample: bool
    transformer_layers: int = 1

    @nn.compact
    def __call__(self, x, temb, context, num_frames, image_only_indicator):
        skips = []
        head_dim = self.out_channels // self.num_heads
        for i in range(self.num_layers):
            x = SpatioTemporalResBlock(
                self.out_channels, eps=1e-5, temporal_eps=1e-5, name=f"resnets_{i}"
            )(x, temb, num_frames, image_only_indicator)
            x = TransformerSpatioTemporalModel(
                self.num_heads, head_dim, num_layers=self.transformer_layers,
                cross_dim=self.cross_dim, name=f"attentions_{i}",
            )(x, context, num_frames, image_only_indicator)
            skips.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, name="downsamplers_0")(x)
            skips.append(x)
        return x, skips


class DownBlockSpatioTemporal(nn.Module):
    """Plain (no-attention) down block."""

    out_channels: int
    num_layers: int
    add_downsample: bool

    @nn.compact
    def __call__(self, x, temb, num_frames, image_only_indicator):
        skips = []
        for i in range(self.num_layers):
            x = SpatioTemporalResBlock(
                self.out_channels, eps=1e-5, temporal_eps=1e-5, name=f"resnets_{i}"
            )(x, temb, num_frames, image_only_indicator)
            skips.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, name="downsamplers_0")(x)
            skips.append(x)
        return x, skips


class MidBlockSpatioTemporal(nn.Module):
    """res -> transformer -> res."""

    channels: int
    num_heads: int
    cross_dim: int
    transformer_layers: int = 1

    @nn.compact
    def __call__(self, x, temb, context, num_frames, image_only_indicator):
        head_dim = self.channels // self.num_heads
        x = SpatioTemporalResBlock(
            self.channels, eps=1e-5, temporal_eps=1e-5, name="resnets_0"
        )(x, temb, num_frames, image_only_indicator)
        x = TransformerSpatioTemporalModel(
            self.num_heads, head_dim, num_layers=self.transformer_layers,
            cross_dim=self.cross_dim, name="attentions_0",
        )(x, context, num_frames, image_only_indicator)
        x = SpatioTemporalResBlock(
            self.channels, eps=1e-5, temporal_eps=1e-5, name="resnets_1"
        )(x, temb, num_frames, image_only_indicator)
        return x


class CrossAttnUpBlockSpatioTemporal(nn.Module):
    """(num_layers) x (skip-concat res block + transformer), optional upsample."""

    out_channels: int
    num_heads: int
    num_layers: int
    cross_dim: int
    add_upsample: bool
    transformer_layers: int = 1

    @nn.compact
    def __call__(self, x, skips, temb, context, num_frames, image_only_indicator):
        # `skips`: tuple of num_layers arrays, consumed in order.
        head_dim = self.out_channels // self.num_heads
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = SpatioTemporalResBlock(
                self.out_channels, eps=1e-5, temporal_eps=1e-5, name=f"resnets_{i}"
            )(x, temb, num_frames, image_only_indicator)
            x = TransformerSpatioTemporalModel(
                self.num_heads, head_dim, num_layers=self.transformer_layers,
                cross_dim=self.cross_dim, name=f"attentions_{i}",
            )(x, context, num_frames, image_only_indicator)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, name="upsamplers_0")(x)
        return x


class UpBlockSpatioTemporal(nn.Module):
    out_channels: int
    num_layers: int
    add_upsample: bool

    @nn.compact
    def __call__(self, x, skips, temb, num_frames, image_only_indicator):
        # `skips`: tuple of num_layers arrays, consumed in order.
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = SpatioTemporalResBlock(
                self.out_channels, eps=1e-5, temporal_eps=1e-5, name=f"resnets_{i}"
            )(x, temb, num_frames, image_only_indicator)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, name="upsamplers_0")(x)
        return x


class UNetSpatioTemporal(nn.Module):
    """The full UNet.

    Call signature mirrors the reference forward
    (unet_plucker.py:355-487): sample (B, F, H, W, C_in) channels-last,
    continuous timestep (scalar or (B,)), CLIP context (B, 1, 1024),
    added_time_ids (B, 3). Returns (B, F, H, W, out_channels).
    """

    config: UNetConfig = UNetConfig()

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timestep: jnp.ndarray,
        context: jnp.ndarray,
        added_time_ids: jnp.ndarray,
        image_only_indicator: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        batch, num_frames = sample.shape[0], sample.shape[1]
        ch0 = cfg.block_out_channels[0]
        time_embed_dim = ch0 * 4
        compute_dtype = sample.dtype

        # --- time + added-conditioning embeddings (fp32 sinusoids) ---
        timesteps = jnp.broadcast_to(jnp.atleast_1d(timestep), (batch,))
        t_emb = sinusoidal_time_embedding(timesteps, ch0).astype(compute_dtype)
        emb = TimestepEmbedding(time_embed_dim, name="time_embedding")(t_emb)

        add_feats = sinusoidal_time_embedding(
            added_time_ids.reshape(-1), cfg.addition_time_embed_dim
        ).reshape(batch, -1).astype(compute_dtype)
        emb = emb + TimestepEmbedding(time_embed_dim, name="add_embedding")(add_feats)

        # Per-frame replication: everything below runs on (B*F, ...).
        emb = jnp.repeat(emb, num_frames, axis=0)
        context = jnp.repeat(context, num_frames, axis=0)
        if image_only_indicator is None:
            image_only_indicator = jnp.zeros((batch, num_frames), compute_dtype)

        x = sample.reshape((batch * num_frames,) + sample.shape[2:])
        x = nn.Conv(ch0, (3, 3), padding=1, name="conv_in", dtype=compute_dtype)(x)

        if cfg.remat:
            cross_down = nn.remat(CrossAttnBlockSpatioTemporal, static_argnums=(4,))
            plain_down = nn.remat(DownBlockSpatioTemporal, static_argnums=(3,))
            mid_cls = nn.remat(MidBlockSpatioTemporal, static_argnums=(4,))
            cross_up = nn.remat(CrossAttnUpBlockSpatioTemporal, static_argnums=(5,))
            plain_up = nn.remat(UpBlockSpatioTemporal, static_argnums=(4,))
        else:
            cross_down, plain_down = CrossAttnBlockSpatioTemporal, DownBlockSpatioTemporal
            mid_cls = MidBlockSpatioTemporal
            cross_up, plain_up = CrossAttnUpBlockSpatioTemporal, UpBlockSpatioTemporal

        skips = [x]
        num_blocks = len(cfg.block_out_channels)
        for i, out_ch in enumerate(cfg.block_out_channels):
            is_last = i == num_blocks - 1
            if cfg.cross_attn_blocks[i]:
                x, s = cross_down(
                    out_ch,
                    cfg.num_attention_heads[i],
                    cfg.layers_per_block,
                    cfg.cross_attention_dim,
                    add_downsample=not is_last,
                    transformer_layers=cfg.transformer_layers_per_block,
                    name=f"down_blocks_{i}",
                )(x, emb, context, num_frames, image_only_indicator)
            else:
                x, s = plain_down(
                    out_ch,
                    cfg.layers_per_block,
                    add_downsample=not is_last,
                    name=f"down_blocks_{i}",
                )(x, emb, num_frames, image_only_indicator)
            skips.extend(s)

        x = mid_cls(
            cfg.block_out_channels[-1],
            cfg.num_attention_heads[-1],
            cfg.cross_attention_dim,
            transformer_layers=cfg.transformer_layers_per_block,
            name="mid_block",
        )(x, emb, context, num_frames, image_only_indicator)

        for i in range(num_blocks):
            level = num_blocks - 1 - i
            out_ch = cfg.block_out_channels[level]
            is_last = i == num_blocks - 1
            n_layers = cfg.layers_per_block + 1
            block_skips = tuple(skips.pop() for _ in range(n_layers))
            if cfg.cross_attn_blocks[level]:
                x = cross_up(
                    out_ch,
                    cfg.num_attention_heads[level],
                    n_layers,
                    cfg.cross_attention_dim,
                    add_upsample=not is_last,
                    transformer_layers=cfg.transformer_layers_per_block,
                    name=f"up_blocks_{i}",
                )(x, block_skips, emb, context, num_frames, image_only_indicator)
            else:
                x = plain_up(
                    out_ch,
                    n_layers,
                    add_upsample=not is_last,
                    name=f"up_blocks_{i}",
                )(x, block_skips, emb, num_frames, image_only_indicator)

        x = GroupNorm(epsilon=1e-5, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, name="conv_out", dtype=compute_dtype)(x)
        return x.reshape((batch, num_frames) + x.shape[1:])
