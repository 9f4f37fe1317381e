"""VGGT prediction heads: iterative camera head and DPT dense heads.

Reimplemented from the upstream VGGT-1B architecture (submodule not vendored;
API from call sites, SURVEY.md §2.9):
  - CameraHead: trunk of transformer blocks iteratively refining a 9-d pose
    encoding [t(3), quat(4), fov(2)] from the camera tokens;
  - DPTHead: reassembles 4 intermediate patch-token layers into multi-scale
    feature maps, fuses them convolutionally, and predicts dense outputs
    (depth+conf = 2 channels, or point-map+conf = 4 channels) at full image
    resolution.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from evoworld_tpu.models.vggt.aggregator import ViTBlock


class CameraHead(nn.Module):
    """Iterative pose regression from camera tokens.

    (B, S, C) camera tokens -> (B, S, 9) pose encoding. The trunk attends
    across frames; the encoding is refined `num_iters` times by re-embedding
    the current estimate (deep supervision trains on all iterations; at
    inference only the last matters).
    """

    dim: int = 1024
    trunk_depth: int = 4
    num_heads: int = 16
    num_iters: int = 4
    out_dim: int = 9

    @nn.compact
    def __call__(self, camera_tokens: jnp.ndarray) -> jnp.ndarray:
        b, s, c = camera_tokens.shape
        tokens = nn.Dense(self.dim, name="token_proj", dtype=camera_tokens.dtype)(camera_tokens)

        pose = jnp.zeros((b, s, self.out_dim), jnp.float32)
        embed = nn.Dense(self.dim, name="pose_embed", dtype=tokens.dtype)

        # Trunk scanned over depth; refinement iterations scanned too (same
        # weights each iteration) — the compiled body contains ONE ViT block
        # instead of trunk_depth * num_iters copies.
        class TrunkStep(nn.Module):
            dim: int
            num_heads: int

            @nn.compact
            def __call__(self, h, _):
                return ViTBlock(self.dim, self.num_heads, 4.0, True, 0.01, name="block")(h), ()

        trunk = nn.scan(
            TrunkStep,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.trunk_depth,
        )(self.dim, self.num_heads, name="trunk")
        norm = nn.LayerNorm(dtype=jnp.float32, name="trunk_norm")
        out_proj = nn.Dense(self.out_dim, name="pose_out", dtype=tokens.dtype)

        for _ in range(self.num_iters):
            h = tokens + embed(pose.astype(tokens.dtype))
            h, _ = trunk(h, None)
            h = norm(h.astype(jnp.float32)).astype(tokens.dtype)
            pose = pose + out_proj(h).astype(jnp.float32)
        # Initialize quaternion w-component toward identity rotation.
        return pose + jnp.asarray([0, 0, 0, 0, 0, 0, 1, 0.7, 0.7], jnp.float32)


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    features: int = 256
    out_channels: int = 2              # depth + confidence
    layer_dims: Tuple[int, ...] = (256, 512, 1024, 1024)
    dim: int = 1024
    patch_size: int = 14


class _FusionBlock(nn.Module):
    """Residual conv unit + 2x upsample fusion (DPT RefineNet style)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray | None = None) -> jnp.ndarray:
        if skip is not None:
            res = nn.relu(skip)
            res = nn.Conv(self.features, (3, 3), padding=1, name="res1a", dtype=x.dtype)(res)
            res = nn.relu(res)
            res = nn.Conv(self.features, (3, 3), padding=1, name="res1b", dtype=x.dtype)(res)
            x = x + skip + res if skip.shape == x.shape else x + res
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, name="res2a", dtype=x.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, name="res2b", dtype=x.dtype)(h)
        x = x + h
        n, hh, ww, c = x.shape
        x = jax.image.resize(x, (n, hh * 2, ww * 2, c), "bilinear")
        return nn.Conv(self.features, (1, 1), name="out_conv", dtype=x.dtype)(x)


class DPTHead(nn.Module):
    """Dense prediction from 4 intermediate aggregator layers.

    Args to __call__:
        layer_tokens: list of 4 (B*S, P, C) patch-token arrays
            (special tokens already stripped).
        patch_hw: (ph, pw) patch grid.
        image_hw: (H, W) output resolution.

    Returns (B*S, H, W, out_channels).
    """

    config: DPTConfig = DPTConfig()

    @nn.compact
    def __call__(self, layer_tokens: Sequence[jnp.ndarray], patch_hw, image_hw):
        cfg = self.config
        ph, pw = patch_hw
        height, width = image_hw
        n = layer_tokens[0].shape[0]

        # Reassemble: project each layer and resample to its pyramid scale
        # (x4, x2, x1, x0.5 of the patch grid).
        scales = (4, 2, 1, 0.5)
        feats = []
        for i, tokens in enumerate(layer_tokens):
            f = nn.Dense(cfg.layer_dims[i], name=f"proj_{i}", dtype=tokens.dtype)(tokens)
            f = f.reshape(n, ph, pw, cfg.layer_dims[i])
            sh, sw = int(ph * scales[i]), int(pw * scales[i])
            f = jax.image.resize(f, (n, sh, sw, cfg.layer_dims[i]), "bilinear")
            f = nn.Conv(cfg.features, (3, 3), padding=1, name=f"reassemble_{i}", dtype=f.dtype)(f)
            feats.append(f)

        # Top-down fusion from the coarsest level.
        x = _FusionBlock(cfg.features, name="fusion_3")(feats[3])
        for i in (2, 1, 0):
            x = jax.image.resize(x, feats[i].shape[:3] + (cfg.features,), "bilinear")
            x = _FusionBlock(cfg.features, name=f"fusion_{i}")(x, feats[i])

        x = nn.Conv(cfg.features // 2, (3, 3), padding=1, name="head_conv1", dtype=x.dtype)(x)
        x = jax.image.resize(x, (n, height, width, cfg.features // 2), "bilinear")
        x = nn.Conv(32, (3, 3), padding=1, name="head_conv2", dtype=x.dtype)(x)
        x = nn.relu(x)
        return nn.Conv(cfg.out_channels, (1, 1), name="head_out", dtype=x.dtype)(x)
