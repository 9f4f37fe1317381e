"""CLIP ViT-H/14 vision tower with projection head.

Functional equivalent of the frozen `CLIPVisionModelWithProjection` the
reference loads from the SVD checkpoint's image_encoder subfolder
(/root/reference/evoworld/pipeline/pipeline_evoworld.py:22,
train_evoworld.py:167-177): 224x224 input, patch 14, hidden 1280, 32 layers,
16 heads, MLP 5120, projection to 1024-d image embeds used as the UNet's
cross-attention context.

Includes the input preprocessing pipeline matching the reference's
`_encode_image` (pipeline_evoworld.py:255-305): antialiased resize to 224
then CLIP mean/std normalization (feature_extractor with do_resize=False).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from evoworld_tpu.ops.attention import multi_head_attention

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1280
    num_layers: int = 32
    num_heads: int = 16
    mlp_dim: int = 5120
    projection_dim: int = 1024
    layer_norm_eps: float = 1e-5
    # "gelu" (exact, the SVD image encoder / laion ViT-H) or "quick_gelu"
    # (x·sigmoid(1.702x), OpenAI CLIP checkpoints e.g. the DreamSim
    # clip_vitb32 branch).
    hidden_act: str = "gelu"


class CLIPEncoderLayer(nn.Module):
    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_heads
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="layer_norm1")(x)
        b, s, _ = h.shape
        q = nn.Dense(cfg.hidden_size, name="q_proj", dtype=x.dtype)(h).reshape(b, s, cfg.num_heads, head_dim)
        k = nn.Dense(cfg.hidden_size, name="k_proj", dtype=x.dtype)(h).reshape(b, s, cfg.num_heads, head_dim)
        v = nn.Dense(cfg.hidden_size, name="v_proj", dtype=x.dtype)(h).reshape(b, s, cfg.num_heads, head_dim)
        attn = multi_head_attention(q, k, v).reshape(b, s, cfg.hidden_size)
        x = x + nn.Dense(cfg.hidden_size, name="out_proj", dtype=x.dtype)(attn)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="layer_norm2")(x)
        h = nn.Dense(cfg.mlp_dim, name="fc1", dtype=x.dtype)(h)
        if cfg.hidden_act == "quick_gelu":
            h = h * nn.sigmoid(1.702 * h)
        else:
            h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, name="fc2", dtype=x.dtype)(h)
        return x + h


class CLIPVisionTower(nn.Module):
    """Pixel values (B, 224, 224, 3), already normalized -> (B, projection_dim)."""

    config: CLIPVisionConfig = CLIPVisionConfig()

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        b = pixels.shape[0]
        num_patches = (cfg.image_size // cfg.patch_size) ** 2

        patches = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            padding="VALID",
            name="patch_embedding",
            dtype=pixels.dtype,
        )(pixels).reshape(b, num_patches, cfg.hidden_size)

        class_emb = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,), jnp.float32
        ).astype(pixels.dtype)
        x = jnp.concatenate([jnp.broadcast_to(class_emb, (b, 1, cfg.hidden_size)), patches], axis=1)
        pos_emb = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (num_patches + 1, cfg.hidden_size),
            jnp.float32,
        ).astype(pixels.dtype)
        x = x + pos_emb[None]

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="pre_layrnorm")(x)
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg, name=f"layers_{i}")(x)

        pooled = x[:, 0]
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="post_layernorm")(pooled)
        return nn.Dense(cfg.projection_dim, use_bias=False, name="visual_projection", dtype=pixels.dtype)(pooled)


def clip_preprocess(images: jnp.ndarray) -> jnp.ndarray:
    """Normalize [0, 1] RGB (B, 224, 224, 3) images with CLIP mean/std."""
    mean = jnp.asarray(CLIP_MEAN, images.dtype)
    std = jnp.asarray(CLIP_STD, images.dtype)
    return (images - mean) / std
