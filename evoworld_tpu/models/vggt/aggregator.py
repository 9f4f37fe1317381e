"""VGGT aggregator: alternating frame-wise / global attention transformer.

TPU-native reimplementation of the upstream VGGT-1B aggregator (the
facebookresearch/vggt submodule is not vendored in the reference — API
reconstructed from call sites, SURVEY.md §2.9,
/root/reference/unified_loop_consistency.py:49-52): a DINOv2-style patch
embed feeds per-frame tokens (camera token + register tokens + patch
tokens); 24 block pairs each apply one attention layer within each frame and
one across the concatenated tokens of all frames. The tapped intermediate
outputs feed the DPT heads as the CONCATENATION of the frame-wise and global
block outputs (2*embed_dim channels), matching the upstream head input dims
so `facebook/VGGT-1B` weights convert directly.

TPU mapping decisions:
  - Alternating attention runs as plain batching — frame attention at
    (B*S, T, C) and global at (B, S*T, C) — through the same flash kernel,
    no custom masks.
  - Block pairs run under `nn.scan`, segmented at the DPT tap layers: one
    scan per segment keeps the compiled program a single block pair long
    (an unrolled 48-block HLO was too large for remote compilation) while
    only materializing the 4 tapped activations, not all 24.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from evoworld_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class AggregatorConfig:
    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24            # pairs of (frame, global) attention blocks
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    qk_norm: bool = True
    layerscale_init: float = 0.01
    # Block-pair indices whose (frame ‖ global) outputs feed the DPT heads
    # (upstream intermediate_layer_idx for VGGT-1B). The last entry must be
    # depth-1; its output also feeds the camera head.
    output_layers: Tuple[int, ...] = (4, 11, 17, 23)
    # Canonical patch grid the positional embedding is stored at (518/14 = 37
    # per side); bilinearly interpolated to the input's grid like DINOv2.
    base_patch_hw: Tuple[int, int] = (37, 37)
    # Per-frame DINOv2-style ViT encoder applied before the alternating
    # attention (upstream uses a full DINOv2 ViT-L as patch_embed).
    patch_encoder_depth: int = 24
    # DINOv2 backbone's own cls + register tokens (dinov2_vitl14_reg has 4
    # registers). They ride through the encoder blocks as keys/values —
    # every patch feature depends on them — and are dropped afterwards
    # (upstream consumes x_norm_patchtokens).
    dino_num_register_tokens: int = 4


def rope_2d(t: jnp.ndarray, positions: jnp.ndarray, base: float = 100.0) -> jnp.ndarray:
    """Upstream VGGT/croco 2D rotary embedding on (B, S, H, Dh) q or k.

    The head dim splits in half: the first half rotates by the token's y
    coordinate, the second by x; each half uses GPT-NeoX-style rotation
    (angles repeated twice, rotate-half pairing), frequency base 100
    (upstream RotaryPositionEmbedding2D, rope_freq=100 for VGGT-1B).
    positions: (S, 2) integer (y, x); rows of zeros (the special tokens)
    rotate by angle 0 = identity.
    """
    half = t.shape[-1] // 2

    def rope1d(x, pos):
        dim = x.shape[-1]
        inv = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
        ang = pos.astype(jnp.float32)[:, None] * inv[None]
        emb = jnp.concatenate([ang, ang], axis=-1)               # (S, dim)
        cos = jnp.cos(emb)[None, :, None, :].astype(x.dtype)
        sin = jnp.sin(emb)[None, :, None, :].astype(x.dtype)
        x1, x2 = jnp.split(x, 2, axis=-1)
        rot = jnp.concatenate([-x2, x1], axis=-1)
        return x * cos + rot * sin

    return jnp.concatenate(
        [rope1d(t[..., :half], positions[:, 0]), rope1d(t[..., half:], positions[:, 1])],
        axis=-1,
    )


class ViTBlock(nn.Module):
    """Pre-LN transformer block with optional QK-norm, LayerScale, and
    (when `positions` is passed) 2D rotary q/k embedding."""

    dim: int
    num_heads: int
    mlp_ratio: float
    qk_norm: bool
    layerscale_init: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, positions: jnp.ndarray | None = None) -> jnp.ndarray:
        d = self.dim
        head_dim = d // self.num_heads
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x.astype(jnp.float32)).astype(x.dtype)
        b, s, _ = h.shape
        qkv = nn.Dense(3 * d, name="qkv", dtype=x.dtype)(h).reshape(b, s, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.qk_norm:
            q = nn.LayerNorm(dtype=jnp.float32, name="q_norm")(q.astype(jnp.float32)).astype(x.dtype)
            k = nn.LayerNorm(dtype=jnp.float32, name="k_norm")(k.astype(jnp.float32)).astype(x.dtype)
        if positions is not None:
            # Upstream order: q/k norm first, then rotary (vggt Attention).
            q = rope_2d(q, positions)
            k = rope_2d(k, positions)
        attn = multi_head_attention(q, k, v).reshape(b, s, d)
        attn = nn.Dense(d, name="proj", dtype=x.dtype)(attn)
        ls1 = self.param("ls1", nn.initializers.constant(self.layerscale_init), (d,), jnp.float32)
        x = x + attn * ls1.astype(x.dtype)

        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x.astype(jnp.float32)).astype(x.dtype)
        h = nn.Dense(int(d * self.mlp_ratio), name="fc1", dtype=x.dtype)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(d, name="fc2", dtype=x.dtype)(h)
        ls2 = self.param("ls2", nn.initializers.constant(self.layerscale_init), (d,), jnp.float32)
        return x + h * ls2.astype(x.dtype)


class AlternatingPair(nn.Module):
    """One aggregator step: frame-local attention then global attention.

    Scan body. The carry is (tokens, tap) where `tap` holds the
    (frame_out ‖ global_out) concatenation of the CURRENT step — after the
    scan, the carry's tap is the last pair's output (the upstream per-layer
    intermediate, vggt aggregator concatenates frame+global outputs).
    """

    dim: int
    num_heads: int
    mlp_ratio: float
    qk_norm: bool
    layerscale_init: float
    batch: int

    @nn.compact
    def __call__(self, carry, _):
        tokens, _unused_tap, pos_frame, pos_global = carry
        bs, t, d = tokens.shape
        frame_out = ViTBlock(
            self.dim, self.num_heads, self.mlp_ratio, self.qk_norm,
            self.layerscale_init, name="frame",
        )(tokens, pos_frame)
        glob = frame_out.reshape(self.batch, (bs // self.batch) * t, d)
        glob = ViTBlock(
            self.dim, self.num_heads, self.mlp_ratio, self.qk_norm,
            self.layerscale_init, name="global",
        )(glob, pos_global)
        global_out = glob.reshape(bs, t, d)
        tap = jnp.concatenate([frame_out, global_out], axis=-1)
        return (global_out, tap, pos_frame, pos_global), ()


class DinoBlock(nn.Module):
    """Scan body for the frame-local patch encoder."""

    dim: int
    num_heads: int
    mlp_ratio: float

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, _):
        out = ViTBlock(self.dim, self.num_heads, self.mlp_ratio, qk_norm=False,
                       layerscale_init=1.0, name="block")(tokens)
        return out, ()


class Aggregator(nn.Module):
    """(B, S, H, W, 3) normalized images -> per-layer token stacks.

    Returns (outputs, patch_hw) where outputs is a list over
    config.output_layers of (B, S, T, 2C) concatenated frame‖global token
    arrays (T = 1 camera + R register + P patch tokens); the last entry is
    the final layer's output.
    """

    config: AggregatorConfig = AggregatorConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray, dino_features_only: bool = False):
        cfg = self.config
        assert cfg.output_layers[-1] == cfg.depth - 1, (
            "last tap must be the final block pair"
        )
        b, s, height, width, _ = images.shape
        ph, pw = height // cfg.patch_size, width // cfg.patch_size
        num_patches = ph * pw
        d = cfg.embed_dim

        # Upstream Aggregator.forward normalizes with the ImageNet
        # mean/std (registered as non-persistent buffers _resnet_mean/
        # _resnet_std, so they never appear in the checkpoint): inputs
        # arrive in [0, 1] from load_and_preprocess_images.
        mean = jnp.asarray([0.485, 0.456, 0.406], images.dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], images.dtype)
        images = (images - mean) / std

        x = images.reshape(b * s, height, width, 3)
        patches = nn.Conv(
            d, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID", name="patch_embed", dtype=images.dtype,
        )(x).reshape(b * s, num_patches, d)
        import jax

        bh, bw = cfg.base_patch_hw
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (bh * bw, d), jnp.float32
        )
        if (ph, pw) != (bh, bw):
            # DINOv2 interpolate_pos_encoding uses bicubic (half-pixel).
            pos = jax.image.resize(pos.reshape(bh, bw, d), (ph, pw, d), "cubic").reshape(ph * pw, d)
        patches = patches + pos.astype(patches.dtype)[None]

        # Frame-local ViT encoder (DINOv2 role): runs on (B*S, 1+R+P, C) —
        # the backbone's cls + register tokens participate in every block's
        # attention (dinov2_vitl14_reg semantics; dropping them changes every
        # patch feature) — scanned over depth (params stacked on a leading
        # layer axis), with DINOv2's final norm; only the patch tokens
        # continue (upstream consumes x_norm_patchtokens).
        if cfg.patch_encoder_depth > 0:
            n_dino_special = 1 + cfg.dino_num_register_tokens
            cls_tok = self.param(
                "dino_cls_token", nn.initializers.normal(0.02), (1, d), jnp.float32
            )
            pos_cls = self.param(
                "pos_embed_cls", nn.initializers.zeros, (1, d), jnp.float32
            )
            dino_reg = self.param(
                "dino_register_tokens", nn.initializers.normal(0.02),
                (cfg.dino_num_register_tokens, d), jnp.float32,
            )
            special_dino = jnp.concatenate(
                [(cls_tok + pos_cls), dino_reg], axis=0
            ).astype(patches.dtype)
            patches = jnp.concatenate(
                [jnp.broadcast_to(special_dino[None], (b * s,) + special_dino.shape), patches],
                axis=1,
            )
            dino_scan = nn.scan(
                DinoBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=cfg.patch_encoder_depth,
            )
            patches, _ = dino_scan(d, cfg.num_heads, cfg.mlp_ratio, name="dino_blocks")(patches, None)
            patches = nn.LayerNorm(dtype=jnp.float32, name="dino_norm")(
                patches.astype(jnp.float32)
            ).astype(patches.dtype)[:, n_dino_special:]
        if dino_features_only:
            # Expose the DINOv2-role patch features (x_norm_patchtokens) for
            # cross-framework parity tests; alternating blocks don't run.
            return patches, (ph, pw)

        # Camera + register tokens; frame 0 (the query frame) gets its own
        # set so the model can identify the reference view (upstream
        # camera_token/register_token have a leading 2-slot axis:
        # slot 0 = first frame, slot 1 = all other frames).
        def tok(name, n):
            return self.param(name, nn.initializers.normal(0.02), (n, d), jnp.float32)

        cam_first, cam_rest = tok("camera_token_first", 1), tok("camera_token", 1)
        reg_first = tok("register_token_first", cfg.num_register_tokens)
        reg_rest = tok("register_token", cfg.num_register_tokens)

        def frame_tokens(i):
            cam = cam_first if i == 0 else cam_rest
            reg = reg_first if i == 0 else reg_rest
            return jnp.concatenate([cam, reg], axis=0)

        special = jnp.stack([frame_tokens(i) for i in range(s)], axis=0)  # (S, 1+R, d)
        special = jnp.broadcast_to(special[None], (b,) + special.shape).reshape(
            b * s, 1 + cfg.num_register_tokens, d
        ).astype(patches.dtype)

        tokens = jnp.concatenate([special, patches], axis=1)   # (B*S, T, d)
        t = tokens.shape[1]

        # Token (y, x) positions for the 2D rotary embedding: special tokens
        # sit at (0, 0) — angle 0, identity rotation — and the patch grid is
        # shifted by +1 (upstream PositionGetter + patch_start_idx handling).
        n_special = 1 + cfg.num_register_tokens
        gy = jax.lax.broadcasted_iota(jnp.int32, (ph, pw), 0) + 1
        gx = jax.lax.broadcasted_iota(jnp.int32, (ph, pw), 1) + 1
        pos_patch = jnp.stack([gy, gx], axis=-1).reshape(num_patches, 2)
        pos_frame = jnp.concatenate(
            [jnp.zeros((n_special, 2), jnp.int32), pos_patch], axis=0
        )                                                      # (T, 2)
        pos_global = jnp.tile(pos_frame, (s, 1))               # (S*T, 2)

        # Segmented scans over block pairs: one scan per tap segment. Only
        # the carry (current tokens + last pair's frame‖global concat) is
        # materialized — the 4 taps, not all `depth` layers.
        outputs = []
        start = 0
        carry = (
            tokens,
            jnp.zeros(tokens.shape[:-1] + (2 * d,), tokens.dtype),
            pos_frame,
            pos_global,
        )
        for seg_idx, tap_layer in enumerate(cfg.output_layers):
            seg_len = tap_layer + 1 - start
            pair_scan = nn.scan(
                AlternatingPair,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=seg_len,
            )
            carry, _ = pair_scan(
                d, cfg.num_heads, cfg.mlp_ratio, cfg.qk_norm, cfg.layerscale_init, b,
                name=f"blocks_{seg_idx}",
            )(carry, None)
            outputs.append(carry[1].reshape(b, s, t, 2 * d))
            start = tap_layer + 1
        return outputs, (ph, pw)
