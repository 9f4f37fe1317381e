"""VGGT prediction heads: iterative camera head and DPT dense heads.

Reimplemented from the upstream VGGT-1B architecture (submodule not vendored;
API from call sites, SURVEY.md §2.9; structure and parameter naming follow
upstream facebookresearch/vggt heads so `facebook/VGGT-1B` weights convert —
see models/vggt/weights.py):
  - CameraHead: adaLN-modulated trunk of transformer blocks iteratively
    refining a 9-d pose encoding [t(3), quat(4), fov(2)] from the
    (frame ‖ global) camera tokens of the last aggregator layer;
  - DPTHead: reassembles 4 tapped aggregator layers into multi-scale feature
    maps (conv-transpose / strided-conv resize layers), fuses them with
    RefineNet-style fusion blocks, and predicts dense outputs (depth+conf =
    2 channels, or point-map+conf = 4 channels) at full image resolution.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from evoworld_tpu.models.vggt.aggregator import ViTBlock


class CameraHead(nn.Module):
    """Iterative pose regression from camera tokens (upstream camera_head.py).

    (B, S, dim_in) camera tokens -> (B, S, 9) pose encoding. Each refinement
    iteration embeds the current estimate, modulates the tokens with an
    adaptive LayerNorm (shift/scale/gate), runs the trunk (attending across
    frames), and adds a predicted delta. Deep supervision trains on all
    iterations; at inference only the last matters.
    """

    dim_in: int = 2048
    trunk_depth: int = 4
    num_heads: int = 16
    num_iters: int = 4
    out_dim: int = 9

    @nn.compact
    def __call__(self, camera_tokens: jnp.ndarray) -> jnp.ndarray:
        b, s, _ = camera_tokens.shape
        d = self.dim_in
        dtype = camera_tokens.dtype
        tokens = nn.LayerNorm(dtype=jnp.float32, name="token_norm")(
            camera_tokens.astype(jnp.float32)
        ).astype(dtype)

        empty_pose = self.param(
            "empty_pose_tokens", nn.initializers.zeros, (1, 1, self.out_dim), jnp.float32
        )
        embed_pose = nn.Dense(d, name="embed_pose", dtype=dtype)
        # Upstream: Sequential(SiLU, Linear(d, 3d)) producing shift/scale/gate.
        modulation = nn.Dense(3 * d, name="poseLN_modulation", dtype=dtype)
        adaln_norm = nn.LayerNorm(
            use_bias=False, use_scale=False, dtype=jnp.float32, name="adaln_norm"
        )

        # Trunk scanned over depth (same block weights stacked on a leading
        # layer axis); refinement iterations reuse the same trunk.
        class TrunkStep(nn.Module):
            dim: int
            num_heads: int

            @nn.compact
            def __call__(self, h, _):
                # Upstream camera_head builds its trunk with the Block
                # DEFAULTS: qk_norm=False (the aggregator's alternating
                # blocks are the ones with qk_norm=True) — the real
                # checkpoint has no trunk q_norm/k_norm weights.
                return ViTBlock(self.dim, self.num_heads, 4.0, False, 0.01, name="block")(h), ()

        trunk = nn.scan(
            TrunkStep,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.trunk_depth,
        )(d, self.num_heads, name="trunk")
        trunk_norm = nn.LayerNorm(dtype=jnp.float32, name="trunk_norm")
        # Upstream pose_branch: Mlp(d -> d//2 -> out_dim).
        branch_fc1 = nn.Dense(d // 2, name="pose_branch_fc1", dtype=dtype)
        branch_fc2 = nn.Dense(self.out_dim, name="pose_branch_fc2", dtype=dtype)

        pose = jnp.broadcast_to(empty_pose, (b, s, self.out_dim)).astype(jnp.float32)
        for it in range(self.num_iters):
            # Upstream detaches pred_pose_enc only from iteration 1 onward;
            # iteration 0 consumes empty_pose_tokens directly so they stay
            # trainable (camera_head.py's `pred_pose_enc.detach()`).
            pose_in = pose if it == 0 else jax.lax.stop_gradient(pose)
            module_input = embed_pose(pose_in.astype(dtype))
            mod = modulation(nn.silu(module_input))
            shift, scale, gate = jnp.split(mod, 3, axis=-1)
            h = adaln_norm(tokens.astype(jnp.float32)).astype(dtype)
            h = gate * (h * (1.0 + scale) + shift) + tokens
            h, _ = trunk(h, None)
            h = trunk_norm(h.astype(jnp.float32)).astype(dtype)
            delta = branch_fc2(nn.gelu(branch_fc1(h), approximate=False)).astype(jnp.float32)
            pose = delta if it == 0 else pose + delta
        return pose


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    features: int = 256
    out_channels: int = 2              # depth + confidence
    layer_dims: Tuple[int, ...] = (256, 512, 1024, 1024)
    dim: int = 2048                    # aggregator tap width (frame ‖ global)
    patch_size: int = 14


class FeatureFusionBlock(nn.Module):
    """RefineNet-style fusion (upstream scratch.refinenet{1..4}).

    resConfUnit1 processes the lateral skip, resConfUnit2 the merged path;
    both are residual (relu-conv-relu-conv + identity). The block upsamples
    to `out_hw` and projects with a 1x1 conv. resConfUnit1 parameters are
    always created (the coarsest block never uses them, but the upstream
    state dict carries them).
    """

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray | None, out_hw):
        f = self.features

        def res_unit(h, name):
            r = nn.relu(h)
            r = nn.Conv(f, (3, 3), padding=1, name=f"{name}_conv1", dtype=h.dtype)(r)
            r = nn.relu(r)
            r = nn.Conv(f, (3, 3), padding=1, name=f"{name}_conv2", dtype=h.dtype)(r)
            return h + r

        # Always instantiate resConfUnit1 so the param tree matches upstream.
        unit1_conv1 = nn.Conv(f, (3, 3), padding=1, name="res1_conv1", dtype=x.dtype)
        unit1_conv2 = nn.Conv(f, (3, 3), padding=1, name="res1_conv2", dtype=x.dtype)
        if skip is not None:
            r = nn.relu(skip)
            r = unit1_conv1(r)
            r = nn.relu(r)
            r = unit1_conv2(r)
            x = x + (skip + r)
        else:
            _ = unit1_conv1(jnp.zeros_like(x))  # param creation only
            _ = unit1_conv2(jnp.zeros_like(x))

        x = res_unit(x, "res2")
        n, _, _, c = x.shape
        # Upstream custom_interpolate: bilinear with align_corners=True.
        from evoworld_tpu.ops.resize import resize_bilinear_align_corners

        x = resize_bilinear_align_corners(x, out_hw)
        return nn.Conv(f, (1, 1), name="out_conv", dtype=x.dtype)(x)


class DPTHead(nn.Module):
    """Dense prediction from 4 tapped aggregator layers (upstream dpt_head.py).

    Args to __call__:
        layer_tokens: list of 4 (B*S, P, dim) patch-token arrays
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

        # Reassemble: 1x1 projection per layer, then learned resampling to
        # the pyramid scale (x4, x2, x1, x0.5 of the patch grid — upstream
        # resize_layers: ConvTranspose(4,4), ConvTranspose(2,2), Identity,
        # Conv stride 2), then the 3x3 bias-free scratch.layerN_rn conv.
        feats = []
        for i, tokens in enumerate(layer_tokens):
            oc = cfg.layer_dims[i]
            f = nn.Dense(oc, name=f"project_{i}", dtype=tokens.dtype)(tokens)
            f = f.reshape(n, ph, pw, oc)
            if i == 0:
                f = nn.ConvTranspose(oc, (4, 4), strides=(4, 4), name="resize_0", dtype=f.dtype)(f)
            elif i == 1:
                f = nn.ConvTranspose(oc, (2, 2), strides=(2, 2), name="resize_1", dtype=f.dtype)(f)
            elif i == 3:
                f = nn.Conv(oc, (3, 3), strides=(2, 2), padding=1, name="resize_3", dtype=f.dtype)(f)
            f = nn.Conv(
                cfg.features, (3, 3), padding=1, use_bias=False,
                name=f"layer_{i + 1}_rn", dtype=f.dtype,
            )(f)
            feats.append(f)

        # Top-down fusion from the coarsest level; each fusion upsamples to
        # the next-finer lateral's grid (the finest doubles the patch-x4 grid).
        x = FeatureFusionBlock(cfg.features, name="refinenet4")(
            feats[3], None, feats[2].shape[1:3]
        )
        x = FeatureFusionBlock(cfg.features, name="refinenet3")(
            x, feats[2], feats[1].shape[1:3]
        )
        x = FeatureFusionBlock(cfg.features, name="refinenet2")(
            x, feats[1], feats[0].shape[1:3]
        )
        x = FeatureFusionBlock(cfg.features, name="refinenet1")(
            x, feats[0], (feats[0].shape[1] * 2, feats[0].shape[2] * 2)
        )

        x = nn.Conv(cfg.features // 2, (3, 3), padding=1, name="output_conv1", dtype=x.dtype)(x)
        from evoworld_tpu.ops.resize import resize_bilinear_align_corners

        x = resize_bilinear_align_corners(x, (height, width))
        x = nn.Conv(32, (3, 3), padding=1, name="output_conv2_0", dtype=x.dtype)(x)
        x = nn.relu(x)
        return nn.Conv(cfg.out_channels, (1, 1), name="output_conv2_2", dtype=x.dtype)(x)
