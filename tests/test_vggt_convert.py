"""VGGT weight-converter round-trip tests.

Builds a SYNTHETIC state dict with the upstream facebookresearch/vggt
naming/shapes (the real facebook/VGGT-1B checkpoint is unavailable in this
zero-egress image), converts it, and asserts (a) every source key is
consumed, (b) the converted tree exactly matches the model's init tree
(paths + shapes), (c) the model runs on the converted weights. Torch layout
transforms (ConvTranspose2d flip, conv1x1-as-dense) are verified numerically
against torch itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evoworld_tpu.models.vggt import VGGT, VGGTConfig
from evoworld_tpu.models.vggt.aggregator import AggregatorConfig
from evoworld_tpu.models.vggt.weights import (
    _t_conv_transpose,
    convert_vggt_state_dict,
)

C = 32          # embed dim
HEADS = 4
DEPTH = 4       # alternating pairs
TAPS = (0, 1, 2, 3)   # DPT consumes exactly 4 taps
DINO = 2
REG = 2
TRUNK = 2
FEATS = 8
LAYER_DIMS = (8, 16, 32, 32)
PATCH = 14

TINY = VGGTConfig(
    aggregator=AggregatorConfig(
        embed_dim=C, depth=DEPTH, num_heads=HEADS, num_register_tokens=REG,
        dino_num_register_tokens=REG,
        output_layers=TAPS, patch_encoder_depth=DINO, base_patch_hw=(2, 2),
    ),
    camera_trunk_depth=TRUNK,
    dpt_features=FEATS,
    dpt_layer_dims=LAYER_DIMS,
)


def _block_keys(prefix: str, dim: int, qk_norm: bool, rng) -> dict:
    hidden = dim * 4
    out = {
        f"{prefix}.norm1.weight": rng.normal(size=(dim,)),
        f"{prefix}.norm1.bias": rng.normal(size=(dim,)),
        f"{prefix}.attn.qkv.weight": rng.normal(size=(3 * dim, dim)),
        f"{prefix}.attn.qkv.bias": rng.normal(size=(3 * dim,)),
        f"{prefix}.attn.proj.weight": rng.normal(size=(dim, dim)),
        f"{prefix}.attn.proj.bias": rng.normal(size=(dim,)),
        f"{prefix}.ls1.gamma": rng.normal(size=(dim,)),
        f"{prefix}.ls2.gamma": rng.normal(size=(dim,)),
        f"{prefix}.norm2.weight": rng.normal(size=(dim,)),
        f"{prefix}.norm2.bias": rng.normal(size=(dim,)),
        f"{prefix}.mlp.fc1.weight": rng.normal(size=(hidden, dim)),
        f"{prefix}.mlp.fc1.bias": rng.normal(size=(hidden,)),
        f"{prefix}.mlp.fc2.weight": rng.normal(size=(dim, hidden)),
        f"{prefix}.mlp.fc2.bias": rng.normal(size=(dim,)),
    }
    if qk_norm:
        hd = dim // HEADS
        out.update({
            f"{prefix}.attn.q_norm.weight": rng.normal(size=(hd,)),
            f"{prefix}.attn.q_norm.bias": rng.normal(size=(hd,)),
            f"{prefix}.attn.k_norm.weight": rng.normal(size=(hd,)),
            f"{prefix}.attn.k_norm.bias": rng.normal(size=(hd,)),
        })
    return out


def _dpt_keys(head: str, dim_in: int, rng) -> dict:
    f = FEATS
    out = {}
    for i, oc in enumerate(LAYER_DIMS):
        out[f"{head}.projects.{i}.weight"] = rng.normal(size=(oc, dim_in, 1, 1))
        out[f"{head}.projects.{i}.bias"] = rng.normal(size=(oc,))
        out[f"{head}.scratch.layer{i + 1}_rn.weight"] = rng.normal(size=(f, oc, 3, 3))
    out[f"{head}.resize_layers.0.weight"] = rng.normal(size=(LAYER_DIMS[0], LAYER_DIMS[0], 4, 4))
    out[f"{head}.resize_layers.0.bias"] = rng.normal(size=(LAYER_DIMS[0],))
    out[f"{head}.resize_layers.1.weight"] = rng.normal(size=(LAYER_DIMS[1], LAYER_DIMS[1], 2, 2))
    out[f"{head}.resize_layers.1.bias"] = rng.normal(size=(LAYER_DIMS[1],))
    out[f"{head}.resize_layers.3.weight"] = rng.normal(size=(LAYER_DIMS[3], LAYER_DIMS[3], 3, 3))
    out[f"{head}.resize_layers.3.bias"] = rng.normal(size=(LAYER_DIMS[3],))
    for j in range(1, 5):
        for unit in ("resConfUnit1", "resConfUnit2"):
            for conv in ("conv1", "conv2"):
                out[f"{head}.scratch.refinenet{j}.{unit}.{conv}.weight"] = rng.normal(size=(f, f, 3, 3))
                out[f"{head}.scratch.refinenet{j}.{unit}.{conv}.bias"] = rng.normal(size=(f,))
        out[f"{head}.scratch.refinenet{j}.out_conv.weight"] = rng.normal(size=(f, f, 1, 1))
        out[f"{head}.scratch.refinenet{j}.out_conv.bias"] = rng.normal(size=(f,))
    out[f"{head}.scratch.output_conv1.weight"] = rng.normal(size=(f // 2, f, 3, 3))
    out[f"{head}.scratch.output_conv1.bias"] = rng.normal(size=(f // 2,))
    out[f"{head}.scratch.output_conv2.0.weight"] = rng.normal(size=(32, f // 2, 3, 3))
    out[f"{head}.scratch.output_conv2.0.bias"] = rng.normal(size=(32,))
    out[f"{head}.scratch.output_conv2.2.weight"] = rng.normal(size=(head == "point_head" and 4 or 2, 32, 1, 1))
    out[f"{head}.scratch.output_conv2.2.bias"] = rng.normal(size=(head == "point_head" and 4 or 2,))
    return out


def make_synthetic_upstream_state_dict(seed: int = 0) -> dict:
    """Upstream VGGT-1B naming at TINY dims (see module docstring)."""
    rng = np.random.default_rng(seed)
    d2 = 2 * C
    sd = {
        "aggregator.patch_embed.cls_token": rng.normal(size=(1, 1, C)),
        "aggregator.patch_embed.register_tokens": rng.normal(size=(1, REG, C)),
        "aggregator.patch_embed.mask_token": rng.normal(size=(1, C)),
        "aggregator.patch_embed.pos_embed": rng.normal(size=(1, 1 + 4, C)),
        "aggregator.patch_embed.patch_embed.proj.weight": rng.normal(size=(C, 3, PATCH, PATCH)),
        "aggregator.patch_embed.patch_embed.proj.bias": rng.normal(size=(C,)),
        "aggregator.patch_embed.norm.weight": rng.normal(size=(C,)),
        "aggregator.patch_embed.norm.bias": rng.normal(size=(C,)),
        "aggregator.camera_token": rng.normal(size=(1, 2, 1, C)),
        "aggregator.register_token": rng.normal(size=(1, 2, REG, C)),
        "camera_head.token_norm.weight": rng.normal(size=(d2,)),
        "camera_head.token_norm.bias": rng.normal(size=(d2,)),
        "camera_head.empty_pose_tokens": rng.normal(size=(1, 1, 9)),
        "camera_head.embed_pose.weight": rng.normal(size=(d2, 9)),
        "camera_head.embed_pose.bias": rng.normal(size=(d2,)),
        "camera_head.poseLN_modulation.1.weight": rng.normal(size=(3 * d2, d2)),
        "camera_head.poseLN_modulation.1.bias": rng.normal(size=(3 * d2,)),
        "camera_head.trunk_norm.weight": rng.normal(size=(d2,)),
        "camera_head.trunk_norm.bias": rng.normal(size=(d2,)),
        "camera_head.pose_branch.fc1.weight": rng.normal(size=(d2 // 2, d2)),
        "camera_head.pose_branch.fc1.bias": rng.normal(size=(d2 // 2,)),
        "camera_head.pose_branch.fc2.weight": rng.normal(size=(9, d2 // 2)),
        "camera_head.pose_branch.fc2.bias": rng.normal(size=(9,)),
    }
    for i in range(DINO):
        sd.update(_block_keys(f"aggregator.patch_embed.blocks.{i}", C, False, rng))
    for i in range(DEPTH):
        sd.update(_block_keys(f"aggregator.frame_blocks.{i}", C, True, rng))
        sd.update(_block_keys(f"aggregator.global_blocks.{i}", C, True, rng))
    for i in range(TRUNK):
        sd.update(_block_keys(f"camera_head.trunk.{i}", d2, False, rng))  # upstream trunk has no qk-norm
    sd.update(_dpt_keys("depth_head", d2, rng))
    sd.update(_dpt_keys("point_head", d2, rng))
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def _flat_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flat_shapes(v, p))
        else:
            out[p] = tuple(v.shape)
    return out


class TestVGGTConversion:
    def test_roundtrip_structure_and_run(self):
        sd = make_synthetic_upstream_state_dict()
        params, report = convert_vggt_state_dict(sd, output_layers=TAPS)
        assert report == [], report[:10]

        model = VGGT(TINY)
        imgs = jnp.zeros((1, 2, 2 * PATCH, 2 * PATCH, 3))
        want = jax.eval_shape(lambda k: model.init(k, imgs), jax.random.key(0))
        got_shapes = _flat_shapes(params["params"])
        want_shapes = _flat_shapes(want["params"])
        missing = set(want_shapes) - set(got_shapes)
        extra = set(got_shapes) - set(want_shapes)
        assert not missing, sorted(missing)[:10]
        assert not extra, sorted(extra)[:10]
        mismatched = {
            k: (got_shapes[k], want_shapes[k])
            for k in want_shapes
            if got_shapes[k] != want_shapes[k]
        }
        assert not mismatched, list(mismatched.items())[:10]

        preds = model.apply(
            jax.tree.map(jnp.asarray, params), jnp.ones((1, 2, 2 * PATCH, 2 * PATCH, 3)) * 0.5
        )
        for k in ("pose_enc", "depth", "depth_conf", "world_points"):
            assert np.isfinite(np.asarray(preds[k])).all(), k

    def test_loader_reports_nothing_missing_on_tampered_dict(self):
        sd = make_synthetic_upstream_state_dict()
        del sd["camera_head.trunk_norm.weight"]
        sd["bogus.key"] = np.zeros((1,), np.float32)
        _, report = convert_vggt_state_dict(sd, output_layers=TAPS)
        assert any("camera_head.trunk_norm.weight" in r for r in report)
        assert any("bogus.key" in r for r in report)


class TestTorchLayoutParity:
    """The converter's tensor layout transforms vs torch ground truth."""

    def test_conv_transpose_flip(self):
        torch = pytest.importorskip("torch")
        from flax import linen as nn

        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 5, 6, 3)).astype(np.float32)
        w = rng.normal(size=(3, 4, 4, 4)).astype(np.float32)
        b = rng.normal(size=(4,)).astype(np.float32)
        tm = torch.nn.ConvTranspose2d(3, 4, 4, stride=4)
        tm.weight.data = torch.from_numpy(w)
        tm.bias.data = torch.from_numpy(b)
        ty = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)

        m = nn.ConvTranspose(4, (4, 4), strides=(4, 4))
        jy = m.apply(
            {"params": {"kernel": jnp.asarray(_t_conv_transpose(w)), "bias": jnp.asarray(b)}},
            jnp.asarray(x),
        )
        np.testing.assert_allclose(np.asarray(jy), ty, atol=1e-4)

    def test_conv1x1_as_dense(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 7, 5)).astype(np.float32)   # (N, P, Cin)
        w = rng.normal(size=(6, 5, 1, 1)).astype(np.float32)
        b = rng.normal(size=(6,)).astype(np.float32)
        tm = torch.nn.Conv2d(5, 6, 1)
        tm.weight.data = torch.from_numpy(w)
        tm.bias.data = torch.from_numpy(b)
        tx = torch.from_numpy(x.transpose(0, 2, 1)[:, :, :, None])  # (N, C, P, 1)
        ty = tm(tx).detach().numpy()[:, :, :, 0].transpose(0, 2, 1)

        from evoworld_tpu.models.weights import _t_linear

        jy = np.asarray(jnp.asarray(x) @ jnp.asarray(_t_linear(w[:, :, 0, 0])) + b)
        np.testing.assert_allclose(jy, ty, atol=1e-4)
