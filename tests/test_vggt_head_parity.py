"""Non-circular torch-twin parity for the VGGT camera head and DPT head.

Upstream-named torch restatements (tests/torch_vggt_heads.py) convert
through the REAL converter sections in models/vggt/weights.py
(`_convert_camera_head`, `_convert_dpt_head`) and must reproduce our Flax
heads numerically — closing the round-2 verdict gap where these heads were
only synthetic-round-trip tested (a drift in adaLN gating, trunk wiring, or
refinenet fusion now fails here instead of silently corrupting the 3D
memory loop once real weights arrive).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from evoworld_tpu.models.vggt.heads import CameraHead, DPTConfig, DPTHead
from evoworld_tpu.models.vggt.weights import (
    _Converter,
    _convert_camera_head,
    _convert_dpt_head,
)


class TestCameraHeadParity:
    def test_matches_torch_twin(self):
        from tests.torch_vggt_heads import CameraHead as TorchCameraHead

        dim, heads, depth, iters = 128, 4, 4, 4
        torch.manual_seed(0)
        twin = TorchCameraHead(dim_in=dim, trunk_depth=depth, num_heads=heads).eval()
        # Non-zero pose seed so the iteration-0 embed path is exercised.
        with torch.no_grad():
            twin.empty_pose_tokens.uniform_(-0.5, 0.5)

        rng = np.random.default_rng(0)
        tokens = rng.normal(size=(2, 3, dim)).astype(np.float32)
        with torch.no_grad():
            want = twin(torch.tensor(tokens), num_iterations=iters).numpy()
        assert want.shape == (2, 3, 9)

        sd = {k: v.numpy() for k, v in twin.state_dict().items()}
        c = _Converter({f"camera_head.{k}": v for k, v in sd.items()})
        _convert_camera_head(c, "camera_head", "camera_head")
        assert [r for r in c.report if "q_norm" not in r and "k_norm" not in r] == [], c.report[:8]
        params = {"params": c.out["camera_head"]}

        ours = CameraHead(dim_in=dim, trunk_depth=depth, num_heads=heads,
                          num_iters=iters)
        with jax.default_matmul_precision("highest"):
            got = np.asarray(ours.apply(params, jnp.asarray(tokens)))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


class TestRoPEBlockParity:
    def test_aggregator_block_matches_torch_twin(self):
        """One alternating-aggregator block (qk_norm + LayerScale + 2D RoPE)
        vs an upstream-shaped torch twin, converted through the real
        _Converter.block() map — a drift in rotate-half pairing, the
        y-then-x half split, frequency base, or qk-norm/rope ordering fails
        here."""
        from evoworld_tpu.models.vggt.aggregator import ViTBlock
        from tests.torch_vggt_heads import Block as TorchBlock, RoPE2D

        dim, heads = 64, 4
        torch.manual_seed(2)
        twin = TorchBlock(dim, heads, qk_norm=True, rope=RoPE2D()).eval()

        b, ph, pw, special = 2, 3, 5, 4
        s = special + ph * pw
        # Special tokens at position (0,0) = identity rotation; patch tokens
        # on a +1-shifted grid (upstream PositionGetter + patch_start_idx).
        yx = np.stack(np.meshgrid(np.arange(ph) + 1, np.arange(pw) + 1,
                                  indexing="ij"), -1).reshape(-1, 2)
        positions = np.concatenate([np.zeros((special, 2), np.int64), yx], 0)

        rng = np.random.default_rng(3)
        x = rng.normal(size=(b, s, dim)).astype(np.float32)
        with torch.no_grad():
            want = twin(torch.tensor(x),
                        torch.tensor(positions)[None].expand(b, -1, -1)).numpy()

        sd = {k: v.numpy() for k, v in twin.state_dict().items()}
        c = _Converter({f"blk.{k}": v for k, v in sd.items()})
        leaf = c.block("blk")
        assert c.report == [], c.report[:8]

        ours = ViTBlock(dim, heads, 4.0, True, 0.01)
        with jax.default_matmul_precision("highest"):
            got = np.asarray(ours.apply({"params": leaf}, jnp.asarray(x),
                                        jnp.asarray(positions)))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


class TestDPTHeadParity:
    def test_matches_torch_twin(self):
        from tests.torch_vggt_heads import DPTHead as TorchDPTHead

        dim, features = 64, 32
        layer_dims = (16, 24, 32, 48)
        ph, pw = 3, 4
        image_hw = (42, 56)  # patch 14 grid

        torch.manual_seed(1)
        twin = TorchDPTHead(dim_in=dim, features=features,
                            layer_dims=layer_dims, out_channels=2).eval()

        rng = np.random.default_rng(1)
        taps = [rng.normal(size=(2, ph * pw, dim)).astype(np.float32)
                for _ in range(4)]
        with torch.no_grad():
            want = twin([torch.tensor(t) for t in taps], (ph, pw), image_hw)
            want = want.permute(0, 2, 3, 1).numpy()  # NCHW -> NHWC
        assert want.shape == (2, *image_hw, 2)

        sd = {f"depth_head.{k}": v.numpy() for k, v in twin.state_dict().items()}
        c = _Converter(sd)
        _convert_dpt_head(c, "depth_head", "depth_head")
        assert c.report == [], c.report[:8]
        assert sorted(set(sd) - c.used) == []  # every twin key consumed
        params = {"params": c.out["depth_head"]}

        ours = DPTHead(DPTConfig(features=features, out_channels=2,
                                 layer_dims=layer_dims, dim=dim))
        with jax.default_matmul_precision("highest"):
            got = np.asarray(
                ours.apply(params, [jnp.asarray(t) for t in taps], (ph, pw), image_hw)
            )
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
