"""Checkpoint-conversion tests.

CLIP gets true numerical parity against the installed torch/transformers
implementation (random weights). UNet/VAE converters are checked structurally
against our init trees (diffusers itself is not installed here; full parity
runs once real checkpoints are available — SURVEY.md §4b).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evoworld_tpu.models.clip import CLIPVisionTower, CLIPVisionConfig
from evoworld_tpu.models.weights import (
    convert_clip_state_dict,
    expand_conv_in_kernel,
    verify_tree_matches,
)


class TestCLIPParity:
    def test_matches_transformers(self):
        torch = pytest.importorskip("torch")
        from transformers import CLIPVisionConfig as HFConfig
        from transformers import CLIPVisionModelWithProjection

        hf_cfg = HFConfig(
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=32,
            patch_size=8,
            projection_dim=48,
            hidden_act="gelu",
            layer_norm_eps=1e-5,
        )
        torch.manual_seed(0)
        hf_model = CLIPVisionModelWithProjection(hf_cfg).eval()

        x = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            want = hf_model(torch.tensor(x)).image_embeds.numpy()

        state = {k: v.numpy() for k, v in hf_model.state_dict().items()}
        params = convert_clip_state_dict(state)

        ours_cfg = CLIPVisionConfig(
            image_size=32, patch_size=8, hidden_size=64, num_layers=2,
            num_heads=4, mlp_dim=128, projection_dim=48,
        )
        tower = CLIPVisionTower(ours_cfg)
        # Structural check against init shapes.
        shapes = jax.eval_shape(
            lambda k: tower.init(k, jnp.zeros((1, 32, 32, 3))), jax.random.key(0)
        )
        problems = verify_tree_matches(params, shapes)
        assert not problems, problems[:10]

        got = np.asarray(tower.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got, want, atol=2e-4)


class TestUNetConverterStructure:
    def test_converted_tree_matches_init(self):
        """Generate a torch-layout state dict from our init tree via the
        inverse name map, convert it, and require an exact structural match.
        Catches missing/mis-named conversions and wrong transposes."""
        from evoworld_tpu.models.unet import UNetSpatioTemporal, UNetConfig
        from evoworld_tpu.models.weights import convert_unet_state_dict
        from tests.torch_name_map import unet_flax_to_torch

        cfg = UNetConfig(block_out_channels=(32, 64, 128, 128), num_attention_heads=(2, 4, 8, 8))
        model = UNetSpatioTemporal(cfg)
        shapes = jax.eval_shape(
            lambda k: model.init(
                k, jnp.zeros((1, 2, 8, 16, 18)), jnp.asarray(1.0),
                jnp.zeros((1, 1, 1024)), jnp.zeros((1, 3)),
            ),
            jax.random.key(0),
        )
        src = unet_flax_to_torch(shapes["params"])
        params = convert_unet_state_dict(src, target_in_channels=18)
        problems = verify_tree_matches(params["params"], shapes["params"])
        assert not problems, problems[:20]

    def test_vae_converted_tree_matches_init(self):
        from evoworld_tpu.models.vae import AutoencoderKLTemporal, VAEConfig
        from evoworld_tpu.models.weights import convert_vae_state_dict
        from tests.torch_name_map import vae_flax_to_torch

        cfg = VAEConfig(block_out_channels=(32, 64, 128, 128))
        model = AutoencoderKLTemporal(cfg)
        shapes = jax.eval_shape(
            lambda k: model.init(k, jnp.zeros((1, 64, 64, 3)), 1), jax.random.key(0)
        )
        src = vae_flax_to_torch(shapes["params"])
        params = convert_vae_state_dict(src)
        problems = verify_tree_matches(params["params"], shapes["params"])
        assert not problems, problems[:20]


class TestConvSurgery:
    def test_zero_pad_new_channels(self):
        k = np.random.default_rng(0).normal(size=(3, 3, 8, 16)).astype(np.float32)
        out = expand_conv_in_kernel(k, 18)
        assert out.shape == (3, 3, 18, 16)
        np.testing.assert_array_equal(out[:, :, :8], k)
        np.testing.assert_array_equal(out[:, :, 8:], 0.0)


class TestComputeDtypeCast:
    def test_norm_and_layerscale_leaves_stay_fp32(self):
        """runtime.cast_compute_leaves keeps fp32-declared leaves (norm
        affines, LayerScale, pose seed) in fp32 while casting matmul/conv
        weights to the compute dtype (round-2 advisor finding)."""
        import jax.numpy as jnp

        from evoworld_tpu.runtime import cast_compute_leaves

        tree = {
            "params": {
                "blocks_0": {
                    "frame": {
                        "norm1": {"scale": np.ones(4, np.float32)},
                        "qkv": {"kernel": np.ones((4, 12), np.float32)},
                        "ls1": np.ones(4, np.float32),
                    },
                },
                "camera_head": {"empty_pose_tokens": np.zeros((1, 1, 9), np.float32)},
                "patch_embed": {"kernel": np.ones((14, 14, 3, 4), np.float32)},
            }
        }
        out = cast_compute_leaves(tree, jnp.bfloat16)
        p = out["params"]
        assert p["blocks_0"]["frame"]["norm1"]["scale"].dtype == np.float32
        assert p["blocks_0"]["frame"]["ls1"].dtype == np.float32
        assert p["camera_head"]["empty_pose_tokens"].dtype == np.float32
        assert p["blocks_0"]["frame"]["qkv"]["kernel"].dtype == jnp.bfloat16
        assert p["patch_embed"]["kernel"].dtype == jnp.bfloat16
