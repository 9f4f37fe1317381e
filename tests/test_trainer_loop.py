"""Trainer-loop integration: EMA lifecycle + resume on tiny models.

Regression coverage for two bugs the unit tests missed:
  - EMA params aliasing the donated train-step state (deleted-buffer crash
    on the second step when use_ema=true),
  - EMA history lost across checkpoint resume (reference persists EMAModel
    state via its accelerate hooks, train_evoworld.py:236-269).
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evoworld_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower
from evoworld_tpu.models.unet import UNetConfig, UNetSpatioTemporal
from evoworld_tpu.models.vae import AutoencoderKLTemporal, VAEConfig
from evoworld_tpu.train.train_step import TrainConfig
from evoworld_tpu.train.trainer import TrainerConfig, train

F, H, W = 3, 64, 128


class FakeDataset:
    height, width = H, W

    def __len__(self):
        return 2

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        return types.SimpleNamespace(
            pixel_values=rng.uniform(-1, 1, (F, H, W, 3)).astype(np.float32),
            memory_values=rng.uniform(-1, 1, (F, H, W, 3)).astype(np.float32),
            cam_traj=rng.uniform(-1, 1, (F, 6)).astype(np.float32),
        )


@pytest.fixture(scope="module")
def tiny_models():
    unet = UNetSpatioTemporal(UNetConfig(block_out_channels=(32, 64, 128, 128),
                                         num_attention_heads=(2, 4, 8, 8)))
    vae = AutoencoderKLTemporal(VAEConfig(block_out_channels=(32, 64, 128, 128)))
    clip_tower = CLIPVisionTower(CLIPVisionConfig(hidden_size=64, num_layers=2,
                                                  num_heads=4, mlp_dim=128))
    key = jax.random.key(0)
    unet_params = unet.init(
        key, jnp.zeros((1, F, H // 8, W // 8, 18)), jnp.asarray(1.0),
        jnp.zeros((1, 1, 1024)), jnp.zeros((1, 3)),
    )
    frozen = {
        "vae": vae.init(key, jnp.zeros((1, H, W, 3)), 1),
        "clip": clip_tower.init(key, jnp.zeros((1, 224, 224, 3))),
    }
    return unet, vae, clip_tower, unet_params, frozen


def test_train_loop_ema_and_resume(tiny_models, tmp_path):
    unet, vae, clip_tower, unet_params, frozen = tiny_models
    config = TrainConfig(total_steps=2, warmup_steps=1)
    tcfg = TrainerConfig(
        output_dir=str(tmp_path), max_steps=2, checkpointing_steps=2,
        log_steps=1, use_ema=True, ema_decay=0.5,
    )
    state = train(unet, vae, clip_tower, unet_params, frozen, FakeDataset(),
                  config, tcfg, compute_dtype=jnp.float32)
    # Returned params are the EMA (reference swaps EMA in for export).
    assert int(state.step) == 2
    leaf = jax.tree.leaves(state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()

    # Resume: EMA history must come back from the checkpoint, training
    # continues from step 2 to 3 without re-initializing.
    config3 = TrainConfig(total_steps=3, warmup_steps=1)
    tcfg3 = TrainerConfig(
        output_dir=str(tmp_path), max_steps=3, checkpointing_steps=10,
        log_steps=1, use_ema=True, ema_decay=0.5,
    )
    state3 = train(unet, vae, clip_tower, unet_params, frozen, FakeDataset(),
                   config3, tcfg3, compute_dtype=jnp.float32)
    assert int(state3.step) == 3
