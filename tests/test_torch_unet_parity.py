"""Full-model cross-framework parity of the spatio-temporal UNet.

The block-level twins (tests/test_torch_block_parity.py) cannot catch SHELL
wiring drift — skip-connection order, per-frame embedding broadcast,
down/up interleave, conv_norm_out placement. This test runs the complete
torch twin shell (tests/torch_svd_unet.py, diffusers naming) against
`models/unet.py`, with the weights flowing through the REAL
`convert_unet_state_dict`, so it simultaneously validates the full
converter against a genuinely torch-produced state dict (round-1 verdict
item #5 at model scope).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from evoworld_tpu.models.unet import UNetConfig, UNetSpatioTemporal
from evoworld_tpu.models.weights import convert_unet_state_dict

B, F_, H, W = 1, 3, 16, 24
CROSS = 48
CHANNELS = (32, 64, 64, 64)
HEADS = (1, 2, 2, 2)


def test_full_unet_matches_torch_twin():
    from tests.torch_svd_unet import UNetSpatioTemporalConditionModel

    tm = UNetSpatioTemporalConditionModel(
        block_out_channels=CHANNELS, heads=HEADS, cross_dim=CROSS
    )
    rng = np.random.default_rng(0)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.from_numpy(
                rng.normal(scale=0.08, size=tuple(p.shape)).astype(np.float32)))

    sample = rng.normal(size=(B, F_, 18, H, W)).astype(np.float32)
    context = rng.normal(size=(B, 1, CROSS)).astype(np.float32)
    time_ids = np.asarray([[6.0, 127.0, 0.02]], np.float32)
    timestep = 1.7

    with torch.no_grad():
        ty = tm(
            torch.from_numpy(sample), timestep,
            torch.from_numpy(context), torch.from_numpy(time_ids),
        ).numpy().transpose(0, 1, 3, 4, 2)  # -> (B, F, H, W, C)

    src = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_unet_state_dict(src))

    model = UNetSpatioTemporal(UNetConfig(
        block_out_channels=CHANNELS, num_attention_heads=HEADS,
        cross_attention_dim=CROSS,
    ))
    with jax.default_matmul_precision("highest"):
        jy = model.apply(
            params,
            jnp.asarray(sample.transpose(0, 1, 3, 4, 2)),
            jnp.asarray(timestep, jnp.float32),
            jnp.asarray(context),
            jnp.asarray(time_ids),
        )
    assert jy.shape == ty.shape
    np.testing.assert_allclose(np.asarray(jy), ty, rtol=2e-3, atol=5e-4)
