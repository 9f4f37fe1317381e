"""Full-model cross-framework parity of the temporal VAE.

Completes the conversion-parity story for the frozen models: the torch twin
(tests/torch_svd_vae.py) independently restates the published
AutoencoderKLTemporalDecoder semantics — asymmetric encoder downsampling,
quant_conv, temb-free switched-blend decoder blocks, depth-3 temporal
output conv — and the weights flow through the REAL
`convert_vae_state_dict`, validating both the Flax wiring and the full
converter against a genuinely torch-produced state dict.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from evoworld_tpu.models.vae import AutoencoderKLTemporal, VAEConfig
from evoworld_tpu.models.weights import convert_vae_state_dict

CHANNELS = (32, 32, 64, 64)
F_, H, W = 3, 16, 24


def test_full_vae_matches_torch_twin():
    from tests.torch_svd_vae import AutoencoderKLTemporalDecoder

    tm = AutoencoderKLTemporalDecoder(block_out_channels=CHANNELS)
    rng = np.random.default_rng(0)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.from_numpy(
                rng.normal(scale=0.08, size=tuple(p.shape)).astype(np.float32)))

    images = rng.normal(size=(F_, 3, H, W)).astype(np.float32)

    with torch.no_grad():
        t_moments = tm.encode_moments(torch.from_numpy(images)).numpy()
        t_out = tm(torch.from_numpy(images), F_).numpy()

    src = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_vae_state_dict(src))

    model = AutoencoderKLTemporal(VAEConfig(block_out_channels=CHANNELS))
    x = jnp.asarray(images.transpose(0, 2, 3, 1))
    with jax.default_matmul_precision("highest"):
        j_moments = model.apply(params, x, method=AutoencoderKLTemporal.encode_moments)
        j_out = model.apply(params, x, F_)

    np.testing.assert_allclose(
        np.asarray(j_moments), t_moments.transpose(0, 2, 3, 1), rtol=2e-3, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(j_out), t_out.transpose(0, 2, 3, 1), rtol=2e-3, atol=5e-4)
