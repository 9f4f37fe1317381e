"""Cross-framework numerical parity of the SVD UNet blocks.

Breaks the round-1 circularity: the torch side (tests/torch_svd_blocks.py)
restates the published diffusers 0.31 semantics independently; weights flow
through the REAL converters (models/weights.py), so a drift in AlphaBlender /
GroupNorm placement / GEGLU / attention scaling fails here.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from evoworld_tpu.models.layers import (
    SpatioTemporalResBlock,
    TransformerSpatioTemporalModel,
)
from evoworld_tpu.models.weights import _convert_resnet, _convert_transformer

B, F_, H, W = 2, 3, 4, 6
CH = 64
TEMB = 32
HEADS, HEAD_DIM = 2, 32
CROSS = 48


def _torch_state(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _seed_torch(module, seed=0):
    rng = np.random.default_rng(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.from_numpy(
                rng.normal(scale=0.08, size=tuple(p.shape)).astype(np.float32)))


class TestSpatioTemporalResBlockParity:
    @pytest.mark.parametrize("indicator", [0.0, 1.0])
    def test_matches_torch(self, indicator):
        from tests.torch_svd_blocks import SpatioTemporalResBlock as TorchBlock

        tb = TorchBlock(CH, CH, TEMB)
        _seed_torch(tb)
        rng = np.random.default_rng(1)
        x = rng.normal(size=(B * F_, H, W, CH)).astype(np.float32)
        temb = rng.normal(size=(B * F_, TEMB)).astype(np.float32)
        ind = np.full((B, F_), indicator, np.float32)

        ty = tb(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(temb),
            torch.from_numpy(ind),
        ).detach().numpy().transpose(0, 2, 3, 1)

        out: dict = {}
        src = {k: np.asarray(v) for k, v in _torch_state(tb).items()}
        # The converter consumes dotted-prefix dicts: emulate parent prefix.
        src = {f"block.{k}": v for k, v in src.items()}
        _convert_resnet(src, "block", out, "block")
        params = {"params": jax.tree.map(jnp.asarray, out["block"])}

        model = SpatioTemporalResBlock(CH)
        jy = model.apply(
            params, jnp.asarray(x), jnp.asarray(temb), F_,
            image_only_indicator=jnp.asarray(ind),
        )
        np.testing.assert_allclose(np.asarray(jy), ty, rtol=5e-4, atol=5e-5)


class TestTransformerSpatioTemporalParity:
    @pytest.mark.parametrize("indicator", [0.0, 1.0])
    def test_matches_torch(self, indicator):
        from tests.torch_svd_blocks import TransformerSpatioTemporalModel as TorchModel

        tm = TorchModel(HEADS, HEAD_DIM, CH, CROSS)
        _seed_torch(tm, seed=2)
        rng = np.random.default_rng(3)
        x = rng.normal(size=(B * F_, H, W, CH)).astype(np.float32)
        ctx = rng.normal(size=(B * F_, 1, CROSS)).astype(np.float32)
        ind = np.full((B, F_), indicator, np.float32)

        ty = tm(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(ctx),
            torch.from_numpy(ind),
        ).detach().numpy().transpose(0, 2, 3, 1)

        out: dict = {}
        src = {f"m.{k}": np.asarray(v) for k, v in _torch_state(tm).items()}
        _convert_transformer(src, "m", out, "m")
        params = {"params": jax.tree.map(jnp.asarray, out["m"])}

        model = TransformerSpatioTemporalModel(HEADS, HEAD_DIM, cross_dim=CROSS)
        jy = model.apply(
            params, jnp.asarray(x), jnp.asarray(ctx), F_,
            image_only_indicator=jnp.asarray(ind),
        )
        np.testing.assert_allclose(np.asarray(jy), ty, rtol=1e-3, atol=2e-4)


class TestVAEAttentionParity:
    def test_matches_torch(self):
        """VAE mid-block attention semantics (GroupNorm placement, 1/sqrt(d)
        scale, head split order, residual) vs the independent torch twin."""
        from evoworld_tpu.models.vae import VAEAttention
        from tests.torch_svd_blocks import VAEMidAttention

        ch, head_dim = 64, 32
        tmod = VAEMidAttention(ch, head_dim=head_dim)
        _seed_torch(tmod, seed=7)
        sd = _torch_state(tmod)

        params = {"params": {
            "group_norm": {"norm": {"scale": sd["group_norm.weight"],
                                    "bias": sd["group_norm.bias"]}},
            "to_q": {"kernel": sd["to_q.weight"].T, "bias": sd["to_q.bias"]},
            "to_k": {"kernel": sd["to_k.weight"].T, "bias": sd["to_k.bias"]},
            "to_v": {"kernel": sd["to_v.weight"].T, "bias": sd["to_v.bias"]},
            "to_out": {"kernel": sd["to_out.0.weight"].T, "bias": sd["to_out.0.bias"]},
        }}
        rng = np.random.default_rng(3)
        x = rng.normal(size=(2, 4, 6, ch)).astype(np.float32)

        ours = VAEAttention(ch, head_dim=head_dim).apply(
            jax.tree.map(jnp.asarray, params), jnp.asarray(x)
        )
        with torch.no_grad():
            want = tmod(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), want, atol=2e-5)
