"""Skyseg U^2-Net: ONNX reader round-trip + non-circular torch-twin parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestOnnxReader:
    def test_round_trip(self, tmp_path):
        from evoworld_tpu.memory.onnx_io import (
            read_onnx_initializers,
            write_onnx_initializers,
        )

        rng = np.random.default_rng(0)
        tensors = {
            "stage1.rebnconvin.conv_s1.weight": rng.normal(size=(4, 3, 3, 3)).astype(np.float32),
            "a.scalarish": rng.normal(size=(5,)).astype(np.float32),
            "empty.dims": np.float32(2.5).reshape(()),
        }
        path = str(tmp_path / "t.onnx")
        write_onnx_initializers(path, tensors)
        got = read_onnx_initializers(path)
        assert set(got) == set(tensors)
        for k in tensors:
            np.testing.assert_array_equal(got[k], tensors[k])
            assert got[k].shape == tensors[k].shape


def _tiny_torch_u2net():
    """Full U2NET twin (all stages/heads); tests run it at small spatial
    size to keep CPU cost down — the parameter set is the real one."""
    torch = pytest.importorskip("torch")
    from tests.torch_u2net import U2NET

    torch.manual_seed(0)
    model = U2NET(in_ch=3, out_ch=1).eval()
    # Randomize BN running stats so eval-mode BN is actually exercised.
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.4)
    return model


class TestU2NetParity:
    def test_matches_torch_twin(self):
        """Our Flax U2Net through the ONNX-name converter must reproduce the
        torch twin's fused sigmoid output (incl. ceil-mode pooling on odd
        sizes and eval-mode BN)."""
        torch = pytest.importorskip("torch")
        from evoworld_tpu.memory.skyseg import convert_u2net_onnx_initializers
        from evoworld_tpu.memory.u2net import U2Net

        model = _tiny_torch_u2net()
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 3, 96, 96)).astype(np.float32)
        with torch.no_grad():
            want = model(torch.tensor(x)).numpy()  # (1, 1, 96, 96)

        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        params, report = convert_u2net_onnx_initializers(sd)
        assert report == [], report[:8]

        ours = U2Net()
        xj = jnp.asarray(x.transpose(0, 2, 3, 1))
        with jax.default_matmul_precision("highest"):
            got = np.asarray(ours.apply(params, xj))  # (1, 96, 96, 1)
        np.testing.assert_allclose(
            got[..., 0], want[:, 0], rtol=2e-3, atol=2e-4
        )

    def test_processor_end_to_end(self, tmp_path):
        """SkySegmentation loads a real-wire-format onnx file and produces the
        reference's post-processed mask (min-max -> 255 -> <1 threshold)."""
        torch = pytest.importorskip("torch")
        from evoworld_tpu.memory.onnx_io import write_onnx_initializers
        from evoworld_tpu.memory.skyseg import SkySegmentation

        model = _tiny_torch_u2net()
        sd = {k: v.numpy() for k, v in model.state_dict().items()
              if not k.endswith("num_batches_tracked")}
        path = str(tmp_path / "skyseg.onnx")
        write_onnx_initializers(path, sd)

        proc = SkySegmentation(path)
        assert proc.params is not None
        img = jnp.asarray(np.random.default_rng(2).uniform(size=(40, 60, 3)),
                          jnp.float32)
        mask = np.asarray(proc.sky_mask(img))
        assert mask.shape == (40, 60)
        assert set(np.unique(mask)) <= {0.0, 255.0}

        conf = jnp.ones((2, 40, 60))
        out = proc.apply_to_conf(conf, jnp.stack([img, img]))
        assert out.shape == (2, 40, 60)
        assert np.isfinite(np.asarray(out)).all()

    def test_heuristic_fallback(self):
        from evoworld_tpu.memory.skyseg import SkySegmentation

        proc = SkySegmentation(None)
        img = jnp.zeros((20, 30, 3))
        mask = np.asarray(proc.sky_mask(img))
        assert mask.shape == (20, 30)
