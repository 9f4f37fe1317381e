"""Non-circular numerical parity for the FVD I3D feature net.

The reference vendors a complete first-party torch InceptionI3d
(/root/reference/evoworld/metrics/fvd/videogpt/pytorch_i3d.py). Importing it
as the golden (the same pattern tests/test_geometry.py uses for geometry
golden values) breaks the converter-test circularity: a random-init torch
model's state dict converts through `convert_i3d_state_dict` and must
reproduce the torch logits through our Flax InceptionI3D — TF-'SAME' dynamic
padding, BN eps, and the avg_pool([2,7,7]) + logits + time-mean head all have
to line up for this to pass.
"""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evoworld_tpu.eval.feature_nets import InceptionI3D
from evoworld_tpu.eval.weights import convert_i3d_state_dict_with_report

_REF = "/root/reference/evoworld/metrics/fvd/videogpt/pytorch_i3d.py"


def _load_reference_i3d():
    spec = importlib.util.spec_from_file_location("ref_pytorch_i3d", _REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestI3DParity:
    @pytest.mark.parametrize("frames", [9, 25])
    def test_logits_match_reference_torch(self, frames):
        torch = pytest.importorskip("torch")
        ref = _load_reference_i3d()

        torch.manual_seed(0)
        model = ref.InceptionI3d(num_classes=400, in_channels=3).eval()

        rng = np.random.default_rng(0)
        # (N, 3, T, 224, 224) in [-1, 1]; 224 is required (the torch head's
        # 7x7 avg-pool window must cover Mixed_5c's spatial map exactly).
        x = rng.uniform(-1, 1, size=(1, 3, frames, 224, 224)).astype(np.float32)
        with torch.no_grad():
            want = model(torch.tensor(x)).numpy()
        assert want.shape == (1, 400)

        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        params, report = convert_i3d_state_dict_with_report(sd)
        assert report == [], report[:8]

        ours = InceptionI3D()
        xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))  # channels-last
        with jax.default_matmul_precision("highest"):
            got = np.asarray(ours.apply(params, xj))

        np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)

    def test_torchscript_archive_round_trip(self, tmp_path):
        """The reference's production FVD weight is a TorchScript archive
        (`i3d_torchscript.pt`, fvd/styleganv/fvd.py:9-18) that
        torch.load(weights_only=True) rejects. Script the vendored reference
        net to a jit archive, load it through the CLI's weight loader (jit
        fallback path), and check the conversion is identical to converting
        the plain state dict — incl. a DataParallel-style `module.` prefix."""
        torch = pytest.importorskip("torch")
        ref = _load_reference_i3d()

        torch.manual_seed(0)
        model = ref.InceptionI3d(num_classes=400, in_channels=3).eval()
        path = tmp_path / "i3d_torchscript.pt"
        # trace, not script: the vendored net's same-padding helper calls
        # np.ceil, which TorchScript cannot compile. Tracing preserves the
        # module tree, so state-dict names survive like the real artifact's.
        example = torch.zeros(1, 3, 9, 224, 224)
        with torch.no_grad():
            torch.jit.trace(model, example).save(str(path))

        from evoworld_tpu.cli.calculate_metrics import _load_metric_weights

        loaded = _load_metric_weights(str(tmp_path))
        assert "i3d" in loaded, "jit fallback did not load the archive"

        params_jit, report_jit = convert_i3d_state_dict_with_report(loaded["i3d"])
        assert report_jit == [], report_jit[:8]

        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        # DataParallel wrapping (fvd.py:17) prefixes every key with module. —
        # normalization must strip it.
        sd_dp = {f"module.{k}": v for k, v in sd.items()}
        params_direct, _ = convert_i3d_state_dict_with_report(sd)
        params_dp, report_dp = convert_i3d_state_dict_with_report(sd_dp)
        assert report_dp == [], report_dp[:8]

        flat_jit = jax.tree_util.tree_leaves_with_path(params_jit)
        flat_direct = dict(jax.tree_util.tree_leaves_with_path(params_direct))
        flat_dp = dict(jax.tree_util.tree_leaves_with_path(params_dp))
        assert len(flat_jit) == len(flat_direct) == len(flat_dp)
        for path_k, leaf in flat_jit:
            np.testing.assert_array_equal(leaf, flat_direct[path_k])
            np.testing.assert_array_equal(leaf, flat_dp[path_k])

    @pytest.mark.parametrize("hw", [(576, 1024), (224, 224), (300, 200)])
    def test_preprocess_matches_reference(self, hw):
        """Shorter-side scale + center crop + [-1,1] rescale must match the
        reference's preprocess_single (fvd/styleganv/fvd.py:37-59)."""
        torch = pytest.importorskip("torch")
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ref_styleganv_fvd",
            "/root/reference/evoworld/metrics/fvd/styleganv/fvd.py",
        )
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)

        from evoworld_tpu.eval.feature_nets import i3d_preprocess

        h, w = hw
        rng = np.random.default_rng(1)
        vid = rng.uniform(size=(2, 3, h, w, 3)).astype(np.float32)  # (N,T,H,W,C)
        with torch.no_grad():
            want = np.stack([
                ref.preprocess_single(torch.tensor(v.transpose(3, 0, 1, 2))).numpy()
                for v in vid
            ])  # (N, C, T, 224, 224)
        got = np.asarray(i3d_preprocess(vid)).transpose(0, 4, 1, 2, 3)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)
