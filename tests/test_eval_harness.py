"""Metric harness tests: converter round-trips, torch LPIPS parity, and
reference-format output structure (calculate_all_metrics.py:216-227)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evoworld_tpu.eval.feature_nets import InceptionI3D, LPIPSAlex
from evoworld_tpu.eval.harness import FeatureNets, calculate_all_metrics
from evoworld_tpu.eval.inception_v4 import InceptionV4Features
from evoworld_tpu.eval import weights as ew


def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flat(v, p))
        else:
            out[p] = v  # ndarray or ShapeDtypeStruct — both carry .shape
    return out


def _synthesize_from_tables(variables, table_pairs, conv3d=False, rng=None):
    """Invert the converter's mapping tables into a torch-named state dict.

    For every (torch_prefix, ours) table entry, read our init leaf shapes and
    emit torch-layout tensors under the upstream names — tests that the
    tables cover the whole tree and that the layout transforms round-trip.
    """
    rng = rng or np.random.default_rng(0)
    params = _flat(variables["params"])
    stats = _flat(variables.get("batch_stats", {}))
    conv_key = "conv3d" if conv3d else "conv"
    sd = {}
    for torch_prefix, ours in table_pairs:
        kernel = params[f"{ours}/{conv_key}/kernel"]
        # Small magnitudes: the synthetic nets are ~22 blocks deep and random
        # unit-scale weights overflow fp32 activations.
        if conv3d:
            w = rng.normal(scale=0.05, size=(kernel.shape[4], kernel.shape[3], *kernel.shape[:3]))
        else:
            w = rng.normal(scale=0.05, size=(kernel.shape[3], kernel.shape[2], *kernel.shape[:2]))
        sd[f"{torch_prefix}.{conv_key}.weight"] = w
        if f"{ours}/bn/scale" in params:
            c = params[f"{ours}/bn/scale"].shape[0]
            sd[f"{torch_prefix}.bn.weight"] = rng.uniform(0.5, 1.5, size=(c,))
            sd[f"{torch_prefix}.bn.bias"] = rng.normal(scale=0.1, size=(c,))
            sd[f"{torch_prefix}.bn.running_mean"] = rng.normal(scale=0.1, size=(c,))
            sd[f"{torch_prefix}.bn.running_var"] = rng.uniform(0.5, 2.0, size=(c,))
        assert f"{ours}/bn/scale" in params or f"{ours}/{conv_key}/bias" in params
        if f"{ours}/{conv_key}/bias" in params:
            sd[f"{torch_prefix}.{conv_key}.bias"] = rng.normal(
                scale=0.1, size=params[f"{ours}/{conv_key}/bias"].shape
            )
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def _assert_tree_match(converted, variables):
    got, want = _flat(converted["params"]), _flat(variables["params"])
    assert set(got) == set(want), (sorted(set(want) - set(got))[:8],
                                   sorted(set(got) - set(want))[:8])
    for k in want:
        assert got[k].shape == want[k].shape, (k, got[k].shape, want[k].shape)
    if "batch_stats" in variables:
        gs, ws = _flat(converted["batch_stats"]), _flat(variables["batch_stats"])
        assert set(gs) == set(ws)


class TestInceptionV4Converter:
    def test_roundtrip(self):
        model = InceptionV4Features()
        variables = jax.eval_shape(
            lambda k: model.init(k, jnp.zeros((1, 299, 299, 3))), jax.random.key(0)
        )
        pairs = [(f"features.{sub}", ours) for sub, ours in ew._I4_STEM]
        for i in range(4):
            pairs += [(f"features.{6 + i}.{s}", f"mixed_a{i}/{n}") for s, n in ew._I4_A]
        pairs += [(f"features.10.{s}", f"reduction_a/{n}") for s, n in ew._I4_RA]
        for i in range(7):
            pairs += [(f"features.{11 + i}.{s}", f"mixed_b{i}/{n}") for s, n in ew._I4_B]
        pairs += [(f"features.18.{s}", f"reduction_b/{n}") for s, n in ew._I4_RB]
        for i in range(3):
            pairs += [(f"features.{19 + i}.{s}", f"mixed_c{i}/{n}") for s, n in ew._I4_C]
        sd = _synthesize_from_tables(variables, pairs)
        sd["last_linear.weight"] = np.zeros((1000, 1536), np.float32)
        sd["last_linear.bias"] = np.zeros((1000,), np.float32)
        converted, report = ew.convert_inception_v4_state_dict_with_report(sd)
        assert report == [], report[:8]
        _assert_tree_match(converted, variables)
        out = model.apply(jax.tree.map(jnp.asarray, converted), jnp.ones((1, 299, 299, 3)) * 0.1)
        assert out.shape == (1, 1536) and np.isfinite(np.asarray(out)).all()


class TestI3DConverter:
    def test_roundtrip(self):
        model = InceptionI3D()
        variables = jax.eval_shape(
            lambda k: model.init(k, jnp.zeros((1, 10, 64, 64, 3))), jax.random.key(0)
        )
        pairs = [(u, u) for u in ew._I3D_UNITS]
        for m in ew._I3D_MIXED:
            pairs += [(f"{m}.{b}", f"{m}/{b}") for b in ew._I3D_BRANCHES]
        rng = np.random.default_rng(1)
        sd = _synthesize_from_tables(variables, pairs, conv3d=True, rng=rng)
        logits_kernel = _flat(variables["params"])["logits/conv3d/kernel"]
        sd["logits.conv3d.weight"] = np.asarray(
            rng.normal(size=(logits_kernel.shape[4], logits_kernel.shape[3],
                             *logits_kernel.shape[:3])), np.float32)
        sd["logits.conv3d.bias"] = np.zeros((logits_kernel.shape[4],), np.float32)
        converted, report = ew.convert_i3d_state_dict_with_report(sd)
        assert report == [], report[:8]
        _assert_tree_match(converted, variables)


class TestLPIPSTorchParity:
    """Numerical parity of the whole LPIPS net vs a hand-built torch twin."""

    def test_lpips_matches_torch(self):
        torch = pytest.importorskip("torch")
        tnn = torch.nn
        rng = np.random.default_rng(0)

        cfgs = [(3, 64, 11, 4, 2), (64, 192, 5, 1, 2), (192, 384, 3, 1, 1),
                (384, 256, 3, 1, 1), (256, 256, 3, 1, 1)]
        convs = [tnn.Conv2d(i, o, k, s, p) for i, o, k, s, p in cfgs]
        lins = [tnn.Conv2d(o, 1, 1, bias=False) for _, o, _, _, _ in cfgs]
        for m in convs + lins:
            for p in m.parameters():
                p.data = torch.from_numpy(
                    rng.normal(scale=0.05, size=tuple(p.shape)).astype(np.float32))

        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

        def torch_lpips(x, y):
            x, y = (x - shift) / scale, (y - shift) / scale
            pool = tnn.MaxPool2d(3, 2)
            total = 0.0
            for i, conv in enumerate(convs):
                x = torch.relu(conv(x))
                y = torch.relu(conv(y))
                fx = x / x.norm(dim=1, keepdim=True).clamp_min(1e-10)
                fy = y / y.norm(dim=1, keepdim=True).clamp_min(1e-10)
                total = total + lins[i]((fx - fy) ** 2).mean(dim=(1, 2, 3))
                if i in (0, 1):
                    x, y = pool(x), pool(y)
            return total

        # Assemble the equivalent flax variables via the converter.
        sd = {}
        slice_idx = {0: "slice1.0", 1: "slice2.3", 2: "slice3.6", 3: "slice4.8", 4: "slice5.10"}
        for i, conv in enumerate(convs):
            sd[f"net.{slice_idx[i]}.weight"] = conv.weight.detach().numpy()
            sd[f"net.{slice_idx[i]}.bias"] = conv.bias.detach().numpy()
            sd[f"lin{i}.model.1.weight"] = lins[i].weight.detach().numpy()
        converted, report = ew.convert_lpips_state_dict_with_report(sd)
        assert report == [], report[:8]

        a = rng.uniform(-1, 1, size=(2, 64, 96, 3)).astype(np.float32)
        b = rng.uniform(-1, 1, size=(2, 64, 96, 3)).astype(np.float32)
        model = LPIPSAlex()
        ours = np.asarray(model.apply(
            jax.tree.map(jnp.asarray, converted), jnp.asarray(a), jnp.asarray(b)))
        theirs = torch_lpips(
            torch.from_numpy(a.transpose(0, 3, 1, 2)),
            torch.from_numpy(b.transpose(0, 3, 1, 2)),
        ).detach().numpy()
        np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-5)


class TestHarnessStructure:
    def test_reference_format_keys(self):
        rng = np.random.default_rng(0)
        gen = rng.uniform(size=(2, 11, 24, 40, 3)).astype(np.float32)
        gt = np.clip(gen + rng.normal(scale=0.05, size=gen.shape).astype(np.float32), 0, 1)
        result = calculate_all_metrics(gen, gt, i3d_size=64)
        assert set(result) == {
            "fvd", "ssim", "psnr", "lpips", "latent_mse", "loop_closure_latent_mse"
        }
        for key in ("ssim", "psnr", "lpips", "latent_mse"):
            r = result[key]
            assert set(r["value"]) == set(range(11)), key
            assert set(r["value_std"]) == set(range(11))
            assert np.isfinite(r["value_mean"])
        assert set(result["fvd"]["value"]) == {10, 11}
        assert result["loop_closure_latent_mse"]["value"].keys() == {0}
        # Identical inputs -> zero distances, saturated psnr.
        same = calculate_all_metrics(gen, gen, with_fvd=False)
        assert same["lpips"]["value_mean"] < 1e-8
        assert same["latent_mse"]["value_mean"] < 1e-8
        assert same["psnr"]["value_mean"] > 60
