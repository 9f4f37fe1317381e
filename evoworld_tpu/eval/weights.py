"""Torch -> Flax weight converters for the metric feature networks.

Sources (reference consumption sites):
  - LPIPS-Alex: the `lpips` pip package module state dict
    (/root/reference/evoworld/metrics/other_metrics/calculate_lpips.py:12) —
    torchvision AlexNet features inside `net.slice{1..5}` + linear
    calibration heads `lin{0..4}.model.1`.
  - Inception-v4: timm `inception_v4` state dict
    (calculate_latent_mse.py:14: create_model('inception_v4')).
  - I3D: the videogpt-style InceptionI3d state dict
    (/root/reference/evoworld/metrics/fvd/videogpt/pytorch_i3d.py).

Each converter returns the variables dict ({"params": ..., "batch_stats":
...} where the net has frozen batch norms) plus a report of unmapped keys.
Round-trip tested against synthetic torch-named state dicts
(tests/test_eval_weights.py).
"""

from __future__ import annotations

from typing import Mapping, Tuple

import numpy as np

from evoworld_tpu.models.weights import _set, _t_conv

# One layout-transform helper for the whole repo (models/weights._t_conv
# handles both OIHW->HWIO and OITHW->THWIO).
_t_conv2d = _t_conv
_t_conv3d = _t_conv


class _Conv:
    """Collects params + batch_stats trees with a used-key report."""

    def __init__(self, src: Mapping[str, np.ndarray]):
        self.src = dict(src)
        self.used: set = set()
        self.params: dict = {}
        self.stats: dict = {}

    def take(self, name):
        if name in self.src:
            self.used.add(name)
            return np.asarray(self.src[name])
        return None

    def put(self, src_name, dst, tf=None, collection="params", report=None):
        v = self.take(src_name)
        if v is None:
            if report is not None:
                report.append(f"missing {src_name}")
            return False
        tree = self.params if collection == "params" else self.stats
        _set(tree, dst, tf(v) if tf else v)
        return True

    def conv_bn(self, src_prefix, dst_prefix, report, conv3d=False,
                conv_name="conv", bn_name="bn"):
        tf = _t_conv3d if conv3d else _t_conv2d
        self.put(f"{src_prefix}.{conv_name}.weight", f"{dst_prefix}/{conv_name}/kernel",
                 tf, report=report)
        self.put(f"{src_prefix}.{conv_name}.bias", f"{dst_prefix}/{conv_name}/bias")
        self.put(f"{src_prefix}.{bn_name}.weight", f"{dst_prefix}/{bn_name}/scale", report=report)
        self.put(f"{src_prefix}.{bn_name}.bias", f"{dst_prefix}/{bn_name}/bias", report=report)
        self.put(f"{src_prefix}.{bn_name}.running_mean", f"{dst_prefix}/{bn_name}/mean",
                 collection="batch_stats", report=report)
        self.put(f"{src_prefix}.{bn_name}.running_var", f"{dst_prefix}/{bn_name}/var",
                 collection="batch_stats", report=report)

    def finish(self, report) -> Tuple[dict, list]:
        leftover = sorted(
            k for k in set(self.src) - self.used
            if not k.endswith("num_batches_tracked")
        )
        report.extend(f"unmapped source key {k}" for k in leftover)
        out = {"params": self.params}
        if self.stats:
            out["batch_stats"] = self.stats
        return out, report


# --------------------------------------------------------------------------
# LPIPS-Alex
# --------------------------------------------------------------------------

# torchvision AlexNet features module index -> our conv index.
_ALEX_IDX = {0: 0, 3: 1, 6: 2, 8: 3, 10: 4}


def convert_lpips_state_dict(src: Mapping[str, np.ndarray]) -> dict:
    params, report = convert_lpips_state_dict_with_report(src)
    return params


def convert_lpips_state_dict_with_report(src) -> Tuple[dict, list]:
    c = _Conv(src)
    report: list = []
    for key in list(src):
        if key.startswith("net.slice") and key.endswith((".weight", ".bias")):
            idx = int(key.split(".")[2])
            kind = key.rsplit(".", 1)[1]
            i = _ALEX_IDX.get(idx)
            if i is None:
                report.append(f"unexpected alexnet index in {key}")
                continue
            tf = _t_conv2d if kind == "weight" else None
            c.put(key, f"net/conv{i}/{'kernel' if kind == 'weight' else 'bias'}", tf)
    for i in range(5):
        c.put(f"lin{i}.model.1.weight", f"lin{i}/kernel", _t_conv2d, report=report)
    for i in range(5):
        if f"conv{i}" not in c.params.get("net", {}):
            report.append(f"missing alexnet conv{i}")
    return c.finish(report)


# --------------------------------------------------------------------------
# Inception-v4 (timm)
# --------------------------------------------------------------------------

# (timm features index + submodule path) -> our module path.
_I4_STEM = [
    ("0", "stem0"), ("1", "stem1"), ("2", "stem2"),
    ("3.conv", "stem3"),
    ("4.branch0.0", "stem4a"), ("4.branch0.1", "stem4b"),
    ("4.branch1.0", "stem5a"), ("4.branch1.1", "stem5b"),
    ("4.branch1.2", "stem5c"), ("4.branch1.3", "stem5d"),
    ("5.conv", "stem6"),
]
_I4_A = [("branch0", "b0"), ("branch1.0", "b1a"), ("branch1.1", "b1b"),
         ("branch2.0", "b2a"), ("branch2.1", "b2b"), ("branch2.2", "b2c"),
         ("branch3.1", "b3b")]
_I4_RA = [("branch0", "b0"), ("branch1.0", "b1a"), ("branch1.1", "b1b"),
          ("branch1.2", "b1c")]
_I4_B = [("branch0", "b0"), ("branch1.0", "b1a"), ("branch1.1", "b1b"),
         ("branch1.2", "b1c"), ("branch2.0", "b2a"), ("branch2.1", "b2b"),
         ("branch2.2", "b2c"), ("branch2.3", "b2d"), ("branch2.4", "b2e"),
         ("branch3.1", "b3b")]
_I4_RB = [("branch0.0", "b0a"), ("branch0.1", "b0b"), ("branch1.0", "b1a"),
          ("branch1.1", "b1b"), ("branch1.2", "b1c"), ("branch1.3", "b1d")]
_I4_C = [("branch0", "b0"), ("branch1_0", "b1a"), ("branch1_1a", "b1b1"),
         ("branch1_1b", "b1b2"), ("branch2_0", "b2a"), ("branch2_1", "b2b"),
         ("branch2_2", "b2c"), ("branch2_3a", "b2d1"), ("branch2_3b", "b2d2"),
         ("branch3.1", "b3b")]


def convert_inception_v4_state_dict(src: Mapping[str, np.ndarray]) -> dict:
    params, report = convert_inception_v4_state_dict_with_report(src)
    return params


def convert_inception_v4_state_dict_with_report(src) -> Tuple[dict, list]:
    c = _Conv(src)
    report: list = []

    def block(feat_idx: int, ours: str, table):
        for sub, name in table:
            c.conv_bn(f"features.{feat_idx}.{sub}", f"{ours}/{name}", report)

    for sub, name in _I4_STEM:
        c.conv_bn(f"features.{sub}", name, report)
    for i in range(4):
        block(6 + i, f"mixed_a{i}", _I4_A)
    block(10, "reduction_a", _I4_RA)
    for i in range(7):
        block(11 + i, f"mixed_b{i}", _I4_B)
    block(18, "reduction_b", _I4_RB)
    for i in range(3):
        block(19 + i, f"mixed_c{i}", _I4_C)
    # Classifier head intentionally dropped (features-only metric net,
    # reference uses num_classes=0 — calculate_latent_mse.py:14).
    c.take("last_linear.weight")
    c.take("last_linear.bias")
    return c.finish(report)


# --------------------------------------------------------------------------
# I3D (videogpt pytorch_i3d naming)
# --------------------------------------------------------------------------

_I3D_UNITS = ["Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3"]
_I3D_MIXED = ["Mixed_3b", "Mixed_3c", "Mixed_4b", "Mixed_4c", "Mixed_4d",
              "Mixed_4e", "Mixed_4f", "Mixed_5b", "Mixed_5c"]
_I3D_BRANCHES = ["b0", "b1a", "b1b", "b2a", "b2b", "b3b"]


def normalize_i3d_keys(src: Mapping[str, np.ndarray]) -> dict:
    """Normalize I3D state-dict keys onto the videogpt/piergiaj naming.

    The reference's production FVD artifact is a TorchScript archive
    (`i3d_torchscript.pt`, loaded via torch.jit.load —
    /root/reference/evoworld/metrics/fvd/styleganv/fvd.py:9-18). State dicts
    extracted from scripted/wrapped modules carry container prefixes
    (DataParallel's `module.`, scripted wrappers' `model.`/`_model.`/`i3d.`)
    and sometimes lowercase endpoint names; strip/normalize both so the
    converter map below applies.
    """
    # Canonical casing for endpoint names, keyed by lowercase. The converter
    # map expects videogpt casing: CamelCase units/Mixed, lowercase logits.
    canon = {n.lower(): n for n in _I3D_UNITS + _I3D_MIXED}
    canon["logits"] = "logits"
    out = {}
    for k, v in src.items():
        changed = True
        while changed:
            changed = False
            for pref in ("module.", "model.", "_model.", "i3d.", "net."):
                if k.startswith(pref):
                    k = k[len(pref):]
                    changed = True
        parts = k.split(".")
        parts[0] = canon.get(parts[0].lower(), parts[0])
        out[".".join(parts)] = v
    return out


def convert_i3d_state_dict(src: Mapping[str, np.ndarray]) -> dict:
    params, report = convert_i3d_state_dict_with_report(src)
    return params


def convert_i3d_state_dict_with_report(src) -> Tuple[dict, list]:
    c = _Conv(normalize_i3d_keys(src))
    report: list = []
    for unit in _I3D_UNITS:
        c.conv_bn(unit, unit, report, conv3d=True, conv_name="conv3d")
    for mixed in _I3D_MIXED:
        for b in _I3D_BRANCHES:
            c.conv_bn(f"{mixed}.{b}", f"{mixed}/{b}", report,
                      conv3d=True, conv_name="conv3d")
    c.put("logits.conv3d.weight", "logits/conv3d/kernel", _t_conv3d, report=report)
    c.put("logits.conv3d.bias", "logits/conv3d/bias", report=report)
    return c.finish(report)
