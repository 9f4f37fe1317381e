"""VGGT torch checkpoint (facebook/VGGT-1B model.pt) -> Flax conversion.

The reference consumes the upstream checkpoint directly
(/root/reference/unified_loop_consistency.py:125-127); the vggt submodule is
not vendored, so the upstream state-dict naming is reconstructed here from
the upstream facebookresearch/vggt architecture (DINOv2 ViT-L patch encoder,
alternating frame/global blocks, adaLN camera head, DPT dense heads).

`convert_vggt_state_dict` returns (params, report): `report` lists source
keys it could not place and destination leaves left unfilled. The mapping is
round-trip tested against a synthetic upstream-named state dict
(tests/test_vggt_convert.py) and numerically spot-checked against torch
modules (ConvTranspose2d/Conv2d/Linear layouts) — validate once more against
the real checkpoint when weights are available (zero-egress image).
"""

from __future__ import annotations

from typing import Mapping, Sequence, Tuple

import numpy as np

from evoworld_tpu.models.weights import _set, _t_conv, _t_linear


def _t_conv_transpose(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out).

    torch's transposed conv is the gradient of a cross-correlation, i.e. a
    *convolution* — flax's ConvTranspose is a fractionally-strided
    cross-correlation, so the spatial taps flip (verified numerically vs
    torch, tests/test_vggt_convert.py).
    """
    return np.ascontiguousarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))


def _vit_block_pairs(prefix: str) -> Sequence[Tuple[str, str, object]]:
    """Upstream DINO/VGGT Block key -> our ViTBlock leaf (qkv fused in both)."""
    return [
        (f"{prefix}.norm1.weight", "norm1/scale", None),
        (f"{prefix}.norm1.bias", "norm1/bias", None),
        (f"{prefix}.attn.qkv.weight", "qkv/kernel", _t_linear),
        (f"{prefix}.attn.qkv.bias", "qkv/bias", None),
        (f"{prefix}.attn.proj.weight", "proj/kernel", _t_linear),
        (f"{prefix}.attn.proj.bias", "proj/bias", None),
        (f"{prefix}.attn.q_norm.weight", "q_norm/scale", None),
        (f"{prefix}.attn.q_norm.bias", "q_norm/bias", None),
        (f"{prefix}.attn.k_norm.weight", "k_norm/scale", None),
        (f"{prefix}.attn.k_norm.bias", "k_norm/bias", None),
        (f"{prefix}.ls1.gamma", "ls1", None),
        (f"{prefix}.ls2.gamma", "ls2", None),
        (f"{prefix}.norm2.weight", "norm2/scale", None),
        (f"{prefix}.norm2.bias", "norm2/bias", None),
        (f"{prefix}.mlp.fc1.weight", "fc1/kernel", _t_linear),
        (f"{prefix}.mlp.fc1.bias", "fc1/bias", None),
        (f"{prefix}.mlp.fc2.weight", "fc2/kernel", _t_linear),
        (f"{prefix}.mlp.fc2.bias", "fc2/bias", None),
    ]


_OPTIONAL_BLOCK_LEAVES = ("q_norm", "k_norm", "ls1", "ls2")


class _Converter:
    def __init__(self, src: Mapping[str, np.ndarray]):
        self.src = dict(src)
        self.used: set[str] = set()
        self.out: dict = {}
        self.report: list[str] = []

    def take(self, name: str):
        if name in self.src:
            self.used.add(name)
            return np.asarray(self.src[name])
        return None

    def put(self, src_name: str, dst_name: str, tf=None, optional=False):
        v = self.take(src_name)
        if v is None:
            if not optional:
                self.report.append(f"missing {src_name}")
            return
        _set(self.out, dst_name, tf(v) if tf else v)

    def block(self, src_prefix: str) -> dict:
        """Convert one ViT block; returns the leaf dict (stacked by callers)."""
        leaf: dict = {}
        for src_name, rel, tf in _vit_block_pairs(src_prefix):
            v = self.take(src_name)
            if v is None:
                if not any(t in rel for t in _OPTIONAL_BLOCK_LEAVES):
                    self.report.append(f"missing {src_name}")
                continue
            _set(leaf, rel, tf(v) if tf else v)
        return leaf

    def stack_blocks(self, src_fmt: str, dst: str, indices: Sequence[int]) -> None:
        """Stack per-layer block weights on a leading axis (nn.scan layout)."""
        layers = [self.block(src_fmt.format(i)) for i in indices]
        if not layers or not layers[0]:
            self.report.append(f"missing all layers for {src_fmt}")
            return

        def stack(trees):
            first = trees[0]
            if isinstance(first, dict):
                return {k: stack([t[k] for t in trees]) for k in first}
            return np.stack(trees)

        _set(self.out, dst, None)
        node = self.out
        keys = dst.split("/")
        for k in keys[:-1]:
            node = node[k]
        node[keys[-1]] = stack(layers)


def _convert_camera_head(c: _Converter, ch: str, dst: str) -> None:
    """Upstream CameraHead (camera_head.py) -> our CameraHead; torch-twin
    parity-tested in tests/test_vggt_head_parity.py."""
    src = c.src
    c.put(f"{ch}.token_norm.weight", f"{dst}/token_norm/scale")
    c.put(f"{ch}.token_norm.bias", f"{dst}/token_norm/bias")
    c.put(f"{ch}.empty_pose_tokens", f"{dst}/empty_pose_tokens")
    c.put(f"{ch}.embed_pose.weight", f"{dst}/embed_pose/kernel", _t_linear)
    c.put(f"{ch}.embed_pose.bias", f"{dst}/embed_pose/bias")
    # Upstream Sequential(SiLU, Linear) — only index 1 has parameters.
    c.put(f"{ch}.poseLN_modulation.1.weight", f"{dst}/poseLN_modulation/kernel", _t_linear)
    c.put(f"{ch}.poseLN_modulation.1.bias", f"{dst}/poseLN_modulation/bias")
    n_trunk = 0
    while f"{ch}.trunk.{n_trunk}.norm1.weight" in src:
        n_trunk += 1
    c.stack_blocks(f"{ch}.trunk.{{}}", f"{dst}/trunk/block", range(n_trunk))
    c.put(f"{ch}.trunk_norm.weight", f"{dst}/trunk_norm/scale")
    c.put(f"{ch}.trunk_norm.bias", f"{dst}/trunk_norm/bias")
    c.put(f"{ch}.pose_branch.fc1.weight", f"{dst}/pose_branch_fc1/kernel", _t_linear)
    c.put(f"{ch}.pose_branch.fc1.bias", f"{dst}/pose_branch_fc1/bias")
    c.put(f"{ch}.pose_branch.fc2.weight", f"{dst}/pose_branch_fc2/kernel", _t_linear)
    c.put(f"{ch}.pose_branch.fc2.bias", f"{dst}/pose_branch_fc2/bias")


def _convert_dpt_head(c: _Converter, src_head: str, dst_head: str) -> None:
    """Upstream DPTHead (projects/resize_layers/scratch.*) -> our DPTHead."""
    for i in range(4):
        c.put(f"{src_head}.projects.{i}.weight", f"{dst_head}/project_{i}/kernel",
              lambda v: _t_linear(v[:, :, 0, 0]))
        c.put(f"{src_head}.projects.{i}.bias", f"{dst_head}/project_{i}/bias")
        c.put(f"{src_head}.scratch.layer{i + 1}_rn.weight",
              f"{dst_head}/layer_{i + 1}_rn/kernel", _t_conv)
    c.put(f"{src_head}.resize_layers.0.weight", f"{dst_head}/resize_0/kernel",
          _t_conv_transpose)
    c.put(f"{src_head}.resize_layers.0.bias", f"{dst_head}/resize_0/bias")
    c.put(f"{src_head}.resize_layers.1.weight", f"{dst_head}/resize_1/kernel",
          _t_conv_transpose)
    c.put(f"{src_head}.resize_layers.1.bias", f"{dst_head}/resize_1/bias")
    c.put(f"{src_head}.resize_layers.3.weight", f"{dst_head}/resize_3/kernel", _t_conv)
    c.put(f"{src_head}.resize_layers.3.bias", f"{dst_head}/resize_3/bias")
    for j in range(1, 5):
        rf_src = f"{src_head}.scratch.refinenet{j}"
        rf_dst = f"{dst_head}/refinenet{j}"
        for unit_src, unit_dst in (("resConfUnit1", "res1"), ("resConfUnit2", "res2")):
            for conv in ("conv1", "conv2"):
                c.put(f"{rf_src}.{unit_src}.{conv}.weight",
                      f"{rf_dst}/{unit_dst}_{conv}/kernel", _t_conv)
                c.put(f"{rf_src}.{unit_src}.{conv}.bias",
                      f"{rf_dst}/{unit_dst}_{conv}/bias")
        c.put(f"{rf_src}.out_conv.weight", f"{rf_dst}/out_conv/kernel", _t_conv)
        c.put(f"{rf_src}.out_conv.bias", f"{rf_dst}/out_conv/bias")
    c.put(f"{src_head}.scratch.output_conv1.weight", f"{dst_head}/output_conv1/kernel", _t_conv)
    c.put(f"{src_head}.scratch.output_conv1.bias", f"{dst_head}/output_conv1/bias")
    c.put(f"{src_head}.scratch.output_conv2.0.weight", f"{dst_head}/output_conv2_0/kernel", _t_conv)
    c.put(f"{src_head}.scratch.output_conv2.0.bias", f"{dst_head}/output_conv2_0/bias")
    c.put(f"{src_head}.scratch.output_conv2.2.weight", f"{dst_head}/output_conv2_2/kernel", _t_conv)
    c.put(f"{src_head}.scratch.output_conv2.2.bias", f"{dst_head}/output_conv2_2/bias")


def convert_vggt_state_dict(
    src: Mapping[str, np.ndarray],
    output_layers: Sequence[int] = (4, 11, 17, 23),
    with_point_head: bool = True,
) -> Tuple[dict, list]:
    """Upstream VGGT state dict -> our param tree + report.

    Args:
        src: torch state dict as numpy arrays.
        output_layers: the aggregator tap indices (must match the model
            config; determines how frame/global blocks stack into the
            segmented scans).
        with_point_head: convert point_head too (upstream always has it).

    Returns:
        ({"params": tree}, report) — report lists unmapped/missing keys;
        empty means a clean conversion.
    """
    c = _Converter(src)
    agg = "aggregator"

    # --- DINOv2 patch encoder ---------------------------------------------
    c.put(f"{agg}.patch_embed.patch_embed.proj.weight", f"{agg}/patch_embed/kernel", _t_conv)
    c.put(f"{agg}.patch_embed.patch_embed.proj.bias", f"{agg}/patch_embed/bias")
    # Upstream pos_embed is (1, 1+P, C): row 0 is the cls token's position
    # embedding, the rest the patch grid. cls + register tokens ride through
    # the encoder blocks (dinov2_vitl14_reg), so all three map.
    c.put(f"{agg}.patch_embed.pos_embed", f"{agg}/pos_embed",
          lambda v: v.reshape(v.shape[-2], v.shape[-1])[1:])
    c.put(f"{agg}.patch_embed.pos_embed", f"{agg}/pos_embed_cls",
          lambda v: v.reshape(v.shape[-2], v.shape[-1])[:1])
    c.put(f"{agg}.patch_embed.cls_token", f"{agg}/dino_cls_token",
          lambda v: v.reshape(-1, v.shape[-1]))
    c.put(f"{agg}.patch_embed.register_tokens", f"{agg}/dino_register_tokens",
          lambda v: v.reshape(-1, v.shape[-1]))
    # mask_token: training-only, intentionally dropped.
    c.take(f"{agg}.patch_embed.mask_token")
    c.put(f"{agg}.patch_embed.norm.weight", f"{agg}/dino_norm/scale")
    c.put(f"{agg}.patch_embed.norm.bias", f"{agg}/dino_norm/bias")
    n_dino = 0
    while f"{agg}.patch_embed.blocks.{n_dino}.norm1.weight" in src:
        n_dino += 1
    c.stack_blocks(f"{agg}.patch_embed.blocks.{{}}", f"{agg}/dino_blocks/block",
                   range(n_dino))

    # --- special tokens: leading 2-slot axis = (first frame, other frames) -
    c.put(f"{agg}.camera_token", f"{agg}/camera_token_first",
          lambda v: v.reshape(2, -1, v.shape[-1])[0])
    cam = c.take(f"{agg}.camera_token")
    if cam is not None:
        _set(c.out, f"{agg}/camera_token", cam.reshape(2, -1, cam.shape[-1])[1])
    reg = c.take(f"{agg}.register_token")
    if reg is None:
        c.report.append(f"missing {agg}.register_token")
    else:
        reg = reg.reshape(2, -1, reg.shape[-1])
        _set(c.out, f"{agg}/register_token_first", reg[0])
        _set(c.out, f"{agg}/register_token", reg[1])

    # --- alternating blocks: segmented stacks matching the tapped scans ----
    start = 0
    for seg, tap in enumerate(output_layers):
        idxs = range(start, tap + 1)
        c.stack_blocks(f"{agg}.frame_blocks.{{}}", f"{agg}/blocks_{seg}/frame", idxs)
        c.stack_blocks(f"{agg}.global_blocks.{{}}", f"{agg}/blocks_{seg}/global", idxs)
        start = tap + 1

    # --- camera head --------------------------------------------------------
    _convert_camera_head(c, "camera_head", "camera_head")

    # --- dense heads --------------------------------------------------------
    _convert_dpt_head(c, "depth_head", "depth_head")
    if with_point_head:
        _convert_dpt_head(c, "point_head", "point_head")

    unused = sorted(set(src) - c.used)
    for k in unused:
        c.report.append(f"unmapped source key {k}")
    return {"params": c.out}, c.report


def load_vggt_torch_checkpoint(path: str, **kwargs):
    """Load facebook/VGGT-1B model.pt (torch) and convert."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "model" in state:
        state = state["model"]
    state = {k: v.float().numpy() for k, v in state.items()}
    return convert_vggt_state_dict(state, **kwargs)
