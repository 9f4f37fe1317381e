"""VGGT torch checkpoint (facebook/VGGT-1B model.pt) -> Flax conversion.

The reference consumes the upstream checkpoint directly
(/root/reference/unified_loop_consistency.py:125-127); the submodule is not
vendored, so the upstream state-dict naming is reconstructed here
best-effort. `convert_vggt_state_dict` returns (params, report): `report`
lists source keys it could not place and destination leaves left unfilled —
refine the table against the real checkpoint when it is available
(zero-egress environment: no weights in this image).
"""

from __future__ import annotations

from typing import Mapping, Tuple

import numpy as np

from evoworld_tpu.models.weights import _set, _t_conv, _t_linear


def _vit_block(src: Mapping, prefix: str, out: dict, dst: str, report: list) -> None:
    """Upstream DINO/VGGT Block -> our ViTBlock (qkv fused in both)."""
    pairs = [
        (f"{prefix}.norm1.weight", f"{dst}/norm1/scale", None),
        (f"{prefix}.norm1.bias", f"{dst}/norm1/bias", None),
        (f"{prefix}.attn.qkv.weight", f"{dst}/qkv/kernel", _t_linear),
        (f"{prefix}.attn.qkv.bias", f"{dst}/qkv/bias", None),
        (f"{prefix}.attn.proj.weight", f"{dst}/proj/kernel", _t_linear),
        (f"{prefix}.attn.proj.bias", f"{dst}/proj/bias", None),
        (f"{prefix}.attn.q_norm.weight", f"{dst}/q_norm/scale", None),
        (f"{prefix}.attn.q_norm.bias", f"{dst}/q_norm/bias", None),
        (f"{prefix}.attn.k_norm.weight", f"{dst}/k_norm/scale", None),
        (f"{prefix}.attn.k_norm.bias", f"{dst}/k_norm/bias", None),
        (f"{prefix}.ls1.gamma", f"{dst}/ls1", None),
        (f"{prefix}.ls2.gamma", f"{dst}/ls2", None),
        (f"{prefix}.norm2.weight", f"{dst}/norm2/scale", None),
        (f"{prefix}.norm2.bias", f"{dst}/norm2/bias", None),
        (f"{prefix}.mlp.fc1.weight", f"{dst}/fc1/kernel", _t_linear),
        (f"{prefix}.mlp.fc1.bias", f"{dst}/fc1/bias", None),
        (f"{prefix}.mlp.fc2.weight", f"{dst}/fc2/kernel", _t_linear),
        (f"{prefix}.mlp.fc2.bias", f"{dst}/fc2/bias", None),
    ]
    for src_name, dst_name, tf in pairs:
        if src_name in src:
            v = np.asarray(src[src_name])
            _set(out, dst_name, tf(v) if tf else v)
        elif "q_norm" not in src_name and "k_norm" not in src_name and ".ls" not in src_name:
            report.append(f"missing {src_name}")


def convert_vggt_state_dict(src: Mapping[str, np.ndarray]) -> Tuple[dict, list]:
    """Best-effort upstream VGGT state dict -> our param tree + report."""
    out: dict = {}
    report: list = []

    def put(src_name, dst_name, tf=None):
        if src_name in src:
            v = np.asarray(src[src_name])
            _set(out, dst_name, tf(v) if tf else v)
        else:
            report.append(f"missing {src_name}")

    agg = "aggregator"
    put(f"{agg}.patch_embed.patch_embed.proj.weight", f"{agg}/patch_embed/kernel", _t_conv)
    put(f"{agg}.patch_embed.patch_embed.proj.bias", f"{agg}/patch_embed/bias")
    put(f"{agg}.patch_embed.pos_embed", f"{agg}/pos_embed", lambda v: v.reshape(v.shape[-2], v.shape[-1]))
    put(f"{agg}.camera_token", f"{agg}/camera_token", lambda v: v.reshape(-1, v.shape[-1])[:1])
    put(f"{agg}.register_token", f"{agg}/register_token", lambda v: v.reshape(-1, v.shape[-1]))

    # Scanned blocks: per-layer weights stack on a leading layer axis
    # (aggregator blocks run under nn.scan).
    def stacked(src_prefix_fmt: str, dst: str) -> None:
        layers = []
        i = 0
        while f"{src_prefix_fmt.format(i)}.norm1.weight" in src:
            layer: dict = {}
            _vit_block(src, src_prefix_fmt.format(i), layer, "x", report)
            layers.append(layer.get("x", {}))
            i += 1
        if not layers:
            report.append(f"missing all layers for {src_prefix_fmt}")
            return

        def stack(trees, path):
            first = trees[0]
            if isinstance(first, dict):
                return {k: stack([t[k] for t in trees], path + "/" + k) for k in first}
            return np.stack(trees)

        _set(out, dst, None)  # placeholder replaced below
        node = out
        keys = dst.split("/")
        for k in keys[:-1]:
            node = node[k]
        node[keys[-1]] = stack(layers, dst)

    stacked(agg + ".patch_embed.blocks.{}", f"{agg}/dino_blocks/block")
    stacked(agg + ".frame_blocks.{}", f"{agg}/blocks/frame")
    stacked(agg + ".global_blocks.{}", f"{agg}/blocks/global")

    # Heads: trunk blocks + projections (upstream camera_head.trunk.*).
    i = 0
    while f"camera_head.trunk.{i}.norm1.weight" in src:
        _vit_block(src, f"camera_head.trunk.{i}", out, f"camera_head/trunk_{i}", report)
        i += 1
    for upstream, ours in (
        ("camera_head.token_norm", "camera_head/trunk_norm"),
        ("camera_head.pose_branch", "camera_head/pose_out"),
        ("camera_head.embed_pose", "camera_head/pose_embed"),
    ):
        put(f"{upstream}.weight", f"{ours}/{'kernel' if 'norm' not in upstream else 'scale'}",
            _t_linear if "norm" not in upstream else None)
        put(f"{upstream}.bias", f"{ours}/bias")

    unmapped = [k for k in src if "depth_head" in k or "point_head" in k]
    if unmapped:
        report.append(f"{len(unmapped)} DPT-head keys need the refined table")
    return {"params": out}, report


def load_vggt_torch_checkpoint(path: str):
    """Load facebook/VGGT-1B model.pt (torch) and convert."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "model" in state:
        state = state["model"]
    state = {k: v.numpy() for k, v in state.items()}
    return convert_vggt_state_dict(state)
