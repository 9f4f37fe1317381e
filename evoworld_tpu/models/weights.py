"""Checkpoint conversion: HF/diffusers torch weights -> evoworld_tpu params.

The reference consumes three frozen artifact families (SURVEY.md §2.8):
  - the SVD-style pipeline dir (unet/ vae/ image_encoder/ subfolders of
    `MODELS/evoworld_curve_unity` or `stabilityai/stable-video-diffusion-
    img2vid-xt-1-1`), loaded with `from_pretrained` at
    /root/reference/evoworld/inference/navigator_evoworld.py:103-119;
  - facebook/VGGT-1B `model.pt`;
  - metric networks (I3D, LPIPS...).

This module maps diffusers/transformers state-dict names onto our Flax param
trees. Rules:
  - torch Conv2d (O, I, kh, kw) -> flax (kh, kw, I, O); Conv3d
    (O, I, kt, kh, kw) -> (kt, kh, kw, I, O)
  - torch Linear (O, I) -> flax (I, O)
  - norms map 1:1 (weight->scale, bias->bias)
  - the UNet conv_in surgery (18-ch input, zero-init extra channels,
    reference trainer_utils.py:17-64) is applied here when the source
    checkpoint has fewer input channels.

No weights ship in this environment; `convert_*_state_dict` operate on any
mapping of name -> numpy array (e.g. loaded via safetensors) and are
unit-tested against randomly initialized torch-layout dicts.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


Array = np.ndarray
StateDict = Mapping[str, Array]


def _t_conv(w: Array) -> Array:
    """torch conv kernel -> flax: OIHW -> HWIO / OITHW -> THWIO."""
    if w.ndim == 4:
        return np.transpose(w, (2, 3, 1, 0))
    if w.ndim == 5:
        return np.transpose(w, (2, 3, 4, 1, 0))
    raise ValueError(f"unexpected conv kernel rank {w.ndim}")


def _t_linear(w: Array) -> Array:
    return np.transpose(w, (1, 0))


def _set(tree: dict, path: str, value: Array) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def expand_conv_in_kernel(kernel_hwio: Array, target_in: int) -> Array:
    """Zero-pad a conv_in kernel's input-channel dim (conv surgery).

    Matches `_replace_unet_conv_in_zero_init` (reference trainer_utils.py:
    17-64): original input channels keep their weights, new channels start
    at zero so the finetune begins from the pretrained function.
    """
    kh, kw, cin, cout = kernel_hwio.shape
    if cin == target_in:
        return kernel_hwio
    assert cin < target_in, (cin, target_in)
    pad = np.zeros((kh, kw, target_in - cin, cout), kernel_hwio.dtype)
    return np.concatenate([kernel_hwio, pad], axis=2)


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------

def _convert_resnet(src: StateDict, prefix: str, out: dict, dst_prefix: str) -> None:
    """diffusers SpatioTemporalResBlock -> our SpatioTemporalResBlock."""
    for branch, dst_branch in (("spatial_res_block", "spatial_res_block"), ("temporal_res_block", "temporal_res_block")):
        p = f"{prefix}.{branch}"
        d = f"{dst_prefix}/{branch}"
        _set(out, f"{d}/norm1/norm/scale", src[f"{p}.norm1.weight"])
        _set(out, f"{d}/norm1/norm/bias", src[f"{p}.norm1.bias"])
        _set(out, f"{d}/conv1/kernel", _t_conv(src[f"{p}.conv1.weight"]))
        _set(out, f"{d}/conv1/bias", src[f"{p}.conv1.bias"])
        if f"{p}.time_emb_proj.weight" in src:
            _set(out, f"{d}/time_emb_proj/kernel", _t_linear(src[f"{p}.time_emb_proj.weight"]))
            _set(out, f"{d}/time_emb_proj/bias", src[f"{p}.time_emb_proj.bias"])
        _set(out, f"{d}/norm2/norm/scale", src[f"{p}.norm2.weight"])
        _set(out, f"{d}/norm2/norm/bias", src[f"{p}.norm2.bias"])
        _set(out, f"{d}/conv2/kernel", _t_conv(src[f"{p}.conv2.weight"]))
        _set(out, f"{d}/conv2/bias", src[f"{p}.conv2.bias"])
        if f"{p}.conv_shortcut.weight" in src:
            _set(out, f"{d}/conv_shortcut/kernel", _t_conv(src[f"{p}.conv_shortcut.weight"]))
            _set(out, f"{d}/conv_shortcut/bias", src[f"{p}.conv_shortcut.bias"])
    _set(out, f"{dst_prefix}/time_mixer/mix_factor", src[f"{prefix}.time_mixer.mix_factor"].reshape(1))


def _convert_attention(src: StateDict, prefix: str, out: dict, dst_prefix: str) -> None:
    _set(out, f"{dst_prefix}/to_q/kernel", _t_linear(src[f"{prefix}.to_q.weight"]))
    _set(out, f"{dst_prefix}/to_k/kernel", _t_linear(src[f"{prefix}.to_k.weight"]))
    _set(out, f"{dst_prefix}/to_v/kernel", _t_linear(src[f"{prefix}.to_v.weight"]))
    _set(out, f"{dst_prefix}/to_out/kernel", _t_linear(src[f"{prefix}.to_out.0.weight"]))
    _set(out, f"{dst_prefix}/to_out/bias", src[f"{prefix}.to_out.0.bias"])
    for name in ("to_q", "to_k", "to_v"):
        if f"{prefix}.{name}.bias" in src:
            _set(out, f"{dst_prefix}/{name}/bias", src[f"{prefix}.{name}.bias"])


def _convert_ff(src: StateDict, prefix: str, out: dict, dst_prefix: str) -> None:
    """diffusers FeedForward(geglu): net.0.proj (2*inner), net.2."""
    _set(out, f"{dst_prefix}/proj_in/kernel", _t_linear(src[f"{prefix}.net.0.proj.weight"]))
    _set(out, f"{dst_prefix}/proj_in/bias", src[f"{prefix}.net.0.proj.bias"])
    _set(out, f"{dst_prefix}/proj_out/kernel", _t_linear(src[f"{prefix}.net.2.weight"]))
    _set(out, f"{dst_prefix}/proj_out/bias", src[f"{prefix}.net.2.bias"])


def _convert_ln(src: StateDict, prefix: str, out: dict, dst_prefix: str) -> None:
    _set(out, f"{dst_prefix}/norm/scale", src[f"{prefix}.weight"])
    _set(out, f"{dst_prefix}/norm/bias", src[f"{prefix}.bias"])


def _convert_basic_block(src: StateDict, prefix: str, out: dict, dst_prefix: str) -> None:
    _convert_ln(src, f"{prefix}.norm1", out, f"{dst_prefix}/norm1")
    _convert_attention(src, f"{prefix}.attn1", out, f"{dst_prefix}/attn1")
    _convert_ln(src, f"{prefix}.norm2", out, f"{dst_prefix}/norm2")
    _convert_attention(src, f"{prefix}.attn2", out, f"{dst_prefix}/attn2")
    _convert_ln(src, f"{prefix}.norm3", out, f"{dst_prefix}/norm3")
    _convert_ff(src, f"{prefix}.ff", out, f"{dst_prefix}/ff")


def _convert_temporal_block(src: StateDict, prefix: str, out: dict, dst_prefix: str) -> None:
    _convert_ln(src, f"{prefix}.norm_in", out, f"{dst_prefix}/norm_in")
    _convert_ff(src, f"{prefix}.ff_in", out, f"{dst_prefix}/ff_in")
    _convert_basic_block(src, prefix, out, dst_prefix)


def _convert_transformer(src: StateDict, prefix: str, out: dict, dst_prefix: str, num_layers: int = 1) -> None:
    _set(out, f"{dst_prefix}/norm/norm/scale", src[f"{prefix}.norm.weight"])
    _set(out, f"{dst_prefix}/norm/norm/bias", src[f"{prefix}.norm.bias"])
    _set(out, f"{dst_prefix}/proj_in/kernel", _t_linear(src[f"{prefix}.proj_in.weight"]))
    _set(out, f"{dst_prefix}/proj_in/bias", src[f"{prefix}.proj_in.bias"])
    _set(out, f"{dst_prefix}/proj_out/kernel", _t_linear(src[f"{prefix}.proj_out.weight"]))
    _set(out, f"{dst_prefix}/proj_out/bias", src[f"{prefix}.proj_out.bias"])
    for lin in ("linear_1", "linear_2"):
        _set(out, f"{dst_prefix}/time_pos_embed/{lin}/kernel", _t_linear(src[f"{prefix}.time_pos_embed.{lin}.weight"]))
        _set(out, f"{dst_prefix}/time_pos_embed/{lin}/bias", src[f"{prefix}.time_pos_embed.{lin}.bias"])
    _set(out, f"{dst_prefix}/time_mixer/mix_factor", src[f"{prefix}.time_mixer.mix_factor"].reshape(1))
    for i in range(num_layers):
        _convert_basic_block(src, f"{prefix}.transformer_blocks.{i}", out, f"{dst_prefix}/transformer_blocks_{i}")
        _convert_temporal_block(
            src, f"{prefix}.temporal_transformer_blocks.{i}", out, f"{dst_prefix}/temporal_transformer_blocks_{i}"
        )


def convert_unet_state_dict(src: StateDict, target_in_channels: int = 18) -> dict:
    """diffusers UNetSpatioTemporalConditionModel state dict -> our params.

    Returns {"params": {...}} matching `UNetSpatioTemporal` with the default
    4-level config. Applies conv_in zero-pad surgery when the checkpoint has
    fewer input channels than `target_in_channels`.
    """
    out: dict = {}
    conv_in = _t_conv(src["conv_in.weight"])
    _set(out, "conv_in/kernel", expand_conv_in_kernel(conv_in, target_in_channels))
    _set(out, "conv_in/bias", src["conv_in.bias"])

    for name in ("time_embedding", "add_embedding"):
        for lin in ("linear_1", "linear_2"):
            _set(out, f"{name}/{lin}/kernel", _t_linear(src[f"{name}.{lin}.weight"]))
            _set(out, f"{name}/{lin}/bias", src[f"{name}.{lin}.bias"])

    layers_per_block = 2
    cross = (True, True, True, False)
    for b in range(4):
        p = f"down_blocks.{b}"
        d = f"down_blocks_{b}"
        for i in range(layers_per_block):
            _convert_resnet(src, f"{p}.resnets.{i}", out, f"{d}/resnets_{i}")
            if cross[b]:
                _convert_transformer(src, f"{p}.attentions.{i}", out, f"{d}/attentions_{i}")
        if f"{p}.downsamplers.0.conv.weight" in src:
            _set(out, f"{d}/downsamplers_0/conv/kernel", _t_conv(src[f"{p}.downsamplers.0.conv.weight"]))
            _set(out, f"{d}/downsamplers_0/conv/bias", src[f"{p}.downsamplers.0.conv.bias"])

    _convert_resnet(src, "mid_block.resnets.0", out, "mid_block/resnets_0")
    _convert_transformer(src, "mid_block.attentions.0", out, "mid_block/attentions_0")
    _convert_resnet(src, "mid_block.resnets.1", out, "mid_block/resnets_1")

    up_cross = (False, True, True, True)  # up_blocks order: level 3 first
    for b in range(4):
        p = f"up_blocks.{b}"
        d = f"up_blocks_{b}"
        for i in range(layers_per_block + 1):
            _convert_resnet(src, f"{p}.resnets.{i}", out, f"{d}/resnets_{i}")
            if up_cross[b]:
                _convert_transformer(src, f"{p}.attentions.{i}", out, f"{d}/attentions_{i}")
        if f"{p}.upsamplers.0.conv.weight" in src:
            _set(out, f"{d}/upsamplers_0/conv/kernel", _t_conv(src[f"{p}.upsamplers.0.conv.weight"]))
            _set(out, f"{d}/upsamplers_0/conv/bias", src[f"{p}.upsamplers.0.conv.bias"])

    _set(out, "conv_norm_out/norm/scale", src["conv_norm_out.weight"])
    _set(out, "conv_norm_out/norm/bias", src["conv_norm_out.bias"])
    _set(out, "conv_out/kernel", _t_conv(src["conv_out.weight"]))
    _set(out, "conv_out/bias", src["conv_out.bias"])
    return {"params": out}


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def convert_vae_state_dict(src: StateDict) -> dict:
    """diffusers AutoencoderKLTemporalDecoder state dict -> our params."""
    out: dict = {}

    def conv(src_name, dst):
        _set(out, f"{dst}/kernel", _t_conv(src[f"{src_name}.weight"]))
        _set(out, f"{dst}/bias", src[f"{src_name}.bias"])

    def gn(src_name, dst):
        _set(out, f"{dst}/norm/scale", src[f"{src_name}.weight"])
        _set(out, f"{dst}/norm/bias", src[f"{src_name}.bias"])

    def resnet2d(p, d):
        gn(f"{p}.norm1", f"{d}/norm1")
        conv(f"{p}.conv1", f"{d}/conv1")
        gn(f"{p}.norm2", f"{d}/norm2")
        conv(f"{p}.conv2", f"{d}/conv2")
        if f"{p}.conv_shortcut.weight" in src:
            conv(f"{p}.conv_shortcut", f"{d}/conv_shortcut")

    def vae_attn(p, d):
        gn(f"{p}.group_norm", f"{d}/group_norm")
        for n in ("to_q", "to_k", "to_v"):
            _set(out, f"{d}/{n}/kernel", _t_linear(src[f"{p}.{n}.weight"]))
            _set(out, f"{d}/{n}/bias", src[f"{p}.{n}.bias"])
        _set(out, f"{d}/to_out/kernel", _t_linear(src[f"{p}.to_out.0.weight"]))
        _set(out, f"{d}/to_out/bias", src[f"{p}.to_out.0.bias"])

    # Encoder.
    conv("encoder.conv_in", "encoder/conv_in")
    for b in range(4):
        for i in range(2):
            resnet2d(f"encoder.down_blocks.{b}.resnets.{i}", f"encoder/down_blocks_{b}_resnets_{i}")
        if f"encoder.down_blocks.{b}.downsamplers.0.conv.weight" in src:
            conv(f"encoder.down_blocks.{b}.downsamplers.0.conv", f"encoder/down_blocks_{b}_downsamplers_0/conv")
    resnet2d("encoder.mid_block.resnets.0", "encoder/mid_resnets_0")
    vae_attn("encoder.mid_block.attentions.0", "encoder/mid_attn")
    resnet2d("encoder.mid_block.resnets.1", "encoder/mid_resnets_1")
    gn("encoder.conv_norm_out", "encoder/conv_norm_out")
    conv("encoder.conv_out", "encoder/conv_out")
    conv("quant_conv", "encoder/quant_conv")

    # Temporal decoder.
    def st_resnet(p, d):
        _convert_resnet(src, p, out, d)

    conv("decoder.conv_in", "decoder/conv_in")
    st_resnet("decoder.mid_block.resnets.0", "decoder/mid_resnets_0")
    vae_attn("decoder.mid_block.attentions.0", "decoder/mid_attn")
    st_resnet("decoder.mid_block.resnets.1", "decoder/mid_resnets_1")
    for b in range(4):
        for i in range(3):
            st_resnet(f"decoder.up_blocks.{b}.resnets.{i}", f"decoder/up_blocks_{b}_resnets_{i}")
        if f"decoder.up_blocks.{b}.upsamplers.0.conv.weight" in src:
            conv(f"decoder.up_blocks.{b}.upsamplers.0.conv", f"decoder/up_blocks_{b}_upsamplers_0/conv")
    gn("decoder.conv_norm_out", "decoder/conv_norm_out")
    conv("decoder.conv_out", "decoder/conv_out")
    conv("decoder.time_conv_out", "decoder/time_conv_out")
    return {"params": out}


# ---------------------------------------------------------------------------
# CLIP vision
# ---------------------------------------------------------------------------

def convert_clip_state_dict(src: StateDict) -> dict:
    """transformers CLIPVisionModelWithProjection state dict -> our params."""
    out: dict = {}
    pfx = "vision_model."

    _set(out, "patch_embedding/kernel", _t_conv(src[pfx + "embeddings.patch_embedding.weight"]))
    _set(out, "class_embedding", src[pfx + "embeddings.class_embedding"])
    _set(out, "position_embedding", src[pfx + "embeddings.position_embedding.weight"])
    for name, dst in (("pre_layrnorm", "pre_layrnorm"), ("post_layernorm", "post_layernorm")):
        _set(out, f"{dst}/scale", src[pfx + f"{name}.weight"])
        _set(out, f"{dst}/bias", src[pfx + f"{name}.bias"])

    i = 0
    while pfx + f"encoder.layers.{i}.layer_norm1.weight" in src:
        p = pfx + f"encoder.layers.{i}"
        d = f"layers_{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            _set(out, f"{d}/{ln}/scale", src[f"{p}.{ln}.weight"])
            _set(out, f"{d}/{ln}/bias", src[f"{p}.{ln}.bias"])
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _set(out, f"{d}/{proj}/kernel", _t_linear(src[f"{p}.self_attn.{proj}.weight"]))
            _set(out, f"{d}/{proj}/bias", src[f"{p}.self_attn.{proj}.bias"])
        for fc in ("fc1", "fc2"):
            _set(out, f"{d}/{fc}/kernel", _t_linear(src[f"{p}.mlp.{fc}.weight"]))
            _set(out, f"{d}/{fc}/bias", src[f"{p}.mlp.{fc}.bias"])
        i += 1

    _set(out, "visual_projection/kernel", _t_linear(src["visual_projection.weight"]))
    return {"params": out}


# ---------------------------------------------------------------------------
# IO helpers
# ---------------------------------------------------------------------------

def load_safetensors(path: str) -> dict[str, np.ndarray]:
    """Load a .safetensors file into numpy arrays (no torch needed)."""
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def verify_tree_matches(converted: dict, reference_shapes, path="") -> list[str]:
    """Compare a converted tree against `jax.eval_shape` init output; returns
    a list of mismatch descriptions (empty = exact match)."""
    problems = []

    def walk(c, r, p):
        if isinstance(r, Mapping):
            ck = set(c.keys()) if isinstance(c, Mapping) else set()
            rk = set(r.keys())
            for k in rk - ck:
                problems.append(f"missing {p}/{k}")
            for k in ck - rk:
                problems.append(f"extra {p}/{k}")
            for k in rk & ck:
                walk(c[k], r[k], f"{p}/{k}")
        else:
            shape = tuple(getattr(c, "shape", ()))
            want = tuple(r.shape)
            if shape != want:
                problems.append(f"shape {p}: {shape} != {want}")

    walk(converted, reference_shapes, path)
    return problems


def host_random_params(shapes, seed: int, dtype, as_numpy: bool = False):
    """Deterministic host-side pseudo-random init for smoke/bench runs.

    Device-side flax init of billion-parameter trees is a pathological
    compile on remote backends. This respects parameter roles by path
    (norm scales/alpha-blend factors -> their neutral values, biases -> 0,
    kernels -> fan-in-scaled normal) so random models still propagate signal.

    `as_numpy=True` keeps leaves as client-side numpy (ml_dtypes-backed for
    bf16) so the caller controls the single device transfer — e.g. a direct
    put to pinned_host for offloaded params, avoiding a device round-trip
    over the slow dev tunnel.
    """
    import jax
    import jax.numpy as jnp

    np_dtype = jnp.dtype(dtype)
    xp_ones = (lambda s: np.ones(s, np_dtype)) if as_numpy else (lambda s: jnp.ones(s, dtype))
    xp_full = (lambda s, v: np.full(s, v, np_dtype)) if as_numpy else (lambda s, v: jnp.full(s, v, dtype))
    xp_zeros = (lambda s: np.zeros(s, np_dtype)) if as_numpy else (lambda s: jnp.zeros(s, dtype))
    xp_cast = (lambda a: a.astype(np_dtype)) if as_numpy else (lambda a: jnp.asarray(a, dtype))

    rng = np.random.default_rng(seed)

    def leaf(path, s):
        name = str(getattr(path[-1], "key", path[-1])) if path else ""
        shape = tuple(s.shape)
        if name == "scale":
            return xp_ones(shape)
        if name == "mix_factor":
            return xp_full(shape, 0.5)
        if name in ("bias", "class_embedding"):
            return xp_zeros(shape)
        if len(shape) >= 2:
            fan_in = int(np.prod(shape[:-1]))
            std = float(np.sqrt(1.0 / max(fan_in, 1)))
            return xp_cast(rng.standard_normal(shape, dtype=np.float32) * std)
        return xp_cast(rng.standard_normal(shape, dtype=np.float32) * 0.02)

    return jax.tree_util.tree_map_with_path(leaf, shapes)
