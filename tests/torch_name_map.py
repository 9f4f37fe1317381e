"""Inverse name mapping for converter tests: generate a torch-layout
(diffusers-named) state dict with random values from one of our flax param
trees. Encodes the diffusers naming scheme independently of the converter so
structural bugs (missing leaves, wrong paths, wrong transposes) surface as
mismatches in tests/test_weights.py."""

import re

import numpy as np

_CONTAINERS = (
    "resnets",
    "attentions",
    "downsamplers",
    "upsamplers",
    "down_blocks",
    "up_blocks",
    "transformer_blocks",
    "temporal_transformer_blocks",
)


def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _rand(shape, rng):
    return rng.normal(size=shape).astype(np.float32)


def _to_torch_layout(leaf_name, arr):
    if leaf_name == "kernel":
        if arr.ndim == 2:
            return arr.transpose(1, 0)
        if arr.ndim == 4:
            return arr.transpose(3, 2, 0, 1)
        if arr.ndim == 5:
            return arr.transpose(4, 3, 0, 1, 2)
    return arr


def _dotted(keys):
    """Join flax path tokens into a diffusers-style dotted name."""
    name = "/".join(keys)
    # Collapse the norm-wrapper: X/norm/scale -> X.weight.
    name = re.sub(r"/norm/(scale|bias)$", lambda m: "/" + {"scale": "weight", "bias": "bias"}[m.group(1)], name)
    name = re.sub(r"/(scale)$", "/weight", name)
    name = re.sub(r"/kernel$", "/weight", name)
    # Underscore-joined VAE names first: down_blocks_0_resnets_1 -> dotted.
    name = re.sub(
        r"(down_blocks|up_blocks)_(\d+)_(resnets|downsamplers|upsamplers)_(\d+)",
        r"\1/\2/\3/\4",
        name,
    )
    # Container indices: resnets_0 -> resnets.0.
    for c in _CONTAINERS:
        name = re.sub(rf"(^|[/_]){c}_(\d+)", rf"\1{c}/\2", name)
    # GEGLU feed-forward: ff(.in)?/proj_in -> ff.net.0.proj; proj_out -> net.2.
    name = re.sub(r"/(ff|ff_in)/proj_in/", r"/\1/net/0/proj/", name)
    name = re.sub(r"/(ff|ff_in)/proj_out/", r"/\1/net/2/", name)
    name = re.sub(r"^(ff|ff_in)/proj_in/", r"\1/net/0/proj/", name)
    name = re.sub(r"^(ff|ff_in)/proj_out/", r"\1/net/2/", name)
    # Attention output projection is a Sequential in torch.
    name = name.replace("/to_out/", "/to_out/0/")
    return name.replace("/", ".").replace("_.", ".")


def unet_flax_to_torch(params: dict, rng_seed: int = 0) -> dict:
    rng = np.random.default_rng(rng_seed)
    out = {}
    for path, leaf in _flatten(params):
        arr = _rand(tuple(leaf.shape), rng)
        name = _dotted(list(path))
        out[name] = _to_torch_layout(path[-1], arr)
    return out


def vae_flax_to_torch(params: dict, rng_seed: int = 0) -> dict:
    rng = np.random.default_rng(rng_seed)
    out = {}
    for path, leaf in _flatten(params):
        arr = _rand(tuple(leaf.shape), rng)
        keys = list(path)
        name = _dotted(keys)
        # VAE-specific fixes on the dotted name.
        name = re.sub(r"^(encoder|decoder)\.mid_resnets\.(\d+)", r"\1.mid_block.resnets.\2", name)
        name = name.replace("encoder.mid_attn.", "encoder.mid_block.attentions.0.")
        name = name.replace("decoder.mid_attn.", "decoder.mid_block.attentions.0.")
        name = name.replace("encoder.quant_conv.", "quant_conv.")
        out[name] = _to_torch_layout(path[-1], arr)
    return out
