"""DreamSim perceptual distance (dino_vitb16 single-branch + full ensemble).

The reference scores image pairs with the `dreamsim` package
(/root/reference/evoworld/metrics/other_metrics/calculate_dreamsim.py:11-17:
model from `dreamsim(pretrained=True)`, score = model(img1, img2)). Two
variants are implemented, mirroring the published DreamSim options:

- `DreamSim` — the single-branch `dreamsim-dino_vitb16` variant: a DINO
  ViT-B/16 backbone whose CLS embedding is compared by cosine distance,
  d(a, b) = 1 - cos(f(a), f(b)).
- `DreamSimEnsemble` — the package default: three LoRA-merged ViT branches
  (dino_vitb16 CLS 768-d, OpenAI clip_vitb32 projected 512-d with QuickGELU,
  open_clip_vitb32 projected 512-d with exact GELU). Each branch embedding
  is L2-normalized, the three are concatenated into the published 1792-d
  DreamSim embedding, and pairs are compared by cosine distance over the
  concatenation. Per-branch input normalization (ImageNet stats for DINO,
  CLIP stats for both CLIP branches) follows the upstream extractors.

Weights convert from per-branch torch state dicts (the dreamsim checkpoint's
merged backbones): DINO naming via `convert_dino_state_dict`, OpenAI
`visual.*` CLIP naming via `convert_openai_clip_visual` (open_clip uses the
same visual-trunk naming). Without weights (zero-egress image) fixed seed-0
random backbones still yield consistent relative scores.
"""

from __future__ import annotations

from typing import Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from evoworld_tpu.models.vggt.aggregator import ViTBlock

_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class DinoViT(nn.Module):
    """DINO ViT-B/16: patch embed + CLS token + 12 blocks + final norm.

    (N, 224, 224, 3) imagenet-normalized -> (N, embed_dim) CLS embedding.
    """

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, _ = x.shape
        ph, pw = h // self.patch_size, w // self.patch_size
        d = self.embed_dim
        patches = nn.Conv(
            d, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID", name="patch_embed", dtype=x.dtype,
        )(x).reshape(n, ph * pw, d)

        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, d), jnp.float32)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1 + ph * pw, d), jnp.float32
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls[None], (n, 1, d)).astype(patches.dtype), patches], axis=1
        )
        tokens = tokens + pos.astype(tokens.dtype)[None]

        for i in range(self.depth):
            # DINO v1 blocks: no qk-norm; LayerScale absent (init 1.0 keeps
            # the param convertible as identity when the source lacks it).
            tokens = ViTBlock(
                d, self.num_heads, 4.0, qk_norm=False, layerscale_init=1.0,
                name=f"block_{i}",
            )(tokens)
        tokens = nn.LayerNorm(dtype=jnp.float32, name="norm")(
            tokens.astype(jnp.float32)
        )
        return tokens[:, 0]


def preprocess(images: np.ndarray) -> jnp.ndarray:
    """(N, H, W, 3) [0,1] -> (N, 224, 224, 3) imagenet-normalized."""
    x = jax.image.resize(jnp.asarray(images, jnp.float32),
                         (images.shape[0], 224, 224, 3), "bilinear")
    return (x - _IMAGENET_MEAN) / _IMAGENET_STD


class DreamSim:
    """Pair scorer mirroring the reference call shape (model(img1, img2))."""

    def __init__(self, params=None, seed: int = 0):
        self.model = DinoViT()
        if params is None:
            params = self.model.init(jax.random.key(seed), jnp.zeros((1, 224, 224, 3)))
            self.weights_tag = "random_seed0"
        else:
            self.weights_tag = "converted"
        # Params as a jit ARGUMENT: closed-over params lower to HLO
        # constants (~350 MB for ViT-B — the round-1 VGGT lesson).
        apply = jax.jit(self.model.apply)
        params = jax.tree.map(jnp.asarray, params)
        self._embed = lambda x: apply(params, x)

    def embed(self, images: np.ndarray) -> np.ndarray:
        return np.asarray(self._embed(preprocess(images)))

    def __call__(self, img1: np.ndarray, img2: np.ndarray) -> np.ndarray:
        """(N, H, W, 3) [0,1] pairs -> (N,) distances in [0, 2]."""
        a = self.embed(np.atleast_3d(img1)[None] if img1.ndim == 3 else img1)
        b = self.embed(np.atleast_3d(img2)[None] if img2.ndim == 3 else img2)
        a = a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
        b = b / np.maximum(np.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
        return 1.0 - (a * b).sum(-1)


def convert_dino_state_dict(src: Mapping[str, np.ndarray]) -> Tuple[dict, list]:
    """torch DINO ViT-B/16 naming -> DinoViT params (+ report).

    Accepts the standard facebook DINO naming (cls_token, pos_embed,
    patch_embed.proj, blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,
    mlp.fc2}, norm). LayerScale gammas are filled with ones when absent.
    """
    from evoworld_tpu.models.weights import _set, _t_conv, _t_linear

    out: dict = {}
    report: list = []
    used: set = set()

    def take(name):
        if name in src:
            used.add(name)
            return np.asarray(src[name])
        return None

    def put(name, dst, tf=None):
        v = take(name)
        if v is None:
            report.append(f"missing {name}")
            return
        _set(out, dst, tf(v) if tf else v)

    cls = take("cls_token")
    if cls is None:
        report.append("missing cls_token")
    else:
        _set(out, "cls_token", cls.reshape(1, -1))
    pos = take("pos_embed")
    if pos is None:
        report.append("missing pos_embed")
    else:
        _set(out, "pos_embed", pos.reshape(pos.shape[-2], pos.shape[-1]))
    put("patch_embed.proj.weight", "patch_embed/kernel", _t_conv)
    put("patch_embed.proj.bias", "patch_embed/bias")
    put("norm.weight", "norm/scale")
    put("norm.bias", "norm/bias")

    i = 0
    while f"blocks.{i}.norm1.weight" in src:
        p, d = f"blocks.{i}", f"block_{i}"
        put(f"{p}.norm1.weight", f"{d}/norm1/scale")
        put(f"{p}.norm1.bias", f"{d}/norm1/bias")
        put(f"{p}.attn.qkv.weight", f"{d}/qkv/kernel", _t_linear)
        put(f"{p}.attn.qkv.bias", f"{d}/qkv/bias")
        put(f"{p}.attn.proj.weight", f"{d}/proj/kernel", _t_linear)
        put(f"{p}.attn.proj.bias", f"{d}/proj/bias")
        put(f"{p}.norm2.weight", f"{d}/norm2/scale")
        put(f"{p}.norm2.bias", f"{d}/norm2/bias")
        put(f"{p}.mlp.fc1.weight", f"{d}/fc1/kernel", _t_linear)
        put(f"{p}.mlp.fc1.bias", f"{d}/fc1/bias")
        put(f"{p}.mlp.fc2.weight", f"{d}/fc2/kernel", _t_linear)
        put(f"{p}.mlp.fc2.bias", f"{d}/fc2/bias")
        dim = np.asarray(src[f"{p}.norm1.weight"]).shape[0]
        for ls in ("ls1", "ls2"):
            v = take(f"{p}.{ls}.gamma")
            _set(out, f"{d}/{ls}", v if v is not None else np.ones((dim,), np.float32))
        i += 1
    if i == 0:
        report.append("missing all blocks")
    leftover = sorted(set(src) - used - {"mask_token"})
    report.extend(f"unmapped source key {k}" for k in leftover)
    return {"params": out}, report


# ---------------------------------------------------------------------------
# Ensemble variant (dino_vitb16 + clip_vitb32 + open_clip_vitb32 -> 1792-d)
# ---------------------------------------------------------------------------

def _clip_b32_config(hidden_act: str):
    from evoworld_tpu.models.clip import CLIPVisionConfig

    return CLIPVisionConfig(
        patch_size=32, hidden_size=768, num_layers=12, num_heads=12,
        mlp_dim=3072, projection_dim=512, hidden_act=hidden_act,
    )


def openai_to_transformers_clip(src: Mapping[str, np.ndarray]) -> Tuple[dict, list]:
    """OpenAI CLIP `visual.*` naming -> transformers CLIPVisionModelWithProjection
    naming (open_clip ViT state dicts use the same visual-trunk layout).

    The fused `attn.in_proj_weight/bias` rows split into q/k/v thirds; the
    `visual.proj` matrix is stored as (hidden, out) and used as `x @ proj`,
    so it transposes into transformers' (out, hidden) `visual_projection.weight`.
    Returns (remapped dict, report of unmapped keys).
    """
    out: dict = {}
    report: list = []
    pfx = "vision_model."
    static = {
        "visual.conv1.weight": pfx + "embeddings.patch_embedding.weight",
        "visual.class_embedding": pfx + "embeddings.class_embedding",
        "visual.positional_embedding": pfx + "embeddings.position_embedding.weight",
        "visual.ln_pre.weight": pfx + "pre_layrnorm.weight",
        "visual.ln_pre.bias": pfx + "pre_layrnorm.bias",
        "visual.ln_post.weight": pfx + "post_layernorm.weight",
        "visual.ln_post.bias": pfx + "post_layernorm.bias",
    }
    for k, v in src.items():
        if not k.startswith("visual."):
            continue  # text tower / logit scale — not part of the branch
        a = np.asarray(v)
        if k in static:
            out[static[k]] = a
        elif k == "visual.proj":
            out["visual_projection.weight"] = a.T
        elif k.startswith("visual.transformer.resblocks."):
            rest = k[len("visual.transformer.resblocks."):]
            i, name = rest.split(".", 1)
            d = pfx + f"encoder.layers.{i}."
            if name in ("ln_1.weight", "ln_1.bias", "ln_2.weight", "ln_2.bias"):
                ln, wb = name.split(".")
                out[d + f"layer_norm{ln[-1]}.{wb}"] = a
            elif name in ("attn.in_proj_weight", "attn.in_proj_bias"):
                wb = name.rsplit("_", 1)[1]  # "weight" | "bias"
                for proj, third in zip(("q_proj", "k_proj", "v_proj"),
                                       np.split(a, 3, axis=0)):
                    out[d + f"self_attn.{proj}.{wb}"] = third
            elif name.startswith("attn.out_proj."):
                out[d + "self_attn." + name[len("attn."):]] = a
            elif name.startswith("mlp.c_fc."):
                out[d + "mlp.fc1." + name.rsplit(".", 1)[1]] = a
            elif name.startswith("mlp.c_proj."):
                out[d + "mlp.fc2." + name.rsplit(".", 1)[1]] = a
            else:
                report.append(f"unmapped source key {k}")
        else:
            report.append(f"unmapped source key {k}")
    return out, report


def convert_openai_clip_visual(src: Mapping[str, np.ndarray]) -> Tuple[dict, list]:
    """OpenAI/open_clip `visual.*` state dict -> CLIPVisionTower params."""
    from evoworld_tpu.models.weights import convert_clip_state_dict

    remapped, report = openai_to_transformers_clip(src)
    try:
        params = convert_clip_state_dict(remapped)
    except KeyError as exc:
        report.append(f"missing {exc}")
        params = {"params": {}}
    return params, report


class DreamSimEnsemble:
    """Published DreamSim default: 3-branch ViT ensemble, 1792-d embedding.

    branch_params maps branch name ("dino_vitb16" | "clip_vitb32" |
    "open_clip_vitb32") to converted Flax params; absent branches fall back
    to fixed seed-0 random weights.
    """

    BRANCHES = ("dino_vitb16", "clip_vitb32", "open_clip_vitb32")

    def __init__(self, branch_params: Mapping[str, dict] | None = None, seed: int = 0):
        from evoworld_tpu.models.clip import CLIP_MEAN, CLIP_STD, CLIPVisionTower

        branch_params = dict(branch_params or {})
        dummy = jnp.zeros((1, 224, 224, 3))
        models = {
            "dino_vitb16": DinoViT(),
            "clip_vitb32": CLIPVisionTower(_clip_b32_config("quick_gelu")),
            "open_clip_vitb32": CLIPVisionTower(_clip_b32_config("gelu")),
        }
        self._norms = {
            "dino_vitb16": (_IMAGENET_MEAN, _IMAGENET_STD),
            "clip_vitb32": (CLIP_MEAN, CLIP_STD),
            "open_clip_vitb32": (CLIP_MEAN, CLIP_STD),
        }
        converted = [b for b in self.BRANCHES if b in branch_params]
        self.weights_tag = (
            "converted:" + ",".join(converted) if converted else "random_seed0"
        )
        self._embeds = {}
        for name, model in models.items():
            params = branch_params.get(name)
            if params is None:
                params = model.init(jax.random.key(seed), dummy)
            # Params as jit arguments, not closure constants (HLO-size).
            apply = jax.jit(model.apply)
            params = jax.tree.map(jnp.asarray, params)
            self._embeds[name] = lambda x, a=apply, p=params: a(p, x)

    def embed(self, images: np.ndarray) -> np.ndarray:
        """(N, H, W, 3) [0,1] -> (N, 1792) concatenated per-branch-normalized."""
        x = jax.image.resize(jnp.asarray(images, jnp.float32),
                             (images.shape[0], 224, 224, 3), "bilinear")
        feats = []
        for name in self.BRANCHES:
            mean, std = self._norms[name]
            f = np.asarray(self._embeds[name]((x - mean) / std), np.float64)
            feats.append(f / np.maximum(np.linalg.norm(f, axis=-1, keepdims=True), 1e-12))
        return np.concatenate(feats, axis=-1)

    def __call__(self, img1: np.ndarray, img2: np.ndarray) -> np.ndarray:
        """(N, H, W, 3) [0,1] pairs -> (N,) cosine distances."""
        a = self.embed(img1[None] if img1.ndim == 3 else img1)
        b = self.embed(img2[None] if img2.ndim == 3 else img2)
        a = a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
        b = b / np.maximum(np.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
        return 1.0 - (a * b).sum(-1)


def make_dreamsim(variant: str = "dino_vitb16", branch_params=None, seed: int = 0):
    """Factory over the two implemented DreamSim variants."""
    if variant == "ensemble":
        return DreamSimEnsemble(branch_params, seed=seed)
    if variant == "dino_vitb16":
        params = (branch_params or {}).get("dino_vitb16")
        return DreamSim(params, seed=seed)
    raise ValueError(f"unknown dreamsim variant {variant!r}")
