"""Cross-framework parity of VGGT's DINOv2-role patch encoder.

The aggregator's per-frame encoder claims dinov2_vitl14_reg semantics
(models/vggt/aggregator.py: cls + register tokens riding through every
block, LayerScale, final norm, x_norm_patchtokens output). transformers
ships an independent implementation (Dinov2WithRegistersModel) — weights
transfer from a randomly-initialized transformers model into our
aggregator's dino params, and the patch features must match numerically.
Also pins the ImageNet normalization placement (ours normalizes inside the
aggregator; transformers expects pre-normalized pixels).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from evoworld_tpu.models.vggt.aggregator import Aggregator, AggregatorConfig

C, LAYERS, HEADS, REG = 64, 2, 4, 4
SIZE = 70  # 5x5 patch grid at patch 14; matches config.image_size -> no interp


def _stack(tensors):
    return np.stack([t.detach().numpy() for t in tensors])


def test_dino_encoder_matches_transformers():
    from transformers import Dinov2WithRegistersConfig, Dinov2WithRegistersModel

    tcfg = Dinov2WithRegistersConfig(
        hidden_size=C, num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        intermediate_size=4 * C, image_size=SIZE, patch_size=14,
        num_register_tokens=REG, layerscale_value=0.3,
    )
    tmod = Dinov2WithRegistersModel(tcfg).eval()

    sd = tmod.state_dict()
    layers = [tmod.encoder.layer[i] for i in range(LAYERS)]

    def qkv_kernel(layer):
        att = layer.attention.attention
        # (C, 3C): columns [q | k | v], each (heads*head_dim) in row order.
        return np.concatenate(
            [att.query.weight.detach().numpy().T,
             att.key.weight.detach().numpy().T,
             att.value.weight.detach().numpy().T], axis=1)

    def qkv_bias(layer):
        att = layer.attention.attention
        return np.concatenate(
            [att.query.bias.detach().numpy(),
             att.key.bias.detach().numpy(),
             att.value.bias.detach().numpy()])

    pos = sd["embeddings.position_embeddings"].detach().numpy()[0]  # (1+P, C)
    dino_params = {
        "patch_embed": {
            "kernel": sd["embeddings.patch_embeddings.projection.weight"]
                .detach().numpy().transpose(2, 3, 1, 0),
            "bias": sd["embeddings.patch_embeddings.projection.bias"].detach().numpy(),
        },
        "pos_embed": pos[1:],
        "pos_embed_cls": pos[:1],
        "dino_cls_token": sd["embeddings.cls_token"].detach().numpy()[0],
        "dino_register_tokens": sd["embeddings.register_tokens"].detach().numpy()[0],
        "dino_blocks": {"block": {
            "norm1": {"scale": _stack([l.norm1.weight for l in layers]),
                      "bias": _stack([l.norm1.bias for l in layers])},
            "qkv": {"kernel": np.stack([qkv_kernel(l) for l in layers]),
                    "bias": np.stack([qkv_bias(l) for l in layers])},
            "proj": {"kernel": _stack(
                        [l.attention.output.dense.weight for l in layers]
                     ).transpose(0, 2, 1),
                     "bias": _stack([l.attention.output.dense.bias for l in layers])},
            "ls1": _stack([l.layer_scale1.lambda1 for l in layers]),
            "norm2": {"scale": _stack([l.norm2.weight for l in layers]),
                      "bias": _stack([l.norm2.bias for l in layers])},
            "fc1": {"kernel": _stack([l.mlp.fc1.weight for l in layers]).transpose(0, 2, 1),
                    "bias": _stack([l.mlp.fc1.bias for l in layers])},
            "fc2": {"kernel": _stack([l.mlp.fc2.weight for l in layers]).transpose(0, 2, 1),
                    "bias": _stack([l.mlp.fc2.bias for l in layers])},
            "ls2": _stack([l.layer_scale2.lambda1 for l in layers]),
        }},
        "dino_norm": {"scale": sd["layernorm.weight"].detach().numpy(),
                      "bias": sd["layernorm.bias"].detach().numpy()},
    }

    model = Aggregator(AggregatorConfig(
        embed_dim=C, num_heads=HEADS, patch_encoder_depth=LAYERS,
        dino_num_register_tokens=REG, base_patch_hw=(SIZE // 14, SIZE // 14),
        # alternating trunk unused under dino_features_only; keep tiny
        depth=4, output_layers=(0, 1, 2, 3), num_register_tokens=2,
    ))

    rng = np.random.default_rng(0)
    x = rng.uniform(0.0, 1.0, size=(1, 1, SIZE, SIZE, 3)).astype(np.float32)

    # Ours normalizes with ImageNet mean/std inside; transformers expects
    # pre-normalized input.
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    t_in = torch.from_numpy(
        ((x[0] - mean) / std).transpose(0, 3, 1, 2))

    with torch.no_grad():
        t_hidden = tmod(t_in).last_hidden_state.numpy()  # (1, 1+R+P, C)
    t_patches = t_hidden[:, 1 + REG:]

    params = {"params": jax.tree.map(jnp.asarray, dino_params)}
    with jax.default_matmul_precision("highest"):
        j_patches, patch_hw = model.apply(
            params, jnp.asarray(x), dino_features_only=True)

    assert patch_hw == (5, 5)
    np.testing.assert_allclose(
        np.asarray(j_patches), t_patches, rtol=2e-3, atol=2e-4)
