"""DreamSim tests: single-branch dino_vitb16 and the 3-branch ensemble."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evoworld_tpu.eval.dreamsim import (
    DinoViT,
    DreamSim,
    DreamSimEnsemble,
    convert_dino_state_dict,
    convert_openai_clip_visual,
    make_dreamsim,
    openai_to_transformers_clip,
)


def _synthetic_dino_state_dict(dim=32, depth=2, heads=4, patch=16, grid=4, seed=0):
    rng = np.random.default_rng(seed)
    sd = {
        "cls_token": rng.normal(size=(1, 1, dim)),
        "mask_token": rng.normal(size=(1, dim)),
        "pos_embed": rng.normal(size=(1, 1 + grid * grid, dim)),
        "patch_embed.proj.weight": rng.normal(size=(dim, 3, patch, patch)),
        "patch_embed.proj.bias": rng.normal(size=(dim,)),
        "norm.weight": rng.normal(size=(dim,)),
        "norm.bias": rng.normal(size=(dim,)),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        sd.update({
            f"{p}.norm1.weight": rng.normal(size=(dim,)),
            f"{p}.norm1.bias": rng.normal(size=(dim,)),
            f"{p}.attn.qkv.weight": rng.normal(size=(3 * dim, dim)),
            f"{p}.attn.qkv.bias": rng.normal(size=(3 * dim,)),
            f"{p}.attn.proj.weight": rng.normal(size=(dim, dim)),
            f"{p}.attn.proj.bias": rng.normal(size=(dim,)),
            f"{p}.norm2.weight": rng.normal(size=(dim,)),
            f"{p}.norm2.bias": rng.normal(size=(dim,)),
            f"{p}.mlp.fc1.weight": rng.normal(size=(4 * dim, dim)),
            f"{p}.mlp.fc1.bias": rng.normal(size=(4 * dim,)),
            f"{p}.mlp.fc2.weight": rng.normal(size=(dim, 4 * dim)),
            f"{p}.mlp.fc2.bias": rng.normal(size=(dim,)),
        })
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


class TestDinoConverter:
    def test_roundtrip_structure(self):
        sd = _synthetic_dino_state_dict()
        params, report = convert_dino_state_dict(sd)
        assert report == [], report[:8]
        model = DinoViT(embed_dim=32, depth=2, num_heads=4)
        want = jax.eval_shape(
            lambda k: model.init(k, jnp.zeros((1, 64, 64, 3))), jax.random.key(0)
        )

        def flat(tree, prefix=""):
            out = {}
            for k, v in tree.items():
                p = f"{prefix}/{k}" if prefix else k
                out.update(flat(v, p)) if isinstance(v, dict) else out.update({p: tuple(v.shape)})
            return out

        got, exp = flat(params["params"]), flat(want["params"])
        assert set(got) == set(exp), (sorted(set(exp) - set(got))[:6],
                                      sorted(set(got) - set(exp))[:6])
        for k in exp:
            assert got[k] == exp[k], (k, got[k], exp[k])
        out = model.apply(jax.tree.map(jnp.asarray, params), jnp.ones((2, 64, 64, 3)) * 0.2)
        assert out.shape == (2, 32) and np.isfinite(np.asarray(out)).all()


class TestDreamSimScore:
    def test_identical_zero_and_symmetry(self):
        rng = np.random.default_rng(0)
        model = DreamSim()
        a = rng.uniform(size=(1, 48, 48, 3)).astype(np.float32)
        b = rng.uniform(size=(1, 48, 48, 3)).astype(np.float32)
        assert abs(float(model(a, a)[0])) < 1e-5
        d_ab, d_ba = float(model(a, b)[0]), float(model(b, a)[0])
        assert abs(d_ab - d_ba) < 1e-5
        assert 0.0 <= d_ab <= 2.0


def _synthetic_openai_clip_state_dict(dim=32, depth=2, patch=8, image=32,
                                      proj=48, seed=1):
    rng = np.random.default_rng(seed)
    grid = image // patch
    sd = {
        "visual.conv1.weight": rng.normal(size=(dim, 3, patch, patch)),
        "visual.class_embedding": rng.normal(size=(dim,)),
        "visual.positional_embedding": rng.normal(size=(1 + grid * grid, dim)),
        "visual.ln_pre.weight": rng.normal(size=(dim,)),
        "visual.ln_pre.bias": rng.normal(size=(dim,)),
        "visual.ln_post.weight": rng.normal(size=(dim,)),
        "visual.ln_post.bias": rng.normal(size=(dim,)),
        "visual.proj": rng.normal(size=(dim, proj)),
        "logit_scale": np.zeros(()),  # non-visual keys must be ignored
        "text_projection": rng.normal(size=(8, 8)),
    }
    for i in range(depth):
        p = f"visual.transformer.resblocks.{i}"
        sd.update({
            f"{p}.ln_1.weight": rng.normal(size=(dim,)),
            f"{p}.ln_1.bias": rng.normal(size=(dim,)),
            f"{p}.attn.in_proj_weight": rng.normal(size=(3 * dim, dim)),
            f"{p}.attn.in_proj_bias": rng.normal(size=(3 * dim,)),
            f"{p}.attn.out_proj.weight": rng.normal(size=(dim, dim)),
            f"{p}.attn.out_proj.bias": rng.normal(size=(dim,)),
            f"{p}.ln_2.weight": rng.normal(size=(dim,)),
            f"{p}.ln_2.bias": rng.normal(size=(dim,)),
            f"{p}.mlp.c_fc.weight": rng.normal(size=(4 * dim, dim)),
            f"{p}.mlp.c_fc.bias": rng.normal(size=(4 * dim,)),
            f"{p}.mlp.c_proj.weight": rng.normal(size=(dim, 4 * dim)),
            f"{p}.mlp.c_proj.bias": rng.normal(size=(dim,)),
        })
    return {k: np.asarray(v, np.float32) * 0.05 for k, v in sd.items()}


class TestOpenAICLIPConverter:
    def test_parity_vs_transformers_quick_gelu(self):
        """Non-circular: the OpenAI-named dict loads into transformers'
        CLIPVisionModelWithProjection (quick_gelu) AND converts into our
        tower; outputs must match numerically."""
        torch = pytest.importorskip("torch")
        from transformers import CLIPVisionConfig as HFConfig
        from transformers import CLIPVisionModelWithProjection

        from evoworld_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower

        sd = _synthetic_openai_clip_state_dict()
        remapped, report = openai_to_transformers_clip(sd)
        assert report == [], report[:6]

        hf_cfg = HFConfig(
            hidden_size=32, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8,
            projection_dim=48, hidden_act="quick_gelu", layer_norm_eps=1e-5,
        )
        hf_model = CLIPVisionModelWithProjection(hf_cfg).eval()
        missing, unexpected = hf_model.load_state_dict(
            {k: torch.tensor(v) for k, v in remapped.items()}, strict=False
        )
        assert not unexpected, unexpected
        assert all("position_ids" in k for k in missing), missing

        x = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            want = hf_model(torch.tensor(x)).image_embeds.numpy()

        params, report = convert_openai_clip_visual(sd)
        assert report == [], report[:6]
        tower = CLIPVisionTower(CLIPVisionConfig(
            image_size=32, patch_size=8, hidden_size=32, num_layers=2,
            num_heads=4, mlp_dim=128, projection_dim=48,
            hidden_act="quick_gelu",
        ))
        got = np.asarray(tower.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got, want, atol=2e-4)


class TestDinoViTParityVsTransformers:
    def test_cls_embedding_matches_vit_model(self):
        """Non-circular: a transformers ViTModel (DINO v1 is a stock pre-norm
        ViT, eps 1e-6) is the golden. Its state dict renames mechanically to
        facebook-DINO naming (qkv = [q;k;v] concat), runs through
        convert_dino_state_dict, and our DinoViT must reproduce the CLS
        embedding of the final layernorm output."""
        torch = pytest.importorskip("torch")
        from transformers import ViTConfig, ViTModel

        dim, depth, heads, patch, image = 32, 2, 4, 16, 64
        cfg = ViTConfig(
            hidden_size=dim, num_hidden_layers=depth, num_attention_heads=heads,
            intermediate_size=4 * dim, image_size=image, patch_size=patch,
            hidden_act="gelu", layer_norm_eps=1e-6,
        )
        torch.manual_seed(0)
        hf = ViTModel(cfg, add_pooling_layer=False).eval()

        x = np.random.default_rng(0).normal(size=(2, 3, image, image)).astype(np.float32) * 0.5
        with torch.no_grad():
            want = hf(torch.tensor(x)).last_hidden_state[:, 0].numpy()

        sd = {k: v.numpy() for k, v in hf.state_dict().items()}
        renamed = {
            "cls_token": sd["embeddings.cls_token"],
            "pos_embed": sd["embeddings.position_embeddings"],
            "patch_embed.proj.weight": sd["embeddings.patch_embeddings.projection.weight"],
            "patch_embed.proj.bias": sd["embeddings.patch_embeddings.projection.bias"],
            "norm.weight": sd["layernorm.weight"],
            "norm.bias": sd["layernorm.bias"],
        }
        for i in range(depth):
            p, d = f"encoder.layer.{i}", f"blocks.{i}"
            att = f"{p}.attention.attention"
            renamed[f"{d}.attn.qkv.weight"] = np.concatenate(
                [sd[f"{att}.{n}.weight"] for n in ("query", "key", "value")], axis=0
            )
            renamed[f"{d}.attn.qkv.bias"] = np.concatenate(
                [sd[f"{att}.{n}.bias"] for n in ("query", "key", "value")], axis=0
            )
            renamed[f"{d}.attn.proj.weight"] = sd[f"{p}.attention.output.dense.weight"]
            renamed[f"{d}.attn.proj.bias"] = sd[f"{p}.attention.output.dense.bias"]
            renamed[f"{d}.norm1.weight"] = sd[f"{p}.layernorm_before.weight"]
            renamed[f"{d}.norm1.bias"] = sd[f"{p}.layernorm_before.bias"]
            renamed[f"{d}.norm2.weight"] = sd[f"{p}.layernorm_after.weight"]
            renamed[f"{d}.norm2.bias"] = sd[f"{p}.layernorm_after.bias"]
            renamed[f"{d}.mlp.fc1.weight"] = sd[f"{p}.intermediate.dense.weight"]
            renamed[f"{d}.mlp.fc1.bias"] = sd[f"{p}.intermediate.dense.bias"]
            renamed[f"{d}.mlp.fc2.weight"] = sd[f"{p}.output.dense.weight"]
            renamed[f"{d}.mlp.fc2.bias"] = sd[f"{p}.output.dense.bias"]

        params, report = convert_dino_state_dict(renamed)
        assert report == [], report[:6]

        model = DinoViT(embed_dim=dim, depth=depth, num_heads=heads, patch_size=patch)
        with jax.default_matmul_precision("highest"):
            got = np.asarray(model.apply(
                jax.tree.map(jnp.asarray, params), jnp.asarray(x.transpose(0, 2, 3, 1))
            ))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-4)


class TestDreamSimEnsemble:
    def test_embed_dim_and_score_properties(self):
        rng = np.random.default_rng(0)
        model = DreamSimEnsemble()
        a = rng.uniform(size=(1, 48, 48, 3)).astype(np.float32)
        b = rng.uniform(size=(1, 48, 48, 3)).astype(np.float32)
        emb = model.embed(a)
        assert emb.shape == (1, 768 + 512 + 512)
        # Each branch contributes an L2-normalized slice.
        for lo, hi in ((0, 768), (768, 1280), (1280, 1792)):
            np.testing.assert_allclose(
                np.linalg.norm(emb[:, lo:hi], axis=-1), 1.0, atol=1e-5
            )
        assert abs(float(model(a, a)[0])) < 1e-5
        d_ab, d_ba = float(model(a, b)[0]), float(model(b, a)[0])
        assert abs(d_ab - d_ba) < 1e-5
        assert 0.0 <= d_ab <= 2.0

    def test_factory_variants(self):
        assert isinstance(make_dreamsim("dino_vitb16"), DreamSim)
        assert isinstance(make_dreamsim("ensemble"), DreamSimEnsemble)
        with pytest.raises(ValueError):
            make_dreamsim("nope")
