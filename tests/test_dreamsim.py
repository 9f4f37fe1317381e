"""DreamSim (single-branch dino_vitb16 variant) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from evoworld_tpu.eval.dreamsim import DinoViT, DreamSim, convert_dino_state_dict


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
