"""Golden-stat regression anchors for the diffusion pipeline numerics.

Committed per-stage statistics (mean/std/min/max + a strided value sample)
of deterministic random-weight pipeline runs, asserted against
tests/golden/pipeline_anchors.json. Perf work on the hot path (attention
routing, layout experiments, scheduler/guidance math) cannot silently shift
numerics: a deliberate one-line change to the guidance linspace or the Euler
step fails these within-tolerance checks (test strategy: SURVEY.md §4; the
anchored math mirrors /root/reference/evoworld/pipeline/
pipeline_evoworld.py:456-741).

Regenerate after an INTENTIONAL numerics change with:
    python tests/test_golden_anchors.py --write
and include the regenerated JSON (plus the reason) in the same commit.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "pipeline_anchors.json")

# Stats compare at 1e-3 relative: loose enough for XLA reduction-order /
# version drift in fp32, tight enough that any real math change (guidance
# scale, sigma schedule, CFG combine, VAE scaling) lands far outside it.
RTOL = 1e-3
ATOL = 1e-4


def _build(config_name: str):
    from evoworld_tpu.diffusion.pipeline import PipelineConfig, make_random_pipeline
    from evoworld_tpu.models.clip import CLIPVisionConfig
    from evoworld_tpu.models.unet import UNetConfig
    from evoworld_tpu.models.vae import VAEConfig

    if config_name == "tiny":
        cfg = PipelineConfig(height=64, width=128, num_frames=5, num_steps=3,
                             decode_chunk=5, encode_chunk=2)
        pipe = make_random_pipeline(
            cfg,
            unet_config=UNetConfig(block_out_channels=(32, 64, 128, 128),
                                   num_attention_heads=(2, 4, 8, 8)),
            vae_config=VAEConfig(block_out_channels=(32, 64, 128, 128)),
            clip_config=CLIPVisionConfig(hidden_size=64, num_layers=2,
                                         num_heads=4, mlp_dim=128),
            compute_dtype=jnp.float32,
            seed=11,
        )
    elif config_name == "full_arch":
        # The FULL production architecture (1.5B UNet / temporal VAE / CLIP-H
        # shapes) at reduced spatial/temporal extent: anchors the exact math
        # that bench.py times on the chip, at a cost a CPU test can pay.
        cfg = PipelineConfig(height=64, width=128, num_frames=2, num_steps=2,
                             decode_chunk=2, encode_chunk=3)
        pipe = make_random_pipeline(cfg, compute_dtype=jnp.float32, seed=11)
    else:  # pragma: no cover
        raise ValueError(config_name)
    return pipe, cfg


def _stage_stats(x, n_samples: int = 32) -> dict:
    flat = np.asarray(x, np.float64).ravel()
    stride = max(1, flat.size // n_samples)
    return {
        "shape": list(np.shape(x)),
        "mean": float(flat.mean()),
        "std": float(flat.std()),
        "min": float(flat.min()),
        "max": float(flat.max()),
        "samples": [float(v) for v in flat[::stride][:n_samples]],
    }


def compute_anchors(config_name: str) -> dict:
    pipe, cfg = _build(config_name)
    f, h, w = cfg.num_frames, cfg.height, cfg.width
    lh, lw = cfg.latent_height, cfg.latent_width

    # Deterministic structured inputs (gradients, not zeros, so every
    # conditioning channel contributes).
    yy = np.linspace(-1, 1, h, dtype=np.float32)[:, None, None]
    xx = np.linspace(-1, 1, w, dtype=np.float32)[None, :, None]
    image = jnp.asarray(yy * 0.5 + xx * 0.3 + np.array([0.0, 0.1, -0.1], np.float32))
    memory = jnp.stack([image * (0.5 + 0.1 * i) for i in range(f)], 0)
    plucker = jnp.asarray(
        np.linspace(-0.5, 0.5, f * 6 * lh * lw, dtype=np.float32).reshape(f, 6, lh, lw)
    )
    latents = jax.random.normal(jax.random.key(42), (f, lh, lw, 4), jnp.float32)
    mask_flag = jnp.asarray(0.0, jnp.float32)

    context_cfg, cond_cfg = pipe._encode(
        pipe.params, image, plucker, memory, mask_flag, jax.random.key(7)
    )
    denoised = pipe._denoise(pipe.params, latents, context_cfg, cond_cfg)
    frames = pipe._decode(pipe.params, denoised)
    return {
        "encode_context": _stage_stats(context_cfg),
        "encode_cond": _stage_stats(cond_cfg),
        "denoise_latents": _stage_stats(denoised),
        "decode_frames": _stage_stats(frames),
    }


def _assert_matches(got: dict, want: dict, label: str):
    assert got["shape"] == want["shape"], f"{label}: shape {got['shape']} != {want['shape']}"
    for key_ in ("mean", "std", "min", "max"):
        np.testing.assert_allclose(
            got[key_], want[key_], rtol=RTOL, atol=ATOL,
            err_msg=f"{label}.{key_} drifted — if intentional, regenerate with "
                    f"`python tests/test_golden_anchors.py --write`",
        )
    np.testing.assert_allclose(
        got["samples"], want["samples"], rtol=RTOL, atol=ATOL,
        err_msg=f"{label}.samples drifted",
    )


def _load_golden() -> dict:
    if not os.path.exists(GOLDEN_PATH):
        pytest.fail(f"golden anchors missing at {GOLDEN_PATH}; run "
                    f"`python tests/test_golden_anchors.py --write`")
    with open(GOLDEN_PATH) as fh:
        return json.load(fh)


class TestGoldenAnchors:
    def test_tiny_pipeline_anchor(self):
        golden = _load_golden()["tiny"]
        got = compute_anchors("tiny")
        for stage, want in golden.items():
            _assert_matches(got[stage], want, f"tiny.{stage}")

    @pytest.mark.slow
    def test_full_arch_pipeline_anchor(self):
        golden = _load_golden()["full_arch"]
        got = compute_anchors("full_arch")
        for stage, want in golden.items():
            _assert_matches(got[stage], want, f"full_arch.{stage}")


if __name__ == "__main__":
    if "--write" not in sys.argv:
        raise SystemExit("usage: python tests/test_golden_anchors.py --write")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    jax.config.update("jax_platforms", "cpu")
    out = {name: compute_anchors(name) for name in ("tiny", "full_arch")}
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {GOLDEN_PATH}")
