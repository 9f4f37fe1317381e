"""End-to-end integration test (SURVEY.md §4d): generate a clip on the real
example episode with reduced steps, score it with the metric harness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_pipeline():
    from evoworld_tpu.diffusion.pipeline import PipelineConfig, make_random_pipeline
    from evoworld_tpu.models.clip import CLIPVisionConfig
    from evoworld_tpu.models.unet import UNetConfig
    from evoworld_tpu.models.vae import VAEConfig

    cfg = PipelineConfig(height=64, width=128, num_frames=5, num_steps=2,
                         decode_chunk=5, encode_chunk=2)
    return make_random_pipeline(
        cfg,
        unet_config=UNetConfig(block_out_channels=(32, 64, 128, 128), num_attention_heads=(2, 4, 8, 8)),
        vae_config=VAEConfig(block_out_channels=(32, 64, 128, 128)),
        clip_config=CLIPVisionConfig(hidden_size=64, num_layers=2, num_heads=4, mlp_dim=128),
        compute_dtype=jnp.float32,
    )


class TestEndToEnd:
    def test_generate_and_score_example_episode(self, example_episode, tiny_pipeline):
        from evoworld_tpu.data.dataset import EpisodeDataset
        from evoworld_tpu.eval.metrics import batch_video_metrics
        from evoworld_tpu.loop.navigator import Navigator

        dataset = EpisodeDataset(
            example_episode, height=64, width=128, sequence_length=5,
            single_episode=True,
        )
        sample = dataset[0]
        navigator = Navigator(tiny_pipeline, num_frames=5)
        frames = navigator.generate_segment(
            sample.cam_traj[:5],
            jnp.asarray(sample.pixel_values[0]),
            jnp.asarray(sample.memory_values[:5]),
            jax.random.key(0),
            use_memory=True,
        )
        assert frames.shape == (5, 64, 128, 3)
        gen = np.asarray(frames)[None]
        gt = np.clip(sample.pixel_values[:5] / 2 + 0.5, 0, 1)[None]
        scores = batch_video_metrics(gen, gt)
        # Random weights: only sanity bounds, but the full path must produce
        # finite, in-range outputs and a finite score.
        assert np.isfinite(scores["psnr"]) and scores["psnr"] > 0
        assert -1.0 <= scores["ssim"] <= 1.0

    def test_determinism(self, tiny_pipeline):
        img = jnp.zeros((64, 128, 3))
        plk = jnp.zeros((5, 6, 8, 16))
        mem = jnp.zeros((5, 64, 128, 3))
        a = tiny_pipeline(img, plk, mem, jax.random.key(7))
        b = tiny_pipeline(img, plk, mem, jax.random.key(7))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # Different noise must change the denoised latents (clipped frames
        # can saturate identically under random weights, so compare latents).
        ctx, cond = tiny_pipeline._encode(tiny_pipeline.params, img, plk, mem, jnp.asarray(0.0), jax.random.key(0))
        n1 = jax.random.normal(jax.random.key(1), (5, 8, 16, 4))
        n2 = jax.random.normal(jax.random.key(2), (5, 8, 16, 4))
        d1 = tiny_pipeline._denoise(tiny_pipeline.params, n1, ctx, cond)
        d2 = tiny_pipeline._denoise(tiny_pipeline.params, n2, ctx, cond)
        assert not np.allclose(np.asarray(d1), np.asarray(d2))


class TestConditioningSemantics:
    def test_mask_mem_blocks_memory_influence(self, tiny_pipeline):
        """With mask_mem=True the memory frames must not affect the output
        (reference zeroes image_latents[:, 1:], pipeline_evoworld.py:629-631)."""
        img = jnp.zeros((64, 128, 3))
        plk = jnp.zeros((5, 6, 8, 16))
        mem_a = jnp.zeros((5, 64, 128, 3))
        mem_b = jnp.ones((5, 64, 128, 3)) * 0.7
        noise = jax.random.normal(jax.random.key(3), (5, 8, 16, 4))
        # Same rng so the cond-frame noise augmentation matches.
        a = tiny_pipeline(img, plk, mem_a, jax.random.key(9), mask_mem=True, latents=noise)
        b = tiny_pipeline(img, plk, mem_b, jax.random.key(9), mask_mem=True, latents=noise)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_memory_influences_when_unmasked(self, tiny_pipeline):
        img = jnp.zeros((64, 128, 3))
        plk = jnp.zeros((5, 6, 8, 16))
        mem_a = jnp.zeros((5, 64, 128, 3))
        mem_b = jnp.ones((5, 64, 128, 3)) * 0.7
        noise = jax.random.normal(jax.random.key(3), (5, 8, 16, 4))
        ca, conda = tiny_pipeline._encode(tiny_pipeline.params, img, plk, mem_a, jnp.asarray(0.0), jax.random.key(9))
        cb, condb = tiny_pipeline._encode(tiny_pipeline.params, img, plk, mem_b, jnp.asarray(0.0), jax.random.key(9))
        da = tiny_pipeline._denoise(tiny_pipeline.params, noise, ca, conda)
        db = tiny_pipeline._denoise(tiny_pipeline.params, noise, cb, condb)
        assert not np.allclose(np.asarray(da), np.asarray(db), atol=1e-5)
