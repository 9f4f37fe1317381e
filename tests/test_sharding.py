"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evoworld_tpu.parallel.mesh import make_mesh, shard_params_tp


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(jax.devices()[:8], model=2)


class TestMesh:
    def test_mesh_shape(self, mesh8):
        assert dict(mesh8.shape) == {"data": 4, "model": 2}

    def test_tp_sharding_rule(self, mesh8):
        params = {
            "big": jnp.zeros((512, 512)),
            "small": jnp.zeros((4, 4)),
            "odd": jnp.zeros((512, 513)),
        }
        sh = shard_params_tp(params, mesh8, min_size=1 << 10)
        assert sh["big"].spec == jax.sharding.PartitionSpec(None, "model")
        assert sh["small"].spec == jax.sharding.PartitionSpec()
        assert sh["odd"].spec == jax.sharding.PartitionSpec()


class TestShardedPipeline:
    def test_frame_sharded_generation(self, mesh8):
        """Full tiny pipeline with the frame axis sharded over 8 devices."""
        from evoworld_tpu.diffusion.pipeline import PipelineConfig, make_random_pipeline
        from evoworld_tpu.models.unet import UNetConfig
        from evoworld_tpu.models.vae import VAEConfig
        from evoworld_tpu.models.clip import CLIPVisionConfig

        mesh = make_mesh(jax.devices()[:8], model=1)
        cfg = PipelineConfig(height=64, width=128, num_frames=7, num_steps=2,
                             decode_chunk=7, encode_chunk=2)
        pipe = make_random_pipeline(
            cfg,
            unet_config=UNetConfig(block_out_channels=(32, 64, 128, 128), num_attention_heads=(2, 4, 8, 8)),
            vae_config=VAEConfig(block_out_channels=(32, 64, 128, 128)),
            clip_config=CLIPVisionConfig(hidden_size=64, num_layers=2, num_heads=4, mlp_dim=128),
            compute_dtype=jnp.float32,
            mesh=mesh,
        )
        frames = pipe(
            jnp.zeros((64, 128, 3)),
            jnp.zeros((7, 6, 8, 16)),
            jnp.zeros((7, 64, 128, 3)),
            jax.random.key(0),
            mask_mem=False,
        )
        assert frames.shape == (7, 64, 128, 3)
        assert np.isfinite(np.asarray(frames)).all()

    def test_sharded_matches_unsharded(self, mesh8):
        """Sharding must not change the numerics (same program, same rng)."""
        from evoworld_tpu.diffusion.pipeline import PipelineConfig, make_random_pipeline
        from evoworld_tpu.models.unet import UNetConfig
        from evoworld_tpu.models.vae import VAEConfig
        from evoworld_tpu.models.clip import CLIPVisionConfig

        cfg = PipelineConfig(height=64, width=128, num_frames=4, num_steps=2,
                             decode_chunk=4, encode_chunk=5)
        kwargs = dict(
            unet_config=UNetConfig(block_out_channels=(32, 64, 128, 128), num_attention_heads=(2, 4, 8, 8)),
            vae_config=VAEConfig(block_out_channels=(32, 64, 128, 128)),
            clip_config=CLIPVisionConfig(hidden_size=64, num_layers=2, num_heads=4, mlp_dim=128),
            compute_dtype=jnp.float32,
            seed=7,
        )
        mesh = make_mesh(jax.devices()[:4], model=1)
        args = (
            jnp.full((64, 128, 3), 0.1),
            jnp.zeros((4, 6, 8, 16)),
            jnp.zeros((4, 64, 128, 3)),
        )
        noise = jax.random.normal(jax.random.key(5), (4, 8, 16, 4))
        a = make_random_pipeline(cfg, **kwargs)(*args, jax.random.key(1), latents=noise)
        b = make_random_pipeline(cfg, mesh=mesh, **kwargs)(*args, jax.random.key(1), latents=noise)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)


class TestShardedLoop:
    def test_full_loop_sharded_matches_unsharded(self, mesh8):
        """The COMPOSED multi-chip loop: one `UnifiedLoop.run_episode` with the
        mesh wired into all three stages at once — frame-sharded generation
        (pipeline mesh), mesh VGGT reconstruction (head/ring-sharded global
        attention), and view-sharded splat rendering — must reproduce the
        single-device episode. Setup + tolerance gate are shared with the
        driver's 4th dryrun gate (evoworld_tpu/parallel/checks.py; reference
        driver: /root/reference/unified_loop_consistency.py:495-513)."""
        from evoworld_tpu.parallel.checks import (
            assert_episode_close, run_composed_loop,
        )

        ref, got = run_composed_loop(8)
        assert_episode_close(ref, got)


class TestZeRO2:
    def test_zero2_matches_unsharded_step(self, mesh8):
        """ZeRO-2 grad sharding must not change the update numerics."""
        from evoworld_tpu.models.unet import UNetSpatioTemporal, UNetConfig
        from evoworld_tpu.models.vae import AutoencoderKLTemporal, VAEConfig
        from evoworld_tpu.models.clip import CLIPVisionTower, CLIPVisionConfig
        from evoworld_tpu.train.train_step import (
            TrainConfig, TrainState, make_optimizer, make_sharded_train_step,
        )

        mesh = make_mesh(jax.devices()[:4], model=1)
        unet = UNetSpatioTemporal(UNetConfig(block_out_channels=(32, 64, 128, 128),
                                             num_attention_heads=(2, 4, 8, 8)))
        vae = AutoencoderKLTemporal(VAEConfig(block_out_channels=(32, 64, 128, 128)))
        clip_tower = CLIPVisionTower(CLIPVisionConfig(hidden_size=64, num_layers=2,
                                                      num_heads=4, mlp_dim=128))
        key = jax.random.key(0)
        f, h, w = 3, 64, 128
        unet_params = unet.init(
            key, jnp.zeros((1, f, h // 8, w // 8, 18)), jnp.asarray(1.0),
            jnp.zeros((1, 1, 1024)), jnp.zeros((1, 3)),
        )
        frozen = {
            "vae": vae.init(key, jnp.zeros((1, h, w, 3)), 1),
            "clip": clip_tower.init(key, jnp.zeros((1, 224, 224, 3))),
        }
        config = TrainConfig(total_steps=4, warmup_steps=1)
        optimizer = make_optimizer(config, unet_params)
        batch = {
            "pixel_values": jnp.full((4, f, h, w, 3), 0.1),
            "memory_values": jnp.zeros((4, f, h, w, 3)),
            "plucker": jnp.zeros((4, f, h // 8, w // 8, 6)),
        }

        results = []
        for kwargs in (dict(mesh=None), dict(mesh=mesh, zero_stage=2)):
            # Fresh buffers each round: the train step donates the state, so
            # reusing the same arrays would hit deleted buffers.
            params = jax.tree.map(jnp.copy, unet_params)
            state = TrainState(params, optimizer.init(params),
                               jnp.zeros((), jnp.int32))
            step = make_sharded_train_step(
                unet, vae, clip_tower, frozen, optimizer, config,
                compute_dtype=jnp.float32, **kwargs,
            )
            new_state, metrics = step(state, batch, jax.random.key(1))
            results.append((float(metrics["loss"]),
                            float(jnp.sum(jnp.abs(new_state.params["params"]["conv_in"]["kernel"])))))
        (loss_a, p_a), (loss_b, p_b) = results
        np.testing.assert_allclose(loss_a, loss_b, rtol=1e-4)
        np.testing.assert_allclose(p_a, p_b, rtol=1e-4)


class TestFrameShardedTraining:
    @pytest.mark.parametrize("f", [4, 5])
    def test_frame_sharded_matches_unsharded_step(self, mesh8, f):
        """shard_frames=True (sequence-parallel training, the bs-1
        reference-scale fit path — SCALING.md "Training sharding") must not
        change the update numerics: frames shard over "data", batch
        replicates, and the temporal-mix collectives GSPMD inserts must be
        exact. f=5 on the 4-device mesh is the UNEVEN case (the reference
        trains F=25, which no 2^k mesh divides): the frame axis is sharded
        by the step's internal with_sharding_constraint, which GSPMD pads."""
        from evoworld_tpu.models.unet import UNetSpatioTemporal, UNetConfig
        from evoworld_tpu.models.vae import AutoencoderKLTemporal, VAEConfig
        from evoworld_tpu.models.clip import CLIPVisionTower, CLIPVisionConfig
        from evoworld_tpu.train.train_step import (
            TrainConfig, TrainState, make_optimizer, make_sharded_train_step,
        )

        mesh = make_mesh(jax.devices()[:4], model=1)
        unet = UNetSpatioTemporal(UNetConfig(block_out_channels=(32, 32, 64, 64),
                                             num_attention_heads=(1, 2, 4, 4),
                                             layers_per_block=1))
        vae = AutoencoderKLTemporal(VAEConfig(block_out_channels=(32, 32, 64, 64)))
        clip_tower = CLIPVisionTower(CLIPVisionConfig(hidden_size=64, num_layers=2,
                                                      num_heads=4, mlp_dim=128))
        key = jax.random.key(0)
        h, w = 64, 128
        unet_params = unet.init(
            key, jnp.zeros((1, f, h // 8, w // 8, 18)), jnp.asarray(1.0),
            jnp.zeros((1, 1, 1024)), jnp.zeros((1, 3)),
        )
        frozen = {
            "vae": vae.init(key, jnp.zeros((1, h, w, 3)), 1),
            "clip": clip_tower.init(key, jnp.zeros((1, 224, 224, 3))),
        }
        config = TrainConfig(total_steps=4, warmup_steps=1)
        optimizer = make_optimizer(config, unet_params)
        batch = {
            "pixel_values": jnp.full((1, f, h, w, 3), 0.1),  # bs 1: batch
            "memory_values": jnp.zeros((1, f, h, w, 3)),     # sharding would
            "plucker": jnp.zeros((1, f, h // 8, w // 8, 6)),  # be a no-op
        }

        results = []
        for kwargs in (dict(mesh=None), dict(mesh=mesh, shard_frames=True)):
            params = jax.tree.map(jnp.copy, unet_params)
            state = TrainState(params, optimizer.init(params),
                               jnp.zeros((), jnp.int32))
            step = make_sharded_train_step(
                unet, vae, clip_tower, frozen, optimizer, config,
                compute_dtype=jnp.float32, **kwargs,
            )
            new_state, metrics = step(state, batch, jax.random.key(1))
            results.append((float(metrics["loss"]),
                            float(jnp.sum(jnp.abs(new_state.params["params"]["conv_in"]["kernel"])))))
        (loss_a, p_a), (loss_b, p_b) = results
        np.testing.assert_allclose(loss_a, loss_b, rtol=1e-4)
        np.testing.assert_allclose(p_a, p_b, rtol=1e-4)


class TestShardedSplat:
    def test_view_sharded_render_matches(self, mesh8):
        """render_memory_panoramas(mesh=...) — the T independent z-buffer
        renders shard over the mesh (cloud replicated) — must reproduce the
        single-device output, including when T does not divide the device
        count (pose padding path: T=5 on 8 devices)."""
        from evoworld_tpu.memory.render import render_memory_panoramas

        rng = np.random.default_rng(0)
        n = 4096
        points = jnp.asarray(rng.standard_normal((n, 3)) * 2.0, jnp.float32)
        colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
        valid = jnp.asarray(rng.uniform(0, 1, (n,)) > 0.1)
        for t in (8, 5):
            ang = np.linspace(0, 2 * np.pi, t, endpoint=False)
            c2w = np.zeros((t, 3, 4), np.float32)
            c2w[:, 0, 0] = np.cos(ang); c2w[:, 0, 2] = np.sin(ang)
            c2w[:, 1, 1] = 1.0
            c2w[:, 2, 0] = -np.sin(ang); c2w[:, 2, 2] = np.cos(ang)
            c2w[:, :, 3] = rng.standard_normal((t, 3)).astype(np.float32) * 0.1
            c2w = jnp.asarray(c2w)
            ref = render_memory_panoramas(points, colors, valid, c2w, 40, 80)
            got = render_memory_panoramas(points, colors, valid, c2w, 40, 80,
                                          mesh=mesh8)
            assert got.shape == (t, 40, 80, 3)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)
