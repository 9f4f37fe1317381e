"""Memory subsystem + unified loop tests (stub reconstructor; SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from evoworld_tpu.geometry.rays import equirect_ray_grid
from evoworld_tpu.memory.pointcloud import confidence_mask, scene_scale
from evoworld_tpu.memory.render import align_target_poses, render_memory_panoramas
from evoworld_tpu.ops.splat import splat_points_to_pano


class TestPointFilter:
    def test_percentile_mask(self):
        conf = jnp.asarray(np.arange(100, dtype=np.float32))
        mask = np.asarray(confidence_mask(conf, 50.0))
        assert mask.sum() == 50  # >= interpolated median (49.5)
        assert np.asarray(confidence_mask(conf, 0.0)).all()

    def test_scene_scale_masked(self):
        pts = jnp.asarray(np.random.default_rng(0).normal(size=(1000, 3)).astype(np.float32))
        s = float(scene_scale(pts))
        assert 1.0 < s < 10.0
        # Scaling points scales the scene scale.
        s2 = float(scene_scale(pts * 3.0))
        np.testing.assert_allclose(s2, 3 * s, rtol=1e-3)


class TestSplat:
    def test_occlusion_nearest_wins(self):
        # Two points along the same ray: near red, far blue.
        pts = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, 5.0]])
        cols = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        pano, depth, mask = splat_points_to_pano(pts, cols, jnp.eye(4)[:3], 64, 128)
        center = np.asarray(pano[32, 64])
        np.testing.assert_allclose(center, [1.0, 0.0, 0.0], atol=1e-6)
        assert abs(float(depth[32, 64]) - 2.0) < 1e-5

    def test_valid_mask_drops_points(self):
        pts = jnp.asarray([[0.0, 0.0, 2.0]])
        cols = jnp.asarray([[1.0, 0.0, 0.0]])
        pano, _, mask = splat_points_to_pano(
            pts, cols, jnp.eye(4)[:3], 16, 32, valid=jnp.asarray([False])
        )
        assert not bool(np.asarray(mask).any())

    def test_sphere_roundtrip(self):
        # Generic (non-grid-aligned) sphere points reproject to their pixels.
        rng = np.random.default_rng(0)
        h, w = 50, 100
        lon = rng.uniform(-np.pi * 0.98, np.pi * 0.98, 5000)
        lat = rng.uniform(-1.2, 1.2, 5000)
        d = np.stack([np.cos(lat) * np.sin(lon), np.sin(lat), np.cos(lat) * np.cos(lon)], -1)
        cols = rng.uniform(size=(5000, 3)).astype(np.float32)
        pano, depth, mask = splat_points_to_pano(
            jnp.asarray(d * 4.0), jnp.asarray(cols), jnp.eye(4)[:3], h, w
        )
        m = np.asarray(mask)
        assert m.mean() > 0.5
        np.testing.assert_allclose(np.asarray(depth)[m].max(), 4.0, atol=1e-4)


class TestAlignment:
    def test_align_identity_when_pred_equals_gt(self):
        rng = np.random.default_rng(1)
        n = 80
        centers = np.cumsum(rng.normal(size=(n, 3), scale=0.1), 0).astype(np.float32)
        gt = np.tile(np.eye(4, dtype=np.float32)[:3], (n, 1, 1))
        gt[:, :, 3] = centers
        # Pred extrinsics = inverse of gt c2w (w2c with R=I -> t = -center).
        pred_w2c = gt.copy()
        pred_w2c[:, :, 3] = -centers
        # Pred frames cover exactly the GT rows up to target_start (=25 at
        # segment 0), matching the loop invariant.
        targets = align_target_poses(jnp.asarray(gt), jnp.asarray(pred_w2c[:25]), segment_id=0)
        want = gt[25:49]
        np.testing.assert_allclose(np.asarray(targets), want, atol=1e-3)


class TestUnifiedLoop:
    def test_three_segment_loop_with_stub(self):
        """End-to-end loop on tiny shapes with a geometric stub reconstructor."""
        from evoworld_tpu.diffusion.pipeline import PipelineConfig, make_random_pipeline
        from evoworld_tpu.models.unet import UNetConfig
        from evoworld_tpu.models.vae import VAEConfig
        from evoworld_tpu.models.clip import CLIPVisionConfig
        from evoworld_tpu.loop.navigator import Navigator
        from evoworld_tpu.loop.unified import UnifiedLoop, LoopConfig

        f = 5
        cfg = PipelineConfig(height=64, width=128, num_frames=f, num_steps=2, decode_chunk=5, encode_chunk=2)
        pipe = make_random_pipeline(
            cfg,
            unet_config=UNetConfig(block_out_channels=(32, 64, 128, 128), num_attention_heads=(2, 4, 8, 8)),
            vae_config=VAEConfig(block_out_channels=(32, 64, 128, 128)),
            clip_config=CLIPVisionConfig(hidden_size=64, num_layers=2, num_heads=4, mlp_dim=128),
            compute_dtype=jnp.float32,
        )
        nav = Navigator(pipe, num_frames=f)

        def stub_reconstructor(pers):
            """Unit-sphere cloud + identity-ish cameras."""
            s = pers.shape[0]
            h, w = 12, 16
            rays = equirect_ray_grid(h, w)
            pts = jnp.broadcast_to(rays[None] * 3.0, (s, h, w, 3))
            return {
                "world_points": pts,
                "conf": jnp.ones((s, h, w)),
                "extrinsic": jnp.broadcast_to(jnp.eye(4)[:3], (s, 3, 4)),
                "colors": jnp.ones((s, h, w, 3)) * 0.5,
            }

        # Loop config scaled down: 5-frame clips, 4 target views.
        loop = UnifiedLoop(
            nav, stub_reconstructor,
            LoopConfig(num_segments=3, num_frames=f, num_target_view=f - 1, pers_height=16, pers_width=24),
        )
        n_poses = 3 * (f - 1) + f + 5
        poses = np.zeros((n_poses, 6), np.float32)
        poses[:, 2] = np.arange(n_poses) * 0.4  # forward walk
        start = jnp.zeros((64, 128, 3))
        out = loop.run_episode(start, poses * 0.1, poses, jax.random.key(0))
        assert len(out["segments"]) == 3
        assert out["segments"][0].shape == (f, 64, 128, 3)
        assert out["segments"][1].shape == (f - 1, 64, 128, 3)
        assert len(out["memories"]) == 2
        assert out["memories"][0].shape == (f - 1, 64, 128, 3)
        for seg in out["segments"]:
            assert np.isfinite(np.asarray(seg)).all()


class TestSplatBruteForceParity:
    def test_matches_numpy_zbuffer(self):
        """Sort-based raster == brute-force z-buffer (random cloud, radius 2)."""
        rng = np.random.default_rng(3)
        n, h, w = 4000, 40, 80
        pts = rng.normal(size=(n, 3)).astype(np.float32) * 3.0
        cols = rng.uniform(size=(n, 3)).astype(np.float32)
        valid = rng.uniform(size=(n,)) > 0.2

        pano, depth, mask = splat_points_to_pano(
            jnp.asarray(pts), jnp.asarray(cols), jnp.eye(4)[:3], h, w,
            valid=jnp.asarray(valid), splat_radius=2,
        )

        # Brute force: project, per-pixel nearest point over the 2x2 footprint.
        d = np.linalg.norm(pts, axis=-1)
        dirs = pts / np.maximum(d, 1e-12)[:, None]
        lon = np.arctan2(dirs[:, 0], dirs[:, 2])
        lat = np.arcsin(np.clip(dirs[:, 1], -1, 1))
        u = np.floor((lon / (2 * np.pi) + 0.5) * w).astype(int) % w
        v = np.clip(np.floor((lat / np.pi + 0.5) * h).astype(int), 0, h - 1)
        zbuf = np.full((h, w), np.inf)
        cbuf = np.zeros((h, w, 3))
        order = np.argsort(d)   # nearest last so it wins ties deterministically
        for i in order[::-1]:
            if not valid[i]:
                continue
            for dy in (0, 1):
                for dx in (0, 1):
                    vv = min(v[i] + dy, h - 1)
                    uu = (u[i] + dx) % w
                    if d[i] <= zbuf[vv, uu]:
                        zbuf[vv, uu] = d[i]
                        cbuf[vv, uu] = cols[i]

        got_d = np.asarray(depth)
        # Depth agrees everywhere (the 10-bit log-depth quantization only
        # reorders points closer than ~1% in depth; compare with tolerance).
        both = np.isfinite(zbuf) & np.asarray(mask)
        assert (np.isfinite(zbuf) == np.asarray(mask)).all()
        np.testing.assert_allclose(got_d[both], zbuf[both], rtol=2e-2)
        # Colors agree wherever the winner is depth-unambiguous.
        exact = both & np.isclose(got_d, zbuf, rtol=1e-6)
        agree = np.isclose(np.asarray(pano)[exact], cbuf[exact], atol=1e-6).all(-1)
        assert agree.mean() > 0.995, agree.mean()


class TestDeepLoop:
    def test_five_segment_loop(self):
        """Segment math must generalize past the reference's 3 segments
        (reference --num_segments is a free parameter,
        unified_loop_consistency.py:410)."""
        from evoworld_tpu.diffusion.pipeline import PipelineConfig, make_random_pipeline
        from evoworld_tpu.models.unet import UNetConfig
        from evoworld_tpu.models.vae import VAEConfig
        from evoworld_tpu.models.clip import CLIPVisionConfig
        from evoworld_tpu.loop.navigator import Navigator
        from evoworld_tpu.loop.unified import UnifiedLoop, LoopConfig

        f = 3
        cfg = PipelineConfig(height=64, width=128, num_frames=f, num_steps=1,
                             decode_chunk=3, encode_chunk=2)
        pipe = make_random_pipeline(
            cfg,
            unet_config=UNetConfig(block_out_channels=(32, 32, 32, 32),
                                   num_attention_heads=(2, 2, 2, 2)),
            vae_config=VAEConfig(block_out_channels=(32, 32, 32, 32)),
            clip_config=CLIPVisionConfig(hidden_size=32, num_layers=1,
                                         num_heads=2, mlp_dim=64),
            compute_dtype=jnp.float32,
        )
        nav = Navigator(pipe, num_frames=f)

        def stub_reconstructor(pers):
            s = pers.shape[0]
            h, w = 8, 12
            rays = equirect_ray_grid(h, w)
            return {
                "world_points": jnp.broadcast_to(rays[None] * 3.0, (s, h, w, 3)),
                "conf": jnp.ones((s, h, w)),
                "extrinsic": jnp.broadcast_to(jnp.eye(4)[:3], (s, 3, 4)),
                "colors": jnp.ones((s, h, w, 3)) * 0.5,
            }

        segs = 5
        loop = UnifiedLoop(
            nav, stub_reconstructor,
            LoopConfig(num_segments=segs, num_frames=f, num_target_view=f - 1,
                       pers_height=12, pers_width=18),
        )
        n_poses = segs * (f - 1) + f + 5
        poses = np.zeros((n_poses, 6), np.float32)
        poses[:, 2] = np.arange(n_poses) * 0.4
        out = loop.run_episode(jnp.zeros((64, 128, 3)), poses * 0.1, poses, jax.random.key(0))
        assert len(out["segments"]) == segs
        assert len(out["memories"]) == segs - 1
        for seg in out["segments"][1:]:
            assert seg.shape == (f - 1, 64, 128, 3)
            assert np.isfinite(np.asarray(seg)).all()

    def test_bounded_recon_window(self):
        """max_recon_frames bounds the frames fed to VGGT each segment (the
        reference re-runs on ALL frames, unified_loop_consistency.py:336-368 —
        the bound keeps reconstruct cost flat over deep loops). A window as
        large as the episode must be bit-identical to the unbounded path."""
        from evoworld_tpu.diffusion.pipeline import PipelineConfig, make_random_pipeline
        from evoworld_tpu.models.unet import UNetConfig
        from evoworld_tpu.models.vae import VAEConfig
        from evoworld_tpu.models.clip import CLIPVisionConfig
        from evoworld_tpu.loop.navigator import Navigator
        from evoworld_tpu.loop.unified import UnifiedLoop, LoopConfig

        f = 3
        cfg = PipelineConfig(height=64, width=128, num_frames=f, num_steps=1,
                             decode_chunk=3, encode_chunk=2)
        pipe = make_random_pipeline(
            cfg,
            unet_config=UNetConfig(block_out_channels=(32, 32, 32, 32),
                                   num_attention_heads=(2, 2, 2, 2)),
            vae_config=VAEConfig(block_out_channels=(32, 32, 32, 32)),
            clip_config=CLIPVisionConfig(hidden_size=32, num_layers=1,
                                         num_heads=2, mlp_dim=64),
            compute_dtype=jnp.float32,
        )
        nav = Navigator(pipe, num_frames=f)
        seen_counts = []

        def stub_reconstructor(pers):
            seen_counts.append(pers.shape[0])
            s = pers.shape[0]
            h, w = 8, 12
            rays = equirect_ray_grid(h, w)
            return {
                "world_points": jnp.broadcast_to(rays[None] * 3.0, (s, h, w, 3)),
                "conf": jnp.ones((s, h, w)),
                "extrinsic": jnp.broadcast_to(jnp.eye(4)[:3], (s, 3, 4)),
                "colors": jnp.ones((s, h, w, 3)) * 0.5,
            }

        segs, window = 4, 3
        n_poses = segs * (f - 1) + f + 5
        poses = np.zeros((n_poses, 6), np.float32)
        poses[:, 2] = np.arange(n_poses) * 0.4

        def run(max_recon, trim=True, on_segment=None, on_memory=None):
            loop = UnifiedLoop(
                nav, stub_reconstructor,
                LoopConfig(num_segments=segs, num_frames=f, num_target_view=f - 1,
                           pers_height=12, pers_width=18, max_recon_frames=max_recon,
                           trim_residency=trim),
            )
            return loop.run_episode(jnp.zeros((64, 128, 3)), poses * 0.1, poses,
                                    jax.random.key(0), on_segment=on_segment,
                                    on_memory=on_memory)

        out = run(window)
        # Unbounded counts would be f, f+(f-1), f+2(f-1) = 3, 5, 7.
        assert seen_counts == [3, 3, 3], seen_counts
        for seg in out["segments"]:
            assert np.isfinite(np.asarray(seg)).all()

        # Device-residency trimming (drop frames older than the window as the
        # episode advances) must be bit-identical to keep-everything-and-
        # slice — same window values, same GLOBAL pose-row offsets.
        seen_counts.clear()
        untrimmed = run(window, trim=False)
        for a, b in zip(out["segments"], untrimmed["segments"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(out["memories"], untrimmed["memories"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # Streaming sinks: segments AND memory stacks arrive in order with
        # identical values and neither accumulates in the return value (deep
        # episodes must not hold ~170 MB/segment of old renders in HBM).
        seen_counts.clear()
        streamed, streamed_mem = [], []
        ret = run(window,
                  on_segment=lambda i, fr: streamed.append((i, np.asarray(fr))),
                  on_memory=lambda i, m: streamed_mem.append((i, np.asarray(m))))
        assert ret["segments"] == [] and ret["memories"] == []
        assert [i for i, _ in streamed] == list(range(segs))
        for (_, a), b in zip(streamed, out["segments"]):
            np.testing.assert_array_equal(a, np.asarray(b))
        assert [i for i, _ in streamed_mem] == list(range(segs - 1))
        for (_, a), b in zip(streamed_mem, out["memories"]):
            np.testing.assert_array_equal(a, np.asarray(b))

        seen_counts.clear()
        full = run(0)
        seen_counts.clear()
        big = run(99)  # window larger than the episode == reference parity
        for a, b in zip(full["segments"], big["segments"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestDepthBits:
    def test_scales_with_pixel_budget(self):
        from evoworld_tpu.ops.splat import _depth_bits_for

        assert _depth_bits_for(1000 * 2000) == 10   # full-scale pano target
        assert _depth_bits_for(512 * 1024) == 11
        assert _depth_bits_for(40 * 80) == 14       # capped at max
        assert _depth_bits_for(2**23 - 2) == 8
        assert _depth_bits_for(2**23) == 0          # two-key sort fallback
