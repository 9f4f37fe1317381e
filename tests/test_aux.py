"""Tests for auxiliary components: path splitting, data engine, sky
heuristic, exports, video, config overrides, checkpoint manager."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestPathSplitting:
    def test_split_path_at_rotation_changes(self):
        from evoworld_tpu.loop.navigator import split_path_into_segments

        path = np.zeros((10, 6), np.float32)
        path[:, 2] = np.arange(10)
        path[5:, 4] = 90.0  # yaw change at step 5
        segments = split_path_into_segments(path)
        assert len(segments) == 2
        assert len(segments[0]) == 5
        # Bridge pose: previous position with the new rotation.
        assert segments[1][0][2] == 4.0 and segments[1][0][4] == 90.0

    def test_extend_segment(self):
        from evoworld_tpu.loop.navigator import extend_segment

        seg = np.zeros((3, 6), np.float32)
        seg[:, 2] = [0, 1, 2]
        out = extend_segment(seg, 6)
        assert out.shape == (6, 6)
        np.testing.assert_allclose(out[:, 2], [0, 1, 2, 3, 4, 5])


class TestDataEngine:
    def test_unity_cube_roundtrip_structure(self):
        from evoworld_tpu.data.engine import unity_cubes_to_pano

        faces = jnp.stack([jnp.full((32, 32, 3), i / 5.0) for i in range(6)])
        pano = np.asarray(unity_cubes_to_pano(faces, 64, 128))
        assert pano.shape == (64, 128, 3)
        # All six face values should appear in the panorama.
        vals = set(np.round(np.unique(pano), 2).tolist())
        assert len(vals) == 6, vals


class TestSkySeg:
    def test_heuristic_masks_bright_smooth_top(self):
        from evoworld_tpu.memory.skyseg import sky_mask_heuristic

        img = np.zeros((40, 40, 3), np.float32)
        img[:16] = [0.6, 0.7, 0.9]       # bright smooth blueish top = sky
        img[24:] = np.random.default_rng(0).uniform(0, 0.4, (16, 40, 3))
        mask = np.asarray(sky_mask_heuristic(jnp.asarray(img)))
        assert (mask[2:14] == 0).mean() > 0.8    # sky rows masked
        assert (mask[25:] == 255).mean() > 0.9   # ground kept


class TestExports:
    def test_ply_obj_roundtrip(self, tmp_path):
        from evoworld_tpu.memory.export import save_obj, save_ply

        pts = np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32)
        cols = np.random.default_rng(1).uniform(size=(10, 3)).astype(np.float32)
        ply = tmp_path / "c.ply"
        save_ply(pts, cols, str(ply))
        text = ply.read_text()
        assert "element vertex 10" in text
        obj = tmp_path / "c.obj"
        save_obj(pts, cols, str(obj))
        assert len(obj.read_text().splitlines()) == 10

    def test_video_export(self, tmp_path):
        from evoworld_tpu.utils.video import export_gif, side_by_side

        frames = np.random.default_rng(0).uniform(size=(4, 16, 32, 3)).astype(np.float32)
        gif = tmp_path / "v.gif"
        export_gif(frames, str(gif))
        assert gif.stat().st_size > 0
        sbs = side_by_side(frames, frames)
        assert sbs.shape == (4, 16, 64, 3)


class TestConfig:
    def test_dotted_overrides(self):
        from evoworld_tpu.config import EvoWorldConfig, apply_overrides

        cfg = apply_overrides(
            EvoWorldConfig(),
            ["--pipeline.num_steps=7", "--runtime.seed", "9",
             "--data.single_episode=false", "--train.learning_rate=2e-5"],
        )
        assert cfg.pipeline.num_steps == 7
        assert cfg.runtime.seed == 9
        assert cfg.data.single_episode is False
        assert cfg.train.learning_rate == 2e-5

    def test_trainer_section_overrides(self):
        # The reference's accelerate-level flags (--gradient_accumulation_steps,
        # --per_gpu_batch_size, --use_ema, --checkpointing_steps) map to the
        # trainer section (MIGRATION.md).
        from evoworld_tpu.config import EvoWorldConfig, apply_overrides

        cfg = apply_overrides(
            EvoWorldConfig(),
            ["--trainer.gradient_accumulation_steps=4",
             "--trainer.per_device_batch_size=2",
             "--trainer.use_ema=true",
             "--trainer.checkpointing_steps=250",
             "--train.zero_stage=2"],
        )
        assert cfg.trainer.gradient_accumulation_steps == 4
        assert cfg.trainer.per_device_batch_size == 2
        assert cfg.trainer.use_ema is True
        assert cfg.trainer.checkpointing_steps == 250
        assert cfg.train.zero_stage == 2

    def test_train_cli_rejects_derived_trainer_flags(self):
        # output_dir / max_steps are derived from runtime.save_dir /
        # train.total_steps; silent clobbering would be a footgun.
        import pytest

        from evoworld_tpu.cli.train import main

        with pytest.raises(SystemExit, match="runtime.save_dir"):
            main(["--trainer.output_dir=/x"])
        with pytest.raises(SystemExit, match="train.total_steps"):
            main(["--trainer.max_steps=7"])


class TestCubeToPanoLayouts:
    def test_discover_frame_dirs(self, tmp_path):
        from evoworld_tpu.cli.cube_to_pano import discover_frames
        from evoworld_tpu.data.engine import FACE_ORDER

        for frame in ("000", "001"):
            (tmp_path / frame).mkdir()
            for f in FACE_ORDER:
                (tmp_path / frame / f"{f}.png").touch()
        frames = discover_frames(str(tmp_path))
        assert list(frames) == ["000", "001"]
        assert [p.endswith(f"{f}.png") for p, f in zip(frames["000"], FACE_ORDER)]

    def test_discover_flat_ue_layout(self, tmp_path):
        # Reference UE captures are flat <id>_<face>.png files
        # (cube_to_pano_batched_io_UE.py:252).
        from evoworld_tpu.cli.cube_to_pano import discover_frames
        from evoworld_tpu.data.engine import FACE_ORDER

        for fid in (2, 10):
            for f in FACE_ORDER:
                (tmp_path / f"{fid}_{f}.png").touch()
        (tmp_path / "10_extra.txt").touch()
        (tmp_path / "3_front.png").touch()  # incomplete frame: skipped
        frames = discover_frames(str(tmp_path))
        assert list(frames) == ["2", "10"]  # numeric sort, not lexicographic
        assert frames["2"][4].endswith("2_front.png")

    def test_unknown_field_rejected(self):
        import pytest

        from evoworld_tpu.config import EvoWorldConfig, apply_overrides

        with pytest.raises(SystemExit):
            apply_overrides(EvoWorldConfig(), ["--pipeline.bogus=1"])


class TestCheckpointManager:
    def test_save_restore_roundtrip(self, tmp_path):
        from evoworld_tpu.train.train_step import TrainState
        from evoworld_tpu.train.trainer import CheckpointManager

        params = {"w": jnp.arange(8.0), "b": jnp.ones((2, 2))}
        opt_state = {"m": jnp.zeros(8)}
        state = TrainState(params, opt_state, jnp.asarray(3, jnp.int32))
        mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
        mgr.save(3, state)
        assert mgr.latest_step() == 3
        zero = TrainState(
            jax.tree.map(jnp.zeros_like, params),
            jax.tree.map(jnp.zeros_like, opt_state),
            jnp.asarray(0, jnp.int32),
        )
        restored = mgr.restore(3, zero)
        np.testing.assert_array_equal(np.asarray(restored.params["w"]), np.arange(8.0))
        assert int(restored.step) == 3

    def test_ema_persists_across_restore(self, tmp_path):
        # Resume must keep the EMA history (reference EMAModel state is
        # persisted via the accelerate hooks, train_evoworld.py:236-269).
        from evoworld_tpu.train.train_step import TrainState
        from evoworld_tpu.train.trainer import CheckpointManager

        params = {"w": jnp.ones(4)}
        state = TrainState(params, {"m": jnp.zeros(4)}, jnp.asarray(5, jnp.int32))
        ema = {"w": jnp.full((4,), 0.25)}
        mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
        mgr.save(5, state, ema_params=ema)

        zero = TrainState(
            jax.tree.map(jnp.zeros_like, params),
            {"m": jnp.zeros(4)},
            jnp.asarray(0, jnp.int32),
        )
        restored, restored_ema = mgr.restore(5, zero, with_ema=True)
        np.testing.assert_array_equal(np.asarray(restored.params["w"]), 1.0)
        np.testing.assert_array_equal(np.asarray(restored_ema["w"]), 0.25)

    def test_with_ema_on_ema_less_checkpoint(self, tmp_path):
        # Checkpoints written without EMA restore gracefully (ema -> None).
        from evoworld_tpu.train.train_step import TrainState
        from evoworld_tpu.train.trainer import CheckpointManager

        params = {"w": jnp.ones(2)}
        state = TrainState(params, {"m": jnp.zeros(2)}, jnp.asarray(1, jnp.int32))
        mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
        mgr.save(1, state)
        zero = TrainState({"w": jnp.zeros(2)}, {"m": jnp.zeros(2)}, jnp.asarray(0, jnp.int32))
        restored, restored_ema = mgr.restore(1, zero, with_ema=True)
        assert restored_ema is None
        np.testing.assert_array_equal(np.asarray(restored.params["w"]), 1.0)


class TestEMA:
    def test_ema_update_moves_toward_params(self):
        from evoworld_tpu.train.trainer import ema_update

        ema = {"w": jnp.zeros(4)}
        params = {"w": jnp.ones(4)}
        out = ema_update(ema, params, 0.9)
        np.testing.assert_allclose(np.asarray(out["w"]), 0.1, atol=1e-6)


class TestNavigatePath:
    def test_straight_path_with_rotation(self):
        """navigate_path(curve=False) rotates the carried pano at segment
        boundaries and generates per segment."""
        import jax
        from evoworld_tpu.diffusion.pipeline import PipelineConfig, make_random_pipeline
        from evoworld_tpu.models.unet import UNetConfig
        from evoworld_tpu.models.vae import VAEConfig
        from evoworld_tpu.models.clip import CLIPVisionConfig
        from evoworld_tpu.loop.navigator import Navigator

        cfg = PipelineConfig(height=64, width=128, num_frames=4, num_steps=1,
                             decode_chunk=4, encode_chunk=5)
        pipe = make_random_pipeline(
            cfg,
            unet_config=UNetConfig(block_out_channels=(32, 64, 128, 128), num_attention_heads=(2, 4, 8, 8)),
            vae_config=VAEConfig(block_out_channels=(32, 64, 128, 128)),
            clip_config=CLIPVisionConfig(hidden_size=64, num_layers=2, num_heads=4, mlp_dim=128),
            compute_dtype=jnp.float32,
        )
        nav = Navigator(pipe, num_frames=4)
        path = np.zeros((8, 6), np.float32)
        path[:, 2] = np.arange(8)
        path[4:, 4] = 90.0  # rotation change -> 2 segments in straight mode
        mem = jnp.zeros((4, 64, 128, 3))
        gens = nav.navigate_path(path, jnp.zeros((64, 128, 3)), mem, jax.random.key(0), curve=False)
        assert len(gens) == 2
        for g in gens:
            assert g.shape == (4, 64, 128, 3)
            assert np.isfinite(np.asarray(g)).all()


class TestTrainerBatches:
    def test_episode_batches_shapes(self, example_episode):
        from evoworld_tpu.data.dataset import EpisodeDataset
        from evoworld_tpu.train.trainer import episode_batches

        ds = EpisodeDataset(example_episode, height=64, width=128,
                            sequence_length=5, single_episode=True)
        batch = next(episode_batches(ds, batch_size=2, latent_hw=(8, 16)))
        assert batch["pixel_values"].shape == (2, 5, 64, 128, 3)
        assert batch["plucker"].shape == (2, 5, 8, 16, 6)
        assert batch["memory_values"].shape == (2, 5, 64, 128, 3)


class TestPrefetchIterator:
    def test_order_and_stop(self):
        from evoworld_tpu.data.prefetch import PrefetchIterator

        got = list(PrefetchIterator(iter(range(17)), depth=3))
        assert got == list(range(17))

    def test_worker_exception_reraised(self):
        from evoworld_tpu.data.prefetch import PrefetchIterator

        def gen():
            yield 1
            raise ValueError("boom")

        it = PrefetchIterator(gen(), depth=2)
        assert next(it) == 1
        with pytest.raises(ValueError, match="boom"):
            while True:
                next(it)

    def test_close_unblocks_producer(self):
        from evoworld_tpu.data.prefetch import PrefetchIterator

        def infinite():
            i = 0
            while True:
                yield i
                i += 1

        it = PrefetchIterator(infinite(), depth=1)
        assert next(it) == 0
        it.close()
        assert not it._thread.is_alive()
        it.close()  # idempotent


class TestCLIHelp:
    def test_help_exits_zero(self):
        import pytest as _pytest

        from evoworld_tpu.cli.common import parse_config

        with _pytest.raises(SystemExit) as e:
            parse_config(["--help"])
        assert e.value.code == 0


class TestTrackers:
    def test_jsonl_tracker_roundtrip(self, tmp_path):
        import json

        from evoworld_tpu.utils.trackers import JSONLTracker

        tr = JSONLTracker(str(tmp_path), run_name="t")
        tr.log(10, {"train_loss": 0.5, "lr": 1e-5})
        tr.log(20, {"train_loss": 0.4, "lr": 9e-6})
        tr.log_artifact(20, "validation_gif", "/tmp/x.gif")
        rows = [json.loads(l) for l in open(tmp_path / "t_metrics.jsonl")]
        assert rows[0]["step"] == 10 and abs(rows[0]["train_loss"] - 0.5) < 1e-9
        assert rows[2]["artifact"] == "validation_gif"
        csv_lines = open(tmp_path / "t_metrics.csv").read().strip().splitlines()
        assert csv_lines[0].split(",")[:2] == ["step", "wall_s"]
        assert len(csv_lines) == 3


class TestNativePngEncoder:
    def test_save_frames_round_trip(self, tmp_path):
        """cli.common.save_frames writes PNGs (native C++ encoder when built,
        PIL fallback otherwise) that decode back bit-exact."""
        import numpy as np
        from PIL import Image

        from evoworld_tpu.cli.common import save_frames

        rng = np.random.default_rng(0)
        frames = rng.uniform(0, 1, (3, 16, 24, 3)).astype(np.float32)
        out = tmp_path / "frames"
        save_frames(frames, str(out), start_index=1)
        names = sorted(p.name for p in out.iterdir())
        assert names == ["001.png", "002.png", "003.png"]
        back = np.asarray(Image.open(out / "001.png"))
        np.testing.assert_array_equal(back, (frames[0] * 255).astype(np.uint8))

    def test_async_writer_round_trip_and_error(self, tmp_path):
        """AsyncFrameWriter writes identically to save_frames (uint8
        passthrough — no double conversion) and re-raises worker failures."""
        import numpy as np
        import pytest
        from PIL import Image

        from evoworld_tpu.cli.common import AsyncFrameWriter

        rng = np.random.default_rng(1)
        frames = rng.uniform(0, 1, (2, 8, 12, 3)).astype(np.float32)
        with AsyncFrameWriter() as w:
            w.submit(frames, str(tmp_path / "a"), start_index=0)
            w.submit(frames[:1], str(tmp_path / "b"), 0, "{:02d}.png")
        assert w.busy_s > 0
        back = np.asarray(Image.open(tmp_path / "a" / "001.png"))
        np.testing.assert_array_equal(back, (frames[1] * 255).astype(np.uint8))
        assert (tmp_path / "b" / "00.png").exists()

        # a worker failure surfaces at close() (unwritable directory)
        bad = AsyncFrameWriter()
        bad.submit(frames, "/proc/definitely/not/writable")
        with pytest.raises(BaseException):
            bad.close()
