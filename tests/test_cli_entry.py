"""End-to-end drives of the thin CLI entry points on tiny fixtures.

Each test calls a CLI `main()` exactly as a user would (dotted overrides,
real files on disk) and checks the on-disk artifacts — the package-boundary
contract SURVEY.md §4's test plan assigns to the CLI layer.
"""

import json
import os
import shutil

import numpy as np
import pytest
from PIL import Image

REF_EPISODE = "/root/reference/example/case_000"
REF_CAM = os.path.join(REF_EPISODE, "camera_poses.txt")


def _write_png(path, h=32, w=48, seed=0):
    rng = np.random.default_rng(seed)
    arr = (rng.uniform(0, 1, (h, w, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


class TestPanoToPersCLI:
    def test_look_at_center_extraction(self, tmp_path):
        ep = tmp_path / "ep"
        (ep / "panorama").mkdir(parents=True)
        shutil.copy(REF_CAM, ep / "camera_poses.txt")
        for i in range(1, 5):
            _write_png(str(ep / "panorama" / f"{i:03d}.png"), 64, 128, i)

        from evoworld_tpu.cli.pano_to_pers import main

        main([f"--data.root={ep}", "--loop.pers_height=24", "--loop.pers_width=32"])

        out = ep / "perspective_look_at_center"
        assert sorted(os.listdir(out)) == [f"{i:03d}.png" for i in range(1, 5)]
        assert Image.open(out / "001.png").size == (32, 24)
        cam_out = (ep / "camera_poses_look_at_center.txt").read_text().splitlines()
        assert cam_out[0] == "Frame,PosX,PosY,PosZ,RotX,RotY,RotZ"
        assert len(cam_out) == len(open(REF_CAM).readlines())
        # Idempotent skip (reference reproject offline tools contract).
        main([f"--data.root={ep}", "--loop.pers_height=24", "--loop.pers_width=32"])


class TestPanoToPersPerSegmentCLI:
    def test_prior_segment_aggregation(self, tmp_path):
        ep = tmp_path / "ep"
        ep.mkdir()
        shutil.copy(REF_CAM, ep / "camera_poses.txt")
        # Segment dirs: names 01/02 in _0; 02/03 in _1 -> dedup keeps 01,02,03.
        (ep / "predictions_0").mkdir()
        (ep / "predictions_1").mkdir()
        for n in ("01", "02"):
            _write_png(str(ep / "predictions_0" / f"{n}.png"), 64, 128, int(n))
        for n in ("02", "03"):
            _write_png(str(ep / "predictions_1" / f"{n}.png"), 64, 128, 10 + int(n))

        from evoworld_tpu.cli.pano_to_pers_per_segment import main

        main([f"--data.root={ep}/predictions_1",
              "--loop.pers_height=24", "--loop.pers_width=32"])

        out = ep / "perspective_1"
        assert sorted(os.listdir(out)) == [
            "frame_001.png", "frame_002.png", "frame_003.png"
        ]
        cam_file = ep / "camera_poses_look_at_center_1.txt"
        assert cam_file.exists()


class TestCalculateMetricsCLI:
    def test_writes_reference_format_eval_score(self, tmp_path):
        root = tmp_path / "save"
        ep = root / "case_000"
        for sub in ("predictions_2", "predictions_gt_2"):
            (ep / sub).mkdir(parents=True)
            for i in range(5):
                _write_png(str(ep / sub / f"{i:02d}.png"), 32, 48, i + (sub == "predictions_2"))

        from evoworld_tpu.cli.calculate_metrics import main

        main([f"--data.root={root}", "--pipeline.num_frames=5"])

        scores = json.load(open(root / "eval_score.json"))
        # FVD needs >= 2 videos and >= 10 frames; the other five reference
        # metric families must all be present with the reference structure.
        for key in ("ssim", "psnr", "lpips", "latent_mse", "loop_closure_latent_mse"):
            assert key in scores, sorted(scores)
            assert "value_mean" in scores[key], key
        assert len(scores["psnr"]["value"]) == 5
        assert np.isfinite(scores["latent_mse"]["value_mean"])


class TestConvertCheckpointCLI:
    def test_halve_converts_float_tensors_only(self, tmp_path):
        from safetensors.numpy import save_file
        from safetensors import safe_open

        src = str(tmp_path / "in.safetensors")
        dst = str(tmp_path / "out.safetensors")
        save_file({
            "w": np.ones((4, 4), np.float32) * 0.5,
            "idx": np.arange(3, dtype=np.int64),
        }, src)

        from evoworld_tpu.cli.convert_checkpoint import halve

        halve(src, dst, "fp16")
        with safe_open(dst, framework="np") as f:
            w = f.get_tensor("w")
            idx = f.get_tensor("idx")
        assert w.dtype == np.float16 and idx.dtype == np.int64
        np.testing.assert_allclose(w, 0.5)


class TestRunUnifiedCLI:
    def test_tiny_two_segment_loop_on_example_episode(self, tmp_path):
        """Flagship entry point at smoke scale: generate seg 0, reconstruct
        (tiny VGGT) + splat-render memory, generate seg 1 conditioned on it,
        write predictions_{0,1} + predictions_gt_{0,1} + rendered panoramas."""
        from evoworld_tpu.cli.run_unified import main

        save = tmp_path / "out"
        main([
            f"--data.root={REF_EPISODE}",
            f"--runtime.save_dir={save}",
            "--runtime.model_preset=tiny", "--runtime.vggt_tiny=true",
            "--runtime.compute_dtype=float32",
            "--pipeline.height=64", "--pipeline.width=128",
            "--pipeline.num_frames=5", "--pipeline.num_steps=2",
            "--pipeline.decode_chunk=5", "--pipeline.encode_chunk=2",
            "--loop.num_frames=5", "--loop.num_segments=2",
            "--loop.num_target_view=4",
            "--loop.pers_height=28", "--loop.pers_width=42",
        ])
        ep = save / "case_000"
        for seg in (0, 1):
            assert len(os.listdir(ep / f"predictions_{seg}")) == 5 - (seg > 0)
            assert (ep / f"predictions_gt_{seg}").is_dir()
        mems = sorted(os.listdir(ep / "rendered_panorama_0"))
        assert len(mems) == 4  # num_target_view rendered memory panoramas
        assert Image.open(ep / "rendered_panorama_0" / mems[0]).size == (128, 64)


class TestRunSingleSegmentCLI:
    def test_tiny_generation_on_example_episode(self, tmp_path):
        pytest.importorskip("PIL")
        from evoworld_tpu.cli.run_single_segment import main

        save = tmp_path / "out"
        main([
            f"--data.root={REF_EPISODE}",
            f"--runtime.save_dir={save}",
            "--runtime.model_preset=tiny",
            "--pipeline.height=64", "--pipeline.width=128",
            "--pipeline.num_frames=5", "--pipeline.num_steps=2",
            "--pipeline.decode_chunk=5", "--pipeline.encode_chunk=2",
            "--data.sequence_length=5",
        ])
        ep_out = save / "case_000"
        preds = sorted(os.listdir(ep_out / "predictions"))
        gts = sorted(os.listdir(ep_out / "predictions_gt"))
        assert len(preds) == 5 and len(gts) == 5
        im = Image.open(ep_out / "predictions" / preds[0])
        assert im.size == (128, 64)


class TestReprojectCLI:
    def test_offline_reprojection_with_sky_mask(self, tmp_path):
        """Drives cli.reproject end-to-end on a tiny synthetic episode with
        the reference-default sky masking on (no skyseg.onnx -> heuristic
        fallback with a warning) and then explicitly off."""
        ep = tmp_path / "ep"
        (ep / "panorama").mkdir(parents=True)
        shutil.copy(REF_CAM, ep / "camera_poses.txt")
        for i in range(1, 6):
            _write_png(str(ep / "panorama" / f"{i:03d}.png"), 64, 128, i)

        from evoworld_tpu.cli.pano_to_pers import main as pano_main
        from evoworld_tpu.cli.reproject import main as reproject_main

        pano_main([f"--data.root={ep}", "--loop.pers_height=28",
                   "--loop.pers_width=42"])

        common = [
            f"--data.root={ep}", "--runtime.vggt_tiny=true",
            "--pipeline.height=64", "--pipeline.width=128",
            "--loop.num_target_view=4",
            f"--runtime.skyseg_onnx={tmp_path}/absent.onnx",
        ]
        reproject_main(common)  # data.mask_sky defaults True (reference)
        out = ep / "rendered_panorama_vggt_open3d"
        files = sorted(os.listdir(out))
        assert len(files) == 4
        assert Image.open(out / files[0]).size == (128, 64)

        shutil.rmtree(out)
        reproject_main(common + ["--data.mask_sky=false"])
        assert len(os.listdir(out)) == 4


class TestParityGateLogic:
    """Fast unit coverage of the gate's pure decision logic — the slow
    end-to-end drives below exercise the full chain once."""

    def test_gate_splits_pass_and_fail_at_tolerance(self):
        from evoworld_tpu.cli.validate_parity import _gate

        ours = {"psnr": 20.1, "lpips": 0.200}
        theirs = {"psnr": 20.0, "lpips": 0.208}
        # psnr off by 0.5% (passes at 1%), lpips off by ~3.8% (fails).
        assert _gate(ours, theirs, ("psnr", "lpips"), 0.01, "t") == ["lpips"]
        assert _gate(ours, theirs, ("psnr", "lpips"), 0.05, "t") == []
        # Zero reference score must not divide by zero.
        assert _gate({"psnr": 0.0}, {"psnr": 0.0}, ("psnr",), 0.01, "t") == []

    def test_reference_frame_size_mismatch_fails_loudly(self, tmp_path):
        """A size-mismatched --parity.reference_frames dir must abort rather
        than silently bilinear-resample (which biases PSNR/LPIPS and could
        flip the 1% verdict); --parity.resize_reference=true opts back into
        the resample explicitly."""
        from evoworld_tpu.cli.validate_parity import _load_png_dir

        ref_dir = tmp_path / "ref_frames"
        ref_dir.mkdir()
        for i in range(3):
            Image.fromarray(np.full((32, 64, 3), 127, np.uint8)).save(
                ref_dir / f"{i:03d}.png")

        with pytest.raises(SystemExit) as exc:
            _load_png_dir(str(ref_dir), 3, (64, 128))
        assert "resize_reference" in str(exc.value)

        frames = _load_png_dir(str(ref_dir), 3, (64, 128), allow_resize=True)
        assert frames.shape == (3, 64, 128, 3)
        # Matching size never resizes and never raises.
        frames = _load_png_dir(str(ref_dir), 3, (32, 64))
        assert frames.shape == (3, 32, 64, 3)

    def test_missing_metric_in_reference_scores_is_gate_fail(self, tmp_path, capsys):
        from evoworld_tpu.cli.validate_parity import _reference_scores_from_json

        path = tmp_path / "eval_score.json"
        path.write_text(json.dumps({"psnr": {"value_mean": 20.0}}))
        # Present keys parse; a requested-but-absent metric exits 1 with the
        # gate's FAIL line instead of a raw KeyError.
        assert _reference_scores_from_json(str(path), ("psnr",)) == {"psnr": 20.0}
        with pytest.raises(SystemExit) as exc:
            _reference_scores_from_json(str(path), ("psnr", "lpips"))
        assert exc.value.code == 1
        assert "PARITY GATE: FAIL" in capsys.readouterr().out


class TestValidateParityCLI:
    def test_dry_run_gate_passes_end_to_end(self, tmp_path, capsys):
        """The weights-day parity gate in CI-tested dry-run mode: random tiny
        weights, example episode, PSNR+LPIPS scored vs GT, gated against the
        self-comparison reference — the identical command path runs
        unmodified the day real checkpoints arrive (WEIGHTS.md)."""
        from evoworld_tpu.cli.validate_parity import main

        main([
            "--parity.dry_run=true",
            f"--data.root={REF_EPISODE}",
            f"--runtime.save_dir={tmp_path}",
            "--runtime.model_preset=tiny", "--runtime.compute_dtype=float32",
            "--pipeline.height=64", "--pipeline.width=128",
            "--pipeline.num_frames=5", "--pipeline.num_steps=2",
            "--pipeline.decode_chunk=5", "--pipeline.encode_chunk=2",
            "--data.sequence_length=5",
        ])
        out = capsys.readouterr().out
        assert "PARITY GATE: PASS" in out and "DRY RUN" in out
        preds = tmp_path / "validate_parity" / "predictions"
        assert len(os.listdir(preds)) == 5

    def test_reference_frames_gate_fails_on_mismatch(self, tmp_path, capsys):
        """With --parity.reference_frames pointing at frames that are NOT
        within 1%, the gate must exit nonzero — the pass/fail logic is real,
        not a formality."""
        from evoworld_tpu.cli.validate_parity import main

        # "Reference" frames: solid mid-gray — far from any generated clip.
        ref_dir = tmp_path / "ref_frames"
        ref_dir.mkdir()
        for i in range(5):
            Image.fromarray(np.full((64, 128, 3), 127, np.uint8)).save(
                ref_dir / f"{i:03d}.png")

        with pytest.raises(SystemExit) as exc:
            main([
                "--parity.dry_run=true",
                f"--parity.reference_frames={ref_dir}",
                f"--data.root={REF_EPISODE}",
                f"--runtime.save_dir={tmp_path}/out",
                "--runtime.model_preset=tiny", "--runtime.compute_dtype=float32",
                "--pipeline.height=64", "--pipeline.width=128",
                "--pipeline.num_frames=5", "--pipeline.num_steps=2",
                "--pipeline.decode_chunk=5", "--pipeline.encode_chunk=2",
                "--data.sequence_length=5",
            ])
        assert exc.value.code == 1
        assert "PARITY GATE: FAIL" in capsys.readouterr().out
