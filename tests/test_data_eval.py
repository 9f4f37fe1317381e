"""Dataset + metrics tests against the shipped example episode and the
reference metric formulas."""

import numpy as np
import jax.numpy as jnp
import pytest

from evoworld_tpu.data.dataset import EpisodeDataset, load_camera_poses
from evoworld_tpu.eval.metrics import psnr, ssim, frechet_distance, batch_video_metrics


class TestData:
    def test_load_camera_poses_example(self, example_episode):
        poses = load_camera_poses(f"{example_episode}/camera_poses.txt")
        assert poses.shape == (126, 6)
        # Unity->OpenCV flips y sign.
        assert poses[0, 1] < 0

    def test_single_episode_reprojection_sample(self, example_episode):
        ds = EpisodeDataset(
            example_episode, height=64, width=128, single_episode=True,
            load_complete_episode=False,
        )
        sample = ds[0]
        assert sample.pixel_values.shape == (25, 64, 128, 3)
        assert sample.memory_values.shape == (25, 64, 128, 3)  # 24 renders + first frame
        assert sample.pixel_values.min() >= -1.0 and sample.pixel_values.max() <= 1.0
        # pos_scale applied.
        raw = load_camera_poses(f"{example_episode}/camera_poses.txt")
        np.testing.assert_allclose(
            sample.cam_traj[0, :3], raw[101, :3] * 0.1, atol=1e-5
        )

    def test_empty_with_traj(self, example_episode):
        ds = EpisodeDataset(
            example_episode, height=32, width=64, single_episode=True,
            sampling="empty_with_traj", load_complete_episode=True,
        )
        s = ds[0]
        assert s.pixel_values.shape[0] == 126
        assert (s.memory_values == 0).all()


class TestTrajectoryCache:
    def test_dump_and_load_roundtrip(self, tmp_path, example_episode):
        import shutil

        from evoworld_tpu.data.dataset import (
            dump_trajectories,
            load_trajectory_file,
            trajectory_to_array,
        )
        from evoworld_tpu.geometry.pose import UNITY_TO_OPENCV

        ep = tmp_path / "case_000"
        ep.mkdir()
        shutil.copy(f"{example_episode}/camera_poses.txt", ep / "camera_poses.txt")
        cache = dump_trajectories(str(tmp_path))
        assert "case_000" in cache

        loaded = load_trajectory_file(str(tmp_path / "camera_trajectories.json"))
        # Reference two-layer schema: {episode: {frame_id(str): [6 floats]}}
        # (CameraTrajDataset.py:158-198) — interop with reference caches.
        inner = loaded["case_000"]
        assert isinstance(inner, dict) and len(inner) == 126
        assert all(isinstance(k, str) and len(v) == 6 for k, v in inner.items())
        raw = trajectory_to_array(inner)
        assert raw.shape == (126, 6)
        # Cache stores UNCONVERTED Unity rows: applying the sign convention
        # reproduces load_camera_poses.
        np.testing.assert_allclose(
            raw * UNITY_TO_OPENCV,
            load_camera_poses(f"{example_episode}/camera_poses.txt"),
            rtol=1e-6,
        )


class TestCalculateScores:
    def test_video_pair_scoring(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        from evoworld_tpu.cli.calculate_scores import load_video, main

        rng = np.random.RandomState(0)
        written = False
        for sub in ("ep0", "ep1"):
            d = tmp_path / sub
            d.mkdir()
            for name in ("navigated.mp4", "original.mp4"):
                w = cv2.VideoWriter(
                    str(d / name), cv2.VideoWriter_fourcc(*"mp4v"), 8, (64, 64)
                )
                if not w.isOpened():
                    pytest.skip("no mp4 codec available")
                for _ in range(4):
                    w.write(rng.randint(0, 255, (64, 64, 3), np.uint8))
                w.release()
                written = True
        assert written
        vid = load_video(str(tmp_path / "ep0" / "navigated.mp4"))
        assert vid is not None and vid.shape == (4, 64, 64, 3)
        assert 0.0 <= vid.min() and vid.max() <= 1.0

        main([f"--data.root={tmp_path}"])
        import json

        scores = json.loads((tmp_path / "scores.json").read_text())
        # 4-frame clips skip FVD (needs >=10 frames) but score the rest.
        assert {"ssim", "psnr", "lpips"} <= set(scores)
        assert np.isfinite(scores["psnr"]["value_mean"])


class TestMetrics:
    def test_psnr_reference_formula(self):
        rng = np.random.default_rng(0)
        a = rng.uniform(size=(16, 16, 3)).astype(np.float32)
        b = rng.uniform(size=(16, 16, 3)).astype(np.float32)
        import math

        mse = np.mean((a - b) ** 2)
        want = 20 * math.log10(1 / math.sqrt(mse))
        got = float(psnr(jnp.asarray(a), jnp.asarray(b)))
        assert abs(got - want) < 1e-3
        assert float(psnr(jnp.asarray(a), jnp.asarray(a))) == 100.0

    def test_ssim_matches_cv2_golden(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(1)
        a = rng.uniform(size=(32, 32)).astype(np.float64)
        b = np.clip(a + rng.normal(scale=0.05, size=(32, 32)), 0, 1)

        # Reference formula with cv2 (calculate_ssim.py:6-24).
        c1, c2 = 0.01**2, 0.03**2
        kernel = cv2.getGaussianKernel(11, 1.5)
        window = np.outer(kernel, kernel.T)
        f = lambda x: cv2.filter2D(x, -1, window)[5:-5, 5:-5]
        mu1, mu2 = f(a), f(b)
        want = (
            ((2 * mu1 * mu2 + c1) * (2 * (f(a * b) - mu1 * mu2) + c2))
            / ((mu1**2 + mu2**2 + c1) * ((f(a**2) - mu1**2) + (f(b**2) - mu2**2) + c2))
        ).mean()

        got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        assert abs(got - want) < 1e-4, (got, want)

    def test_frechet_identical_is_zero(self):
        rng = np.random.default_rng(2)
        feats = rng.normal(size=(200, 16))
        assert abs(frechet_distance(feats, feats.copy())) < 1e-6
        shifted = feats + 2.0
        fd = frechet_distance(feats, shifted)
        np.testing.assert_allclose(fd, 16 * 4.0, rtol=0.01)  # ||mu_diff||^2

    def test_batch_video_metrics(self):
        rng = np.random.default_rng(3)
        gt = rng.uniform(size=(2, 3, 24, 24, 3)).astype(np.float32)
        gen = np.clip(gt + rng.normal(scale=0.1, size=gt.shape), 0, 1).astype(np.float32)
        out = batch_video_metrics(gen, gt)
        assert 15 < out["psnr"] < 30
        assert 0 < out["ssim"] < 1
        assert out["psnr_per_frame"].shape == (3,)
