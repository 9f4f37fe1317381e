"""Batch video-file scorer: navigated.mp4 vs original.mp4 per subfolder.

Equivalent of `evoworld/metrics/other_metrics/calculate_scores.py:50-120`:
walks `--data.root`'s subfolders, loads each `navigated.mp4` / `original.mp4`
pair resized to 64x64, truncates every video to the shortest common length,
and computes fvd / ssim / psnr / lpips once over the whole batch in the
reference's result structure (printed as JSON; written next to the root).

Video decode uses OpenCV (host-side IO only; metric math runs in JAX).

Usage:
  python -m evoworld_tpu.cli.calculate_scores --data.root=<folder> \
      [--runtime.metric_weights_dir=<dir with lpips.pt / i3d.pt>]
"""

from __future__ import annotations

import json
import os

import numpy as np

from evoworld_tpu.cli.common import logger, parse_config
from evoworld_tpu.eval.harness import (
    FeatureNets,
    calculate_fvd_batch,
    calculate_lpips,
    calculate_psnr,
    calculate_ssim,
)


def load_video(path: str, target_size: int = 64) -> np.ndarray | None:
    """(T, H, W, 3) float [0, 1] RGB frames resized to target_size, or None."""
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        frame = cv2.resize(frame, (target_size, target_size))
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0)
    cap.release()
    if not frames:
        return None
    return np.stack(frames)


def main(argv=None):
    config = parse_config(argv)
    root = config.data.root
    subfolders = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )

    navigated, original = [], []
    for sub in subfolders:
        nav_p = os.path.join(root, sub, "navigated.mp4")
        org_p = os.path.join(root, sub, "original.mp4")
        if not (os.path.exists(nav_p) and os.path.exists(org_p)):
            continue
        nav, org = load_video(nav_p), load_video(org_p)
        if nav is None or org is None:
            continue
        navigated.append(nav)
        original.append(org)

    if not navigated:
        raise SystemExit(f"no navigated.mp4/original.mp4 pairs under {root}")

    t = min(min(v.shape[0] for v in navigated), min(v.shape[0] for v in original))
    gen = np.stack([v[:t] for v in navigated])
    gt = np.stack([v[:t] for v in original])
    logger.info(f"{gen.shape[0]} video pairs, {t} frames @ {gen.shape[2]}x{gen.shape[3]}")

    from evoworld_tpu.cli.calculate_metrics import _load_metric_weights

    nets = FeatureNets(_load_metric_weights(getattr(config.runtime, "metric_weights_dir", "")))

    result = {}
    if gen.shape[0] >= 2 and t >= 10:  # Frechet needs >=2 videos, I3D >=10 frames
        result["fvd"] = calculate_fvd_batch(gen, gt, nets=nets)
    else:
        logger.warning(
            f"fvd skipped: need >=2 video pairs and >=10 frames, have "
            f"{gen.shape[0]} pairs x {t} frames"
        )
    result["ssim"] = calculate_ssim(gen, gt)
    result["psnr"] = calculate_psnr(gen, gt)
    result["lpips"] = calculate_lpips(gen, gt, nets=nets)
    print(json.dumps(result, indent=4))
    out_path = os.path.join(root, "scores.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=4)
    logger.info(f"wrote {out_path}")


if __name__ == "__main__":
    main()
