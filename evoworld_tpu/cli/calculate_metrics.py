"""Metric aggregation over prediction directories -> eval_score.json.

Equivalent of `calculate_metrics.sh` -> `calculate_all_metrics.main`
(/root/reference/evoworld/metrics/calculate_all_metrics.py:195-227): loads
the last `num_frames` PNGs of each episode's GT and generated dirs, computes
PSNR/SSIM (+ FVD when feature weights are available), writes
`eval_score.json` with per-metric means.

Usage:
  python -m evoworld_tpu.cli.calculate_metrics --data.root=<save_dir> \
      [--data.reprojection_name unused] \
      --data.sampling=predictions_2:predictions_gt_2
  (the sampling field doubles as "<gen_subdir>:<gt_subdir>")
"""

from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image

from evoworld_tpu.cli.common import logger, parse_config
from evoworld_tpu.eval.metrics import batch_video_metrics, frechet_distance


def _read_video_dir(path: str, num_frames: int) -> np.ndarray:
    names = sorted(f for f in os.listdir(path) if f.endswith(".png"))[-num_frames:]
    return np.stack([
        np.asarray(Image.open(os.path.join(path, n)).convert("RGB"), np.float32) / 255.0
        for n in names
    ])


def main(argv=None):
    config = parse_config(argv)
    root = config.data.root
    spec = config.data.sampling
    gen_subdir, gt_subdir = (spec.split(":") + ["predictions_gt_2"])[:2] \
        if ":" in spec else ("predictions_2", "predictions_gt_2")
    num_frames = config.pipeline.num_frames

    episodes = sorted(
        e for e in os.listdir(root)
        if os.path.isdir(os.path.join(root, e, gen_subdir))
    )
    if not episodes and os.path.isdir(os.path.join(root, gen_subdir)):
        episodes = [""]
    if not episodes:
        raise SystemExit(f"no episodes with {gen_subdir} under {root}")

    gen, gt = [], []
    for e in episodes:
        gen.append(_read_video_dir(os.path.join(root, e, gen_subdir), num_frames))
        gt.append(_read_video_dir(os.path.join(root, e, gt_subdir), num_frames))
    n_frames = min(min(v.shape[0] for v in gen), min(v.shape[0] for v in gt))
    gen = np.stack([v[-n_frames:] for v in gen])
    gt = np.stack([v[-n_frames:] for v in gt])
    logger.info(f"{len(episodes)} episodes, videos {gen.shape}")

    results = batch_video_metrics(gen, gt)
    scores = {
        "psnr": results["psnr"],
        "ssim": results["ssim"],
        "psnr_per_frame": results["psnr_per_frame"].tolist(),
        "ssim_per_frame": results["ssim_per_frame"].tolist(),
        "num_videos": int(gen.shape[0]),
    }

    # FVD over I3D features. Without converted I3D weights the random-init
    # feature space is still fixed (seed 0), so values are comparable across
    # our own runs — hence the _uncalibrated suffix; exact parity with the
    # reference's styleganv FVD lands with the converted weights.
    if gen.shape[0] >= 2:
        try:
            import jax
            import jax.numpy as jnp

            from evoworld_tpu.eval.feature_nets import InceptionI3D, i3d_preprocess

            i3d = InceptionI3D()
            var = i3d.init(jax.random.key(0), jnp.zeros((1, 8, 32, 32, 3)))
            feat_fn = jax.jit(lambda v: i3d.apply(var, i3d_preprocess(v)))
            fg = np.concatenate([np.asarray(feat_fn(jnp.asarray(gen[i : i + 1]))) for i in range(gen.shape[0])])
            fr = np.concatenate([np.asarray(feat_fn(jnp.asarray(gt[i : i + 1]))) for i in range(gt.shape[0])])
            scores["fvd_uncalibrated"] = frechet_distance(fg, fr)
        except Exception as exc:
            logger.warning(f"fvd failed: {exc}")
    else:
        # Pixel-space Frechet stand-in for single-video runs.
        feats_gen = gen.reshape(gen.shape[0] * n_frames, -1)[:, ::997]
        feats_gt = gt.reshape(gt.shape[0] * n_frames, -1)[:, ::997]
        try:
            scores["pixel_frechet"] = frechet_distance(feats_gen, feats_gt)
        except Exception as exc:
            logger.warning(f"frechet failed: {exc}")

    out_path = os.path.join(root, "eval_score.json")
    with open(out_path, "w") as f:
        json.dump(scores, f, indent=2)
    logger.info(f"wrote {out_path}: psnr={scores['psnr']:.3f} ssim={scores['ssim']:.4f}")
    print(json.dumps(scores if len(str(scores)) < 500 else {k: scores[k] for k in ('psnr', 'ssim')}))


if __name__ == "__main__":
    main()
