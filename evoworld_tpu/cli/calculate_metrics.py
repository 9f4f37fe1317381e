"""Metric aggregation over prediction directories -> eval_score.json.

Equivalent of `calculate_metrics.sh` -> `calculate_all_metrics.main`
(/root/reference/evoworld/metrics/calculate_all_metrics.py:195-227): loads
the last `num_frames` PNGs of each episode's GT and generated dirs, computes
the full reference metric family — fvd / ssim / psnr / lpips / latent_mse /
loop_closure_latent_mse — in the reference's result structure, and writes
`eval_score.json`.

Feature-net weights: pass --runtime.metric_weights_dir=<dir> containing any
of lpips.pt / inception_v4.pt / i3d.pt (torch state dicts); nets without
weights run with fixed seed-0 random init and are tagged
`"weights": "random_seed0"` in the output (comparable across our runs,
uncalibrated vs the reference harness).

Usage:
  python -m evoworld_tpu.cli.calculate_metrics --data.root=<save_dir> \
      --data.sampling=predictions_2:predictions_gt_2
  (the sampling field doubles as "<gen_subdir>:<gt_subdir>")
"""

from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image

from evoworld_tpu.cli.common import logger, parse_config
from evoworld_tpu.eval.harness import FeatureNets, calculate_all_metrics


def _load_metric_weights(weights_dir: str) -> dict:
    """Load torch state dicts for the metric nets, keyed by net name."""
    out: dict = {}
    if not weights_dir or not os.path.isdir(weights_dir):
        return out
    import torch

    # i3d_torchscript matches the reference's production FVD artifact name
    # (fvd/styleganv/fvd.py:11: `i3d_torchscript.pt`, torch.jit.load-ed).
    for name, aliases in (
        ("lpips", ("lpips",)),
        ("inception_v4", ("inception_v4",)),
        ("i3d", ("i3d", "i3d_torchscript")),
    ):
        for stem in aliases:
            for ext in (".pt", ".pth"):
                path = os.path.join(weights_dir, stem + ext)
                if not os.path.exists(path):
                    continue
                try:
                    import warnings

                    with warnings.catch_warnings():
                        # torch.load warns "looks like a TorchScript archive"
                        # before raising under weights_only=True — the except
                        # below IS the dispatch it suggests.
                        warnings.simplefilter("ignore", UserWarning)
                        sd = torch.load(path, map_location="cpu", weights_only=True)
                except Exception:
                    # TorchScript archives (the reference's i3d_torchscript.pt)
                    # are rejected by torch.load(weights_only=True); extract
                    # the state dict from the scripted module instead.
                    sd = torch.jit.load(path, map_location="cpu").state_dict()
                    logger.info(f"{path}: TorchScript archive; using jit state dict")
                if isinstance(sd, dict) and "state_dict" in sd:
                    sd = sd["state_dict"]
                out[name] = {k: v.float().numpy() for k, v in sd.items()}
                logger.info(f"loaded metric weights: {path}")
                break
            if name in out:
                break
    return out


def _read_video_dir(path: str, num_frames: int, size_hw=None) -> np.ndarray:
    """Last `num_frames` PNGs of a directory -> (N, H, W, 3) in [0, 1].

    `size_hw`: optional (H, W) to bilinear-resize mismatched frames to (used
    by the parity gate when reference frames were rendered at another size).
    """
    names = sorted(f for f in os.listdir(path) if f.lower().endswith(".png"))[-num_frames:]
    frames = []
    for n in names:
        im = Image.open(os.path.join(path, n)).convert("RGB")
        if size_hw is not None and im.size != (size_hw[1], size_hw[0]):
            im = im.resize((size_hw[1], size_hw[0]), Image.BILINEAR)
        frames.append(np.asarray(im, np.float32) / 255.0)
    return np.stack(frames)


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

    nets = FeatureNets(_load_metric_weights(getattr(config.runtime, "metric_weights_dir", "")))
    scores = calculate_all_metrics(gen, gt, nets=nets)
    scores["num_videos"] = int(gen.shape[0])

    out_path = os.path.join(root, "eval_score.json")
    with open(out_path, "w") as f:
        json.dump(scores, f, indent=2)
    logger.info(
        f"wrote {out_path}: psnr={scores['psnr']['value_mean']:.3f} "
        f"ssim={scores['ssim']['value_mean']:.4f} "
        f"lpips={scores['lpips']['value_mean']:.4f} "
        f"latent_mse={scores['latent_mse']['value_mean']:.5f}"
    )
    print(json.dumps({
        "psnr": scores["psnr"]["value_mean"],
        "ssim": scores["ssim"]["value_mean"],
        "lpips": scores["lpips"]["value_mean"],
        "latent_mse": scores["latent_mse"]["value_mean"],
        "loop_closure_latent_mse": scores["loop_closure_latent_mse"]["value_mean"],
        **({"fvd": scores["fvd"]["value_mean"]} if "fvd" in scores else {}),
    }))


if __name__ == "__main__":
    main()
