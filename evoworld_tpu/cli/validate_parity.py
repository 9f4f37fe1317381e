"""One-command weights-day parity gate.

Chains, in order, everything BASELINE.md's north-star table requires the day
real checkpoints arrive (the zero-egress build environment cannot fetch
`MODELS/evoworld_curve_unity` or `facebook/VGGT-1B`, so until then the gate
runs in --parity.dry_run=true mode with random weights to keep the plumbing
verified):

  [1/4] converter validation — the SVD pipeline dir and VGGT model.pt must
        convert cleanly into our parameter trees
        (reference consumers: unified_loop_consistency.py:125-127,
        evoworld/inference/navigator_evoworld.py:103-119);
  [2/4] single-segment generation on the example episode
        (forward_evoworld path, unified_loop_consistency.py:513-540);
  [3/4] metric scoring of the generated frames against GT (PSNR + LPIPS,
        reference formulas — calculate_psnr.py:21, calculate_lpips.py:26);
  [4/4] pass/fail against the reference's scores within --parity.tolerance
        (1%, BASELINE.md north-star table; reference scores from its
        calculate_metrics.sh eval_score.json or from its generated frames).

Usage (weights day):
  evoworld-validate-parity \
      --runtime.svd_checkpoint=<hf_svd_pipeline_dir> \
      --runtime.vggt_checkpoint=<model.pt> \
      --parity.reference_scores=<reference eval_score.json>
  # or --parity.reference_frames=<dir of reference generated PNGs>

Usage (today, CI-tested dry run — random weights, tiny shapes):
  evoworld-validate-parity --parity.dry_run=true \
      --runtime.model_preset=tiny [tiny pipeline overrides...]

See WEIGHTS.md for the full runbook.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

from evoworld_tpu.cli.common import frames_from_minus1_1, logger, parse_config, save_frames


def _step(n: int, msg: str) -> None:
    logger.info(f"[{n}/4] {msg}")


def _load_png_dir(path: str, num: int, size_hw, allow_resize: bool = False) -> np.ndarray:
    """Last `num` PNGs of a directory -> (num, H, W, 3) in [0, 1].

    Fails loudly on a frame-size mismatch unless `allow_resize`: a silently
    bilinear-resampled reference systematically shifts PSNR/LPIPS and could
    flip the 1% gate verdict without any trace in the log.
    """
    import os

    from PIL import Image

    from evoworld_tpu.cli.calculate_metrics import _read_video_dir

    names = sorted(f for f in os.listdir(path) if f.lower().endswith(".png"))
    if names:
        with Image.open(os.path.join(path, names[-1])) as im:
            found_wh = im.size
        if found_wh != (size_hw[1], size_hw[0]):
            if not allow_resize:
                raise SystemExit(
                    f"{path}: reference frames are {found_wh[0]}x{found_wh[1]} "
                    f"but generated frames are {size_hw[1]}x{size_hw[0]}; "
                    "resampling would bias the parity scores. Re-render at the "
                    "matching size, or pass --parity.resize_reference=true to "
                    "resize anyway (logged, scores are then approximate)."
                )
            logger.warning(
                f"{path}: resizing reference frames {found_wh[0]}x{found_wh[1]} "
                f"-> {size_hw[1]}x{size_hw[0]} (--parity.resize_reference); "
                "PSNR/LPIPS are biased by the resample."
            )
    frames = _read_video_dir(path, num, size_hw=size_hw)
    if frames.shape[0] < num:
        raise SystemExit(f"{path}: need {num} frames, found {frames.shape[0]}")
    return frames


def _score(gen: np.ndarray, gt: np.ndarray, nets, metrics) -> dict:
    """(F, H, W, 3) [0,1] -> {"psnr": mean, "lpips": mean} (reference math)."""
    from evoworld_tpu.eval.harness import calculate_lpips, calculate_psnr

    out = {}
    if "psnr" in metrics:
        out["psnr"] = calculate_psnr(gen[None], gt[None])["value_mean"]
    if "lpips" in metrics:
        out["lpips"] = calculate_lpips(gen[None], gt[None], nets)["value_mean"]
    return out


def _reference_scores_from_json(path: str, metrics) -> dict:
    """Extract {metric: value_mean} from a reference eval_score.json, turning
    a missing/misshapen entry into the gate's FAIL exit instead of a raw
    KeyError after minutes of generation."""
    with open(path) as fh:
        ref_json = json.load(fh)
    try:
        return {m: float(ref_json[m]["value_mean"]) for m in metrics}
    except (KeyError, TypeError) as exc:
        print(f"PARITY GATE: FAIL ({path} has no <metric>.value_mean entry "
              f"for {exc!r}; metrics requested: {', '.join(metrics)})")
        sys.exit(1)


def _gate(ours: dict, theirs: dict, metrics, tolerance: float, source: str,
          log=None) -> list:
    """Compare per-metric scores; returns the metrics outside `tolerance`
    relative difference (the BASELINE.md north-star 1% gate)."""
    failed = []
    for m in metrics:
        rel = abs(ours[m] - theirs[m]) / max(abs(theirs[m]), 1e-12)
        status = "ok" if rel <= tolerance else "FAIL"
        if log is not None:
            log(f"  {m}: ours={ours[m]:.6f} reference={theirs[m]:.6f} "
                f"rel-diff={rel:.4%} [{status}] (reference: {source})")
        if rel > tolerance:
            failed.append(m)
    return failed


def main(argv=None) -> None:
    config = parse_config(argv)
    p, rt, data = config.parity, config.runtime, config.data
    metrics = tuple(m.strip() for m in p.metrics.split(",") if m.strip())
    problems: list[str] = []

    # ---- [1/4] converter validation ---------------------------------
    _step(1, "converter validation")
    svd_dir = rt.svd_checkpoint or rt.checkpoint_dir
    if svd_dir and os.path.isdir(svd_dir):
        from evoworld_tpu.cli.convert_checkpoint import validate_pipeline_dir

        problems += validate_pipeline_dir(svd_dir)
    elif not p.dry_run:
        problems.append("no --runtime.svd_checkpoint pipeline dir given")
    else:
        logger.info("  dry run: skipping SVD converter check (random weights)")
    if rt.vggt_checkpoint and os.path.exists(rt.vggt_checkpoint):
        from evoworld_tpu.models.vggt.weights import load_vggt_torch_checkpoint

        _, report = load_vggt_torch_checkpoint(rt.vggt_checkpoint)
        problems += [f"vggt: {r}" for r in report]
        logger.info(f"  vggt: {'OK' if not report else report[:5]}")
    elif not p.dry_run:
        logger.warning("  no --runtime.vggt_checkpoint (single-segment gate "
                       "does not need it; the unified loop does)")
    if problems:
        # Gate on converter problems even in dry-run mode: `problems` only
        # accumulates when a checkpoint WAS supplied, and a broken converter
        # is exactly what the dry run exists to catch before weights day.
        for pr in problems[:20]:
            logger.error(f"  converter problem: {pr}")
        print("PARITY GATE: FAIL (converter validation)")
        sys.exit(1)

    # ---- [2/4] single-segment generation on the example episode -----
    _step(2, f"single-segment generation on {data.root}")
    import jax
    import jax.numpy as jnp

    from evoworld_tpu.data.dataset import EpisodeDataset
    from evoworld_tpu.loop.navigator import Navigator
    from evoworld_tpu.runtime import build_pipeline

    dataset = EpisodeDataset(
        data.root,
        height=config.pipeline.height,
        width=config.pipeline.width,
        sequence_length=data.sequence_length,
        sampling="reprojection",
        reprojection_name=data.reprojection_name,
        memory_path=data.memory_path,
        pos_scale=data.pos_scale,
        single_episode=True,
    )
    sample = dataset[0]
    pipeline = build_pipeline(config)
    navigator = Navigator(pipeline, num_frames=config.pipeline.num_frames)
    frames = np.asarray(navigator.generate_segment(
        sample.cam_traj,
        jnp.asarray(sample.pixel_values[0]),
        jnp.asarray(sample.memory_values[: config.pipeline.num_frames]),
        jax.random.key(rt.seed),
        use_memory=True,
    ))
    gt = frames_from_minus1_1(sample.pixel_values[: frames.shape[0]])
    if rt.save_dir:
        out_dir = os.path.join(rt.save_dir, "validate_parity")
        save_frames(frames, os.path.join(out_dir, "predictions"))
        save_frames(gt, os.path.join(out_dir, "predictions_gt"))
        logger.info(f"  wrote frames to {out_dir}")

    # ---- [3/4] metric scoring vs GT ----------------------------------
    _step(3, f"scoring {'+'.join(metrics)} vs GT")
    from evoworld_tpu.cli.calculate_metrics import _load_metric_weights
    from evoworld_tpu.eval.harness import FeatureNets

    weights = _load_metric_weights(rt.metric_weights_dir)
    if "lpips" in metrics and "lpips" not in weights:
        # Without real AlexNet features, LPIPS degrades to seed-0 random
        # projections — self-consistent but NOT what the reference measured.
        if p.dry_run:
            logger.warning("  no lpips weights in --runtime.metric_weights_dir:"
                           " scoring with random features (dry run only)")
        else:
            print("PARITY GATE: FAIL (lpips requested but no lpips.pt under "
                  "--runtime.metric_weights_dir — random-feature LPIPS would "
                  "not measure what the reference measured)")
            sys.exit(1)
    nets = FeatureNets(weights)
    ours = _score(frames, np.asarray(gt), nets, metrics)
    for k, v in ours.items():
        logger.info(f"  ours.{k} = {v:.6f}")

    # ---- [4/4] gate vs the reference ---------------------------------
    _step(4, f"gate: within {p.tolerance:.1%} of the reference")
    if p.reference_scores:
        theirs = _reference_scores_from_json(p.reference_scores, metrics)
        source = p.reference_scores
    elif p.reference_frames:
        ref_frames = _load_png_dir(p.reference_frames, frames.shape[0],
                                   frames.shape[1:3],
                                   allow_resize=p.resize_reference)
        theirs = _score(ref_frames, np.asarray(gt), nets, metrics)
        source = p.reference_frames
    elif p.dry_run:
        # Plumbing check: gate our scores against themselves end-to-end.
        theirs = dict(ours)
        source = "dry-run self-comparison"
    else:
        print("PARITY GATE: FAIL (no --parity.reference_scores or "
              "--parity.reference_frames given)")
        sys.exit(1)

    failed = _gate(ours, theirs, metrics, p.tolerance, source, log=logger.info)

    tag = " (DRY RUN — random weights; re-run with real checkpoints)" if p.dry_run else ""
    if failed:
        print(f"PARITY GATE: FAIL ({', '.join(failed)} outside "
              f"{p.tolerance:.1%}){tag}")
        sys.exit(1)
    print(f"PARITY GATE: PASS ({', '.join(metrics)} within {p.tolerance:.1%}){tag}")


if __name__ == "__main__":
    main()
