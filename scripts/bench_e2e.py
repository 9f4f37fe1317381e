"""End-to-end production-CLI benchmark on the reference example episode.

VERDICT r4 #6: bench.py/bench_loop.py measure device compute on synthetic
inputs; this runs the REAL path — `cli/run_unified` main() on
/root/reference/example/case_000 (random weights; real 2000x1000 PNGs decoded
through the native threaded loader; predictions + GT PNGs written) followed
by `cli/calculate_metrics` main() producing eval_score.json — and commits one
JSON artifact splitting host decode / host save / device phases.

Reference flow: /root/reference/run_unified_pipeline.sh:23-32 (episode loop)
then calculate_metrics.sh. Random weights mean the SCORES are meaningless
(weights-day gate: cli/validate_parity.py); the artifact's point is the
timing split and that the full production path runs on real data.

Usage (TPU tunnel):
  python scripts/bench_e2e.py [--segments 3] [--out E2E_r5.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

EPISODE = "/root/reference/example/case_000"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", type=int, default=3)
    ap.add_argument("--save-dir", default="/tmp/evoworld_e2e")
    ap.add_argument("--out", default="E2E_r5.json")
    ap.add_argument("--skip-metrics", action="store_true")
    args = ap.parse_args(argv)

    from evoworld_tpu.cli import calculate_metrics, run_unified
    from evoworld_tpu.data.native_io import native_available
    from evoworld_tpu.utils.profiling import phase_report, phase_reset

    import jax

    print(jax.devices(), flush=True)
    phase_reset()

    gen_argv = [
        f"--data.root={EPISODE}",
        "--data.single_episode=true",
        f"--runtime.save_dir={args.save_dir}",
        f"--loop.num_segments={args.segments}",
    ]
    t0 = time.perf_counter()
    run_unified.main(gen_argv)
    t_generate = time.perf_counter() - t0

    report = phase_report()

    t_metrics = None
    scores = None
    if not args.skip_metrics:
        t0 = time.perf_counter()
        last = args.segments - 1
        calculate_metrics.main([
            f"--data.root={args.save_dir}",
            f"--data.sampling=predictions_{last}:predictions_gt_{last}",
        ])
        t_metrics = time.perf_counter() - t0
        with open(os.path.join(args.save_dir, "eval_score.json")) as fh:
            raw = json.load(fh)
        scores = {k: v.get("value_mean") for k, v in raw.items()
                  if isinstance(v, dict) and "value_mean" in v}

    device_phases = {
        k: v for k, v in report.items()
        if k.split("_s")[0] in ("generate", "reconstruct", "splat_render",
                                "pers_extract")
    }
    host_phases = {k: v for k, v in report.items()
                   if k in ("host_decode", "host_save", "host_encode_overlapped")}
    result = {
        "episode": EPISODE,
        "segments": args.segments,
        "native_image_loader": bool(native_available()),
        "total_generate_s": round(t_generate, 1),
        "host_phases": host_phases,
        "device_phases": device_phases,
        "device_total_s": round(sum(v["total_s"] for v in device_phases.values()), 1),
        # critical-path host time only: host_encode_overlapped rides the
        # device shadow on the writer thread and is reported, not summed
        "host_total_s": round(sum(v["total_s"] for k, v in host_phases.items()
                                  if k != "host_encode_overlapped"), 1),
        "metrics_s": round(t_metrics, 1) if t_metrics is not None else None,
        "scores_random_weights": scores,
        "note": "random weights -> scores are plumbing evidence only; "
                "timing split is the artifact (VERDICT r4 #6)",
    }
    print(json.dumps(result, indent=2))
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=2)
        fh.write("\n")
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
