"""Scalar metric trackers for training runs.

Role of the reference's accelerate trackers (wandb/tensorboard,
/root/reference/evoworld/trainer/train_evoworld.py:117-122,:732-735 — logs
train_loss and lr per step): scalars stream to a JSONL file
(`<output_dir>/metrics.jsonl`, one record per log event) that survives
preemption and is trivially plottable; a CSV mirror is written alongside for
spreadsheet use. No external service exists in this zero-egress image, so the
sink is file-based by design.
"""

from __future__ import annotations

import json
import os
import time
from typing import Mapping


class JSONLTracker:
    """Append-only JSONL + CSV scalar sink."""

    def __init__(self, output_dir: str, run_name: str = "train"):
        os.makedirs(output_dir, exist_ok=True)
        self.jsonl_path = os.path.join(output_dir, f"{run_name}_metrics.jsonl")
        self.csv_path = os.path.join(output_dir, f"{run_name}_metrics.csv")
        self._csv_header: list[str] | None = None
        if os.path.exists(self.csv_path):
            with open(self.csv_path) as f:
                first = f.readline().strip()
            self._csv_header = first.split(",") if first else None
        self._t0 = time.time()

    def log(self, step: int, scalars: Mapping[str, float]) -> None:
        record = {"step": int(step), "wall_s": round(time.time() - self._t0, 3)}
        record.update({k: float(v) for k, v in scalars.items()})
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        keys = list(record)
        if self._csv_header is None:
            self._csv_header = keys
            with open(self.csv_path, "a") as f:
                f.write(",".join(keys) + "\n")
        with open(self.csv_path, "a") as f:
            f.write(",".join(str(record.get(k, "")) for k in self._csv_header) + "\n")

    def log_artifact(self, step: int, kind: str, path: str) -> None:
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps({"step": int(step), "artifact": kind, "path": path}) + "\n")
