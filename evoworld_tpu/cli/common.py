"""Shared CLI plumbing: config parsing, frame IO, seeding."""

from __future__ import annotations

import os
import sys

import numpy as np

from evoworld_tpu.config import EvoWorldConfig, apply_overrides, describe
from evoworld_tpu.utils.compile_cache import enable_persistent_cache
from evoworld_tpu.utils.logging import get_logger

enable_persistent_cache()

logger = get_logger()


def parse_config(argv=None) -> EvoWorldConfig:
    argv = sys.argv[1:] if argv is None else argv
    if "--help" in argv or "-h" in argv:
        print(__doc__ or "")
        print("Overrides: --section.field=value; sections:",
              ", ".join(EvoWorldConfig.__dataclass_fields__))
        print(describe(EvoWorldConfig()))
        raise SystemExit(0)
    return apply_overrides(EvoWorldConfig(), argv)


def save_frames(frames: np.ndarray, out_dir: str, start_index: int = 0, fmt: str = "{:03d}.png"):
    """(N, H, W, 3) [0, 1] floats -> PNG files (reference save_frames naming,
    forward_evoworld.py:159-180). Uses the C++ threaded PNG encoder when
    built (`make -C native`); PIL otherwise."""
    os.makedirs(out_dir, exist_ok=True)
    arr = np.clip(np.asarray(frames), 0.0, 1.0)
    u8 = (arr * 255).astype(np.uint8)
    paths = [os.path.join(out_dir, fmt.format(start_index + i)) for i in range(len(u8))]

    from evoworld_tpu.data.native_io import save_png_batch

    if save_png_batch(paths, u8):
        return
    from PIL import Image

    for path, frame in zip(paths, u8):
        Image.fromarray(frame).save(path)


def frames_from_minus1_1(frames: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(frames) / 2.0 + 0.5, 0.0, 1.0)
