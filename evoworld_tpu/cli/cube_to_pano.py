"""Batch cubemap -> panorama conversion for raw engine captures.

Equivalent of `dataset/data_engine/cube_to_pano_batched_io.py` and its
`_UE.py` variant (reference): output is one {frame}.png panorama per frame.
Decoding uses the native threaded loader; resampling is a single jitted
gather per frame. Two on-disk capture layouts are auto-detected:

  - Unity: one directory per frame holding
    {front,back,left,right,top,bottom}.png (cube_to_pano_batched_io.py).
  - UE: flat `<id>_<face>.png` files in one directory
    (cube_to_pano_batched_io_UE.py:252 regex glob).

Usage:
  python -m evoworld_tpu.cli.cube_to_pano --data.root=<captures> \
      --runtime.save_dir=<out> [--data.height=1000 --data.width=2000] \
      [--data.engine=ue]
`--data.engine=ue` selects the Unreal Engine sampling variant
(cube_to_pano_batched_io_UE.py:10-18: top/bottom faces are captured rotated
180 degrees and un-rotated at load; the projection math is Unity's).
"""

from __future__ import annotations

import os
import re

import jax.numpy as jnp
import numpy as np
from PIL import Image

from evoworld_tpu.cli.common import logger, parse_config
from evoworld_tpu.data.engine import FACE_ORDER, ue_cubes_to_pano, unity_cubes_to_pano
from evoworld_tpu.data.native_io import load_image_batch

_UE_FILE = re.compile(r"(\d+)_(top|bottom|left|right|front|back)\.png$")


def discover_frames(root: str) -> dict[str, list[str]]:
    """Map frame name -> 6 face paths in FACE_ORDER, for either layout."""
    frames: dict[str, list[str]] = {}
    for d in sorted(os.listdir(root)):
        if os.path.isdir(os.path.join(root, d)) and os.path.exists(
            os.path.join(root, d, "front.png")
        ):
            frames[d] = [os.path.join(root, d, f"{f}.png") for f in FACE_ORDER]
    if frames:
        return frames
    flat: dict[str, dict[str, str]] = {}
    for name in os.listdir(root):
        m = _UE_FILE.match(name)
        if m:
            flat.setdefault(m.group(1), {})[m.group(2)] = os.path.join(root, name)
    for fid in sorted(flat, key=int):
        if len(flat[fid]) == 6:
            frames[fid] = [flat[fid][f] for f in FACE_ORDER]
    return frames


def main(argv=None):
    config = parse_config(argv)
    root = config.data.root
    out_root = config.runtime.save_dir
    os.makedirs(out_root, exist_ok=True)
    height, width = config.data.height, config.data.width
    convert = ue_cubes_to_pano if config.data.engine == "ue" else unity_cubes_to_pano

    frames = discover_frames(root)
    if not frames:
        raise SystemExit(f"no cubemap frames (dirs or <id>_<face>.png) under {root}")
    logger.info(f"{len(frames)} cubemap frames")

    for name, paths in frames.items():
        out_path = os.path.join(out_root, f"{name}.png")
        if os.path.exists(out_path):
            continue
        probe = np.asarray(Image.open(paths[0]))
        faces = load_image_batch(paths, probe.shape[0], probe.shape[1], minus1_1=False)
        pano = convert(jnp.asarray(faces), height, width)
        Image.fromarray((np.clip(np.asarray(pano), 0, 1) * 255).astype(np.uint8)).save(out_path)
    logger.info(f"wrote panoramas to {out_root}")


if __name__ == "__main__":
    main()
