"""Batch cubemap -> panorama conversion for raw Unity captures.

Equivalent of `dataset/data_engine/cube_to_pano_batched_io.py` (reference):
input is a directory of frame dirs each holding
{front,back,left,right,top,bottom}.png; output is one {frame}.png panorama
per frame. Decoding uses the native threaded loader; resampling is a single
jitted gather per frame.

Usage:
  python -m evoworld_tpu.cli.cube_to_pano --data.root=<captures> \
      --runtime.save_dir=<out> [--data.height=1000 --data.width=2000] \
      [--data.sampling=ue]
`--data.sampling=ue` selects the Unreal Engine capture variant (reference
cube_to_pano_batched_io_UE.py: 180-degree-rotated top/bottom faces, pi
longitude shift).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
from PIL import Image

from evoworld_tpu.cli.common import logger, parse_config
from evoworld_tpu.data.engine import FACE_ORDER, ue_cubes_to_pano, unity_cubes_to_pano
from evoworld_tpu.data.native_io import load_image_batch


def main(argv=None):
    config = parse_config(argv)
    root = config.data.root
    out_root = config.runtime.save_dir
    os.makedirs(out_root, exist_ok=True)
    height, width = config.data.height, config.data.width
    convert = ue_cubes_to_pano if config.data.sampling == "ue" else unity_cubes_to_pano

    frames = sorted(
        d for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d))
        and os.path.exists(os.path.join(root, d, "front.png"))
    )
    if not frames:
        raise SystemExit(f"no cubemap frame dirs under {root}")
    logger.info(f"{len(frames)} cubemap frames")

    for name in frames:
        out_path = os.path.join(out_root, f"{name}.png")
        if os.path.exists(out_path):
            continue
        paths = [os.path.join(root, name, f"{f}.png") for f in FACE_ORDER]
        probe = np.asarray(Image.open(paths[0]))
        faces = load_image_batch(paths, probe.shape[0], probe.shape[1], minus1_1=False)
        pano = convert(jnp.asarray(faces), height, width)
        Image.fromarray((np.clip(np.asarray(pano), 0, 1) * 255).astype(np.uint8)).save(out_path)
    logger.info(f"wrote panoramas to {out_root}")


if __name__ == "__main__":
    main()
