"""Offline equirect -> perspective extraction with look-at-center yaw.

Equivalent of `scripts/reprojection/pano_to_pers_for_train.sh` ->
`evoworld/reprojection/pano_to_pers.py:171` (reference): per episode, each
panorama frame is resampled to a 512x384 90-degree-FOV pinhole view whose
yaw points at a future pose (look-at anchor (segment+1)*24+24), writing
`perspective_look_at_center/{001..}.png` and the updated
`camera_poses_look_at_center.txt`.

Usage:
  python -m evoworld_tpu.cli.pano_to_pers --data.root=<dataset or episode>
"""

from __future__ import annotations

import math
import os

import jax.numpy as jnp
import numpy as np
from PIL import Image

from evoworld_tpu.cli.common import logger, parse_config
from evoworld_tpu.data.dataset import load_camera_poses
from evoworld_tpu.geometry.resample import equi_to_pers


def process_episode(ep_dir: str, config) -> None:
    cfg = config.loop
    out_dir = os.path.join(ep_dir, "perspective_look_at_center")
    pano_dir = os.path.join(ep_dir, "panorama")
    if os.path.isdir(out_dir) and len(os.listdir(out_dir)) >= len(os.listdir(pano_dir)):
        logger.info(f"skip {ep_dir} (already done)")
        return
    os.makedirs(out_dir, exist_ok=True)

    cam = load_camera_poses(os.path.join(ep_dir, "camera_poses.txt"))
    names = sorted(f for f in os.listdir(pano_dir) if f.endswith((".png", ".jpg")))
    new_cam = cam.copy()
    for i, name in enumerate(names):
        img = np.asarray(Image.open(os.path.join(pano_dir, name)).convert("RGB"), np.float32) / 255.0
        seg = i // (cfg.num_target_view + 1)
        look_at_idx = min((seg + 1) * cfg.num_target_view + cfg.num_target_view, len(cam) - 1)
        cur, look = cam[min(i, len(cam) - 1)], cam[look_at_idx]
        target_yaw = math.atan2(look[0] - cur[0], look[2] - cur[2])
        yaw_diff = math.radians(cur[4]) - target_yaw
        pers = equi_to_pers(
            jnp.asarray(img), yaw=yaw_diff,
            out_height=cfg.pers_height, out_width=cfg.pers_width, fov_x_deg=cfg.pers_fov_x,
        )
        Image.fromarray((np.clip(np.asarray(pers), 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"{i + 1:03d}.png")
        )
        if i < len(new_cam):
            new_cam[i, 4] = math.degrees(yaw_diff)

    with open(os.path.join(ep_dir, "camera_poses_look_at_center.txt"), "w") as f:
        f.write("Frame,PosX,PosY,PosZ,RotX,RotY,RotZ\n")
        for i, row in enumerate(new_cam):
            f.write(f"{i + 1}," + ",".join(f"{v:.6f}" for v in row) + "\n")
    logger.info(f"wrote {len(names)} perspective frames for {ep_dir}")


def main(argv=None):
    config = parse_config(argv)
    root = config.data.root
    if os.path.isdir(os.path.join(root, "panorama")):
        episodes = [root]
    else:
        episodes = [os.path.join(root, e) for e in sorted(os.listdir(root))
                    if os.path.isdir(os.path.join(root, e, "panorama"))]
    for ep in episodes:
        process_episode(ep, config)


if __name__ == "__main__":
    main()
