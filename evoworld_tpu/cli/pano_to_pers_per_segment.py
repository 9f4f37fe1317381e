"""Per-segment equirect -> perspective extraction with prior-segment
aggregation (offline training-data prep).

Equivalent of `evoworld/reprojection/pano_to_pers_per_segment.py` (reference:
collect_image_paths :124-156 aggregates frames from all sibling
`<prefix>_{0..segment_id}` directories, deduplicated by file name;
calculate_target_yaw :78-87 points each frame's yaw at the look-at anchor
(segment_id+1)*24+24; the updated yaws overwrite column 4 of the camera file
:216-222).

Usage:
  python -m evoworld_tpu.cli.pano_to_pers_per_segment \
      --data.root=<dir ending in _<k>, e.g. .../predictions_1> \
      --loop.segment_id is taken from the directory suffix \
      [--data.sampling=<output_folder>:<output_camera_file>]
The camera file defaults to `camera_poses.txt` next to the segment dirs.
"""

from __future__ import annotations

import math
import os

import jax.numpy as jnp
import numpy as np
from PIL import Image

from evoworld_tpu.cli.common import logger, parse_config
from evoworld_tpu.geometry.pose import UNITY_TO_OPENCV
from evoworld_tpu.geometry.resample import equi_to_pers


def calculate_segment_indices(segment_id: int, num_target_view: int = 24):
    """start, end, look_at for a segment (reference pano_to_pers_utils.py:5-14)."""
    look_at_idx = (segment_id + 1) * num_target_view + num_target_view
    start_idx = segment_id * num_target_view + 1
    if segment_id == 0:
        start_idx -= 1
    return start_idx, start_idx + num_target_view + 1, look_at_idx


def collect_image_paths(data_folder: str, segment_id: int) -> list[str]:
    """Aggregate frames across `<prefix>_{0..segment_id}`, dedup by name."""
    data_folder = os.path.abspath(data_folder).rstrip("/")
    if segment_id == 0:
        return [
            os.path.join(data_folder, n)
            for n in sorted(os.listdir(data_folder)) if n.endswith(".png")
        ]
    prefix = os.path.basename(data_folder).rsplit("_", 1)[0]
    root = os.path.dirname(data_folder)
    paths, seen = [], set()
    for seg in range(segment_id + 1):
        seg_dir = os.path.join(root, f"{prefix}_{seg}")
        if not os.path.isdir(seg_dir):
            continue
        for name in sorted(os.listdir(seg_dir)):
            if name.endswith(".png") and name not in seen:
                seen.add(name)
                paths.append(os.path.join(seg_dir, name))
    return paths


def _read_rdf_camera_file(path: str) -> np.ndarray:
    rows = [
        [float(x) for x in line.strip().split(",")[1:]]
        for line in open(path).readlines()[1:]
    ]
    return np.asarray(rows, np.float64) * np.asarray(UNITY_TO_OPENCV, np.float64)


def main(argv=None):
    config = parse_config(argv)
    data_folder = config.data.root.rstrip("/")
    base = os.path.basename(data_folder)
    try:
        segment_id = int(base.rsplit("_", 1)[1])
    except (IndexError, ValueError):
        raise SystemExit(f"--data.root must end in _<segment_id>, got {base}")

    spec = config.data.sampling if ":" in config.data.sampling else ""
    out_folder, out_camera = (spec.split(":") + [""])[:2] if spec else ("", "")
    episode_dir = os.path.dirname(data_folder)
    out_folder = out_folder or os.path.join(episode_dir, f"perspective_{segment_id}")
    out_camera = out_camera or os.path.join(
        episode_dir, f"camera_poses_look_at_center_{segment_id}.txt"
    )
    camera_file = os.path.join(episode_dir, "camera_poses.txt")

    cfg = config.loop
    _, end_idx, look_at_idx = calculate_segment_indices(segment_id, cfg.num_target_view)
    cam = _read_rdf_camera_file(camera_file)
    look_at_idx = min(look_at_idx, len(cam) - 1)
    os.makedirs(out_folder, exist_ok=True)

    paths = collect_image_paths(data_folder, segment_id)
    logger.info(f"segment {segment_id}: {len(paths)} frames, look_at={look_at_idx}")
    target_yaws = []
    for path in paths:
        idx = int(os.path.basename(path).split(".")[0].split("_")[-1])
        cur = cam[idx - 1]
        look = cam[look_at_idx]
        target = math.atan2(look[0] - cur[0], look[2] - cur[2])
        yaw_diff = math.radians(cur[4]) - target
        img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        pers = equi_to_pers(
            jnp.asarray(img), yaw=yaw_diff,
            out_height=cfg.pers_height, out_width=cfg.pers_width,
            fov_x_deg=cfg.pers_fov_x,
        )
        Image.fromarray((np.clip(np.asarray(pers), 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(out_folder, f"frame_{idx:03d}.png")
        )
        target_yaws.append(math.degrees(yaw_diff))

    if target_yaws:
        lo = max(0, end_idx - len(target_yaws))
        cam[lo:end_idx, 4] = target_yaws[: end_idx - lo]
    with open(out_camera, "w") as f:
        for i, row in enumerate(cam):
            f.write(f"{i + 1} " + " ".join(str(v) for v in row) + "\n")
    logger.info(f"wrote {len(paths)} frames -> {out_folder}; camera -> {out_camera}")


if __name__ == "__main__":
    main()
