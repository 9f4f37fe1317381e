"""Offline VGGT reprojection: render training memory panoramas per episode.

Equivalent of `scripts/reprojection/reproject_vggt_open3d_for_train.sh` ->
`evoworld/reprojection/reproject_vggt_open3d.py:291` (reference): per
episode, run VGGT on the look-at-center perspective frames (excluding the
last 24), unproject depth to a world point cloud, align GT cameras, and
splat-render the last 24 views into
`rendered_panorama_vggt_open3d/{00..23}.png`. Supports chunked dataset
sharding (--data.start_idx/end_idx stand in for --chunk_num/--chunk_id) and
idempotent skip-if-done (reference :201-208).

Usage:
  python -m evoworld_tpu.cli.reproject --data.root=<dataset or episode> \
      [--loop.conf_percentile=30] [--runtime.vggt_checkpoint=...]
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
from PIL import Image

from evoworld_tpu.cli.common import logger, parse_config, save_frames
from evoworld_tpu.data.dataset import load_camera_poses
from evoworld_tpu.geometry.pose import pose_to_matrix
from evoworld_tpu.memory.pointcloud import confidence_mask
from evoworld_tpu.memory.render import render_memory_panoramas
from evoworld_tpu.geometry.alignment import similarity_from_point_pairs
from evoworld_tpu.geometry.pose import invert_pose
from evoworld_tpu.runtime import build_reconstructor


def process_episode(ep_dir: str, reconstructor, config) -> None:
    cfg = config.loop
    out_name = config.data.reprojection_name or "rendered_panorama_vggt_open3d"
    out_dir = os.path.join(ep_dir, out_name)
    if os.path.isdir(out_dir) and len(os.listdir(out_dir)) >= cfg.num_target_view:
        logger.info(f"skip {ep_dir} (already rendered)")
        return

    pers_dir = os.path.join(ep_dir, "perspective_look_at_center")
    cam_file = os.path.join(ep_dir, "camera_poses_look_at_center.txt")
    if not os.path.isdir(pers_dir):
        logger.warning(f"{ep_dir}: run cli.pano_to_pers first; skipping")
        return

    names = sorted(f for f in os.listdir(pers_dir) if f.endswith(".png"))
    source_names = names[:-cfg.num_target_view]  # exclude last 24 frames
    imgs = np.stack([
        np.asarray(Image.open(os.path.join(pers_dir, n)).convert("RGB"), np.float32) / 255.0
        for n in source_names
    ])
    preds = reconstructor(jnp.asarray(imgs))
    conf = preds["conf"]

    # Sky masking (reference default for this offline tool:
    # reproject_vggt_open3d.py:295 mask_sky = not --no_mask_sky). Zeroes
    # point confidences on sky pixels before the percentile filter.
    if config.data.mask_sky:
        from evoworld_tpu.memory.skyseg import SkySegmentation

        sky_path = config.runtime.skyseg_onnx
        if sky_path and os.path.exists(sky_path):
            proc = SkySegmentation(sky_path)
        else:
            logger.warning(
                f"skyseg weights not found at {sky_path!r}; the reference "
                "downloads skyseg.onnx here — using the weights-free "
                "heuristic mask instead (pass --data.mask_sky=false to "
                "disable sky masking entirely)"
            )
            proc = SkySegmentation(None)
        conf = proc.apply_to_conf(conf, jnp.asarray(imgs))

    cam = load_camera_poses(cam_file, unity_to_opencv=False)
    gt_c2w = pose_to_matrix(jnp.asarray(cam, jnp.float32), relative=True)

    # Align on source-frame centers, render the LAST num_target_view poses
    # (reference --only_render_last_24_frame path, :491-500).
    pred_c2w = invert_pose(preds["extrinsic"])
    s, rot, t = similarity_from_point_pairs(
        gt_c2w[: len(source_names), :, 3], pred_c2w[:, :, 3]
    )
    targets = gt_c2w[-cfg.num_target_view :]
    new_rot = s * jnp.einsum("ij,njk->nik", rot, targets[:, :, :3], precision="highest")
    new_t = s * jnp.einsum("ij,nj->ni", rot, targets[:, :, 3], precision="highest") + t
    target_c2w = jnp.concatenate([new_rot, new_t[:, :, None]], axis=-1)

    valid = confidence_mask(conf, cfg.conf_percentile).reshape(-1)
    panos = render_memory_panoramas(
        preds["world_points"].reshape(-1, 3),
        preds["colors"].reshape(-1, 3),
        valid,
        target_c2w,
        config.pipeline.height,
        config.pipeline.width,
    )
    save_frames(panos, out_dir, 0, "{:02d}.png")
    logger.info(f"rendered {cfg.num_target_view} memory panoramas for {ep_dir}")


def main(argv=None):
    config = parse_config(argv)
    root = config.data.root
    if os.path.isdir(os.path.join(root, "panorama")):
        episodes = [root]
    else:
        episodes = [os.path.join(root, e) for e in sorted(os.listdir(root))
                    if os.path.isdir(os.path.join(root, e, "panorama"))]
    end = config.data.end_idx if config.data.end_idx >= 0 else len(episodes)
    episodes = episodes[config.data.start_idx : end]
    reconstructor = build_reconstructor(config)
    for ep in episodes:
        process_episode(ep, reconstructor, config)


if __name__ == "__main__":
    main()
