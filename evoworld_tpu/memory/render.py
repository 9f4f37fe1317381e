"""Memory rendering: align GT cameras to the reconstruction frame and splat
the point cloud onto future panoramic views.

Replaces the reference's Open3D cubemap raster chain (`SceneBuilder.
align_extrinsics` + `CubemapRenderer.render_cubemaps_to_panoramas`,
/root/reference/evoworld/reprojection/reproject_vggt_open3d_utils.py:472-711):

  1. fit a similarity (s, R, t) on the FIRST and LAST camera centers mapping
     GT centers into the reconstruction's coordinate frame
     (`align_first_and_last_points` :1176-1213 — note the reference maps
     GT -> pred, i.e. A=gt_centers, B=pred_centers at :504-507);
  2. transform the next segment's GT camera poses with it
     (target_start = (segment_id+1)*num_target_view + 1, :491-498);
  3. render the cloud at each target pose — here via the direct
     point->equirect z-buffer splat (`evoworld_tpu.ops.splat`) instead of
     6 pinhole rasters + cube->equirect resampling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from evoworld_tpu.geometry.alignment import similarity_from_point_pairs
from evoworld_tpu.geometry.pose import invert_pose
from evoworld_tpu.ops.splat import splat_points_to_pano


def align_target_poses(
    gt_c2w: jnp.ndarray,
    pred_extrinsic_w2c: jnp.ndarray,
    segment_id: int,
    num_target_view: int = 24,
    recon_start: int = 0,
) -> jnp.ndarray:
    """Map the next segment's GT cameras into the reconstruction frame.

    Args:
        gt_c2w: (N, 4, 4) or (N, 3, 4) GT camera-to-world poses (relative,
            OpenCV RDF — the reference passes relative 4x4s,
            unified_loop_consistency.py:465-466).
        pred_extrinsic_w2c: (S, 3, 4) VGGT world-to-camera extrinsics.
        segment_id: current segment index.
        num_target_view: target views per segment (24).
        recon_start: GT pose row of the FIRST reconstructed frame (nonzero
            when the loop bounds its reconstruction window) — the
            first/last-center similarity fit must pair GT rows with the
            frames VGGT actually saw.

    Returns:
        (num_target_view, 3, 4) camera-to-world render poses in the
        reconstruction's coordinate frame.
    """
    gt_c2w = gt_c2w[..., :3, :4].astype(jnp.float32)
    pred_c2w = invert_pose(pred_extrinsic_w2c.astype(jnp.float32))
    target_start = (segment_id + 1) * num_target_view + 1

    gt_centers = gt_c2w[recon_start:target_start, :, 3]
    pred_centers = pred_c2w[:, :, 3]
    # Reference direction: B = s R A + t with A = GT centers, B = pred centers.
    s, rot, t = similarity_from_point_pairs(gt_centers, pred_centers)

    targets = gt_c2w[target_start : target_start + num_target_view]
    new_rot = s * jnp.einsum("ij,njk->nik", rot, targets[:, :, :3], precision="highest")
    new_t = s * jnp.einsum("ij,nj->ni", rot, targets[:, :, 3], precision="highest") + t
    return jnp.concatenate([new_rot, new_t[:, :, None]], axis=-1)


def render_memory_panoramas(
    points: jnp.ndarray,
    colors: jnp.ndarray,
    valid: jnp.ndarray,
    target_c2w: jnp.ndarray,
    height: int = 1000,
    width: int = 2000,
    splat_radius: int = 2,
    mesh=None,
) -> jnp.ndarray:
    """Splat the memory cloud onto each target camera.

    Note on the aligned poses: the similarity transform generally includes a
    scale s, so target_c2w's rotation block is s*R — the splat only uses it
    through rigid inversion, so we re-orthonormalize by dividing by s.

    Args:
        points: (N, 3) world points (reconstruction frame).
        colors: (N, 3) colors in [0, 1].
        valid: (N,) boolean filter mask.
        target_c2w: (T, 3, 4) render poses (possibly scaled rotations).
        mesh: optional jax Mesh — the T independent z-buffer renders shard
            over the mesh (cloud replicates, each device sorts/splats its
            view slice; no collectives). Poses pad to the device count by
            repeating the last view; the duplicates are sliced off.

    Returns:
        (T, height, width, 3) rendered memory panoramas in [0, 1]
        (zeros where no point projects — matching Open3D's black background).
    """
    rot = target_c2w[:, :, :3]
    scale = jnp.linalg.norm(rot[:, :, 0], axis=-1, keepdims=True)[:, :, None]
    rot_n = rot / jnp.maximum(scale, 1e-12)
    poses = jnp.concatenate([rot_n, target_c2w[:, :, 3:]], axis=-1)

    def render_one(c2w):
        pano, _, _ = splat_points_to_pano(
            points, colors, c2w, height, width, valid=valid, splat_radius=splat_radius
        )
        return pano

    n_dev = 0
    if mesh is not None:
        n_dev = 1
        for a in mesh.axis_names:
            n_dev *= mesh.shape[a]
    if n_dev > 1:
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        t = poses.shape[0]
        pad = (-t) % n_dev
        if pad:
            poses = jnp.concatenate([poses, jnp.repeat(poses[-1:], pad, 0)], 0)
        axes = tuple(mesh.axis_names)
        view_spec = P(axes if len(axes) > 1 else axes[0], None, None)
        out_spec = P(axes if len(axes) > 1 else axes[0], None, None, None)

        def render_shard(pts, cols, ok, ps):
            def one(c2w):
                pano, _, _ = splat_points_to_pano(
                    pts, cols, c2w, height, width, valid=ok,
                    splat_radius=splat_radius,
                )
                return pano

            return jax.lax.map(one, ps)

        fn = shard_map(
            render_shard, mesh=mesh,
            in_specs=(P(), P(), P(), view_spec), out_specs=out_spec,
        )
        return fn(points, colors, valid, poses)[:t]

    return jax.lax.map(render_one, poses)
