"""VGGT camera-encoding and unprojection utilities.

Contract from the reference call sites (SURVEY.md §2.9;
/root/reference/unified_loop_consistency.py:352,:366):
  - pose_encoding_to_extri_intri(pose_enc (S, 9), (H, W))
      -> extrinsic (S, 3, 4) w2c, intrinsic (S, 3, 3)
    where pose_enc = [t (3), quaternion (4, scalar-last xyzw), fov (2)]
    ("absT_quaR_FoV" encoding of upstream VGGT).
  - unproject_depth_map_to_point_map(depth (S, H, W, 1), extrinsic,
      intrinsic) -> (S, H, W, 3) world points.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) quaternion [x, y, z, w] -> (..., 3, 3) rotation matrix."""
    q = quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-12)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def pose_encoding_to_extri_intri(pose_enc: jnp.ndarray, image_hw: tuple[int, int]):
    """Decode the 9-d camera encoding to extrinsics + intrinsics.

    Args:
        pose_enc: (S, 9) [tx, ty, tz, qx, qy, qz, qw, fov_h, fov_w].
        image_hw: (H, W) of the model's working resolution.

    Returns:
        extrinsic (S, 3, 4) world-to-camera, intrinsic (S, 3, 3).
    """
    height, width = image_hw
    t = pose_enc[:, 0:3]
    quat = pose_enc[:, 3:7]
    # Clamp FOVs into (0, pi): a no-op for any trained checkpoint (VGGT fovs
    # sit near 0.7 rad) but keeps intrinsics well-conditioned under the
    # random-weight smoke path, where raw head outputs near 0 (or negative)
    # would otherwise produce exploding / negative focal lengths.
    fov_h = jnp.clip(jnp.abs(pose_enc[:, 7]), 0.05, 3.1)
    fov_w = jnp.clip(jnp.abs(pose_enc[:, 8]), 0.05, 3.1)
    rot = quat_to_rotmat(quat)
    extrinsic = jnp.concatenate([rot, t[:, :, None]], axis=-1)

    fy = (height / 2.0) / jnp.tan(fov_h / 2.0)
    fx = (width / 2.0) / jnp.tan(fov_w / 2.0)
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    intrinsic = jnp.stack(
        [
            jnp.stack([fx, zeros, jnp.full_like(fx, width / 2.0)], -1),
            jnp.stack([zeros, fy, jnp.full_like(fy, height / 2.0)], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=-2,
    )
    return extrinsic, intrinsic


def unproject_depth_map_to_point_map(
    depth: jnp.ndarray, extrinsic: jnp.ndarray, intrinsic: jnp.ndarray
) -> jnp.ndarray:
    """Depth maps -> world-space point maps.

    Args:
        depth: (S, H, W) or (S, H, W, 1) z-depth along the camera axis.
        extrinsic: (S, 3, 4) world-to-camera.
        intrinsic: (S, 3, 3).

    Returns:
        (S, H, W, 3) world points.
    """
    if depth.ndim == 4:
        depth = depth[..., 0]
    s, height, width = depth.shape
    us = jnp.arange(width, dtype=jnp.float32)
    vs = jnp.arange(height, dtype=jnp.float32)
    uu = jnp.broadcast_to(us[None, :], (height, width))
    vv = jnp.broadcast_to(vs[:, None], (height, width))

    fx = intrinsic[:, 0, 0][:, None, None]
    fy = intrinsic[:, 1, 1][:, None, None]
    cx = intrinsic[:, 0, 2][:, None, None]
    cy = intrinsic[:, 1, 2][:, None, None]

    x = (uu[None] - cx) / fx * depth
    y = (vv[None] - cy) / fy * depth
    p_cam = jnp.stack([x, y, depth], axis=-1)                  # (S, H, W, 3)

    rot = extrinsic[:, :, :3]
    t = extrinsic[:, :, 3]
    # world = R^T (p_cam - t)
    p = p_cam - t[:, None, None, :]
    return jnp.einsum("sij,shwj->shwi", jnp.swapaxes(rot, -1, -2), p, precision="highest")
