"""Camera pose math: Euler angles -> SE(3), relative poses, Unity->OpenCV.

Reference semantics:
  - R = Rz @ Ry @ Rx with angles in degrees:
    /root/reference/dataset/CameraTrajDataset.py:643-779 and
    /root/reference/utils/geometry.py:5-89.
  - relative-to-first: F_rel[i] = F[0]^{-1} @ F[i] computed analytically with
    R0^T and -R0^T t0.
  - Unity (left-handed) -> OpenCV RDF via elementwise sign flips
    (1,-1,1,-1,1,-1): /root/reference/utils/constant.py:3.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

#: Sign flips applied to [x, y, z, rotx, roty, rotz] to convert Unity poses
#: to the OpenCV right-down-forward frame.
UNITY_TO_OPENCV = np.array([1.0, -1.0, 1.0, -1.0, 1.0, -1.0], dtype=np.float32)


def unity_to_opencv(xyz_euler: jnp.ndarray) -> jnp.ndarray:
    """Apply the Unity->OpenCV sign convention to (..., 6) pose rows."""
    return xyz_euler * jnp.asarray(UNITY_TO_OPENCV, dtype=xyz_euler.dtype)


def euler_deg_to_rotmat(euler_deg: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) [rotx, roty, rotz] degrees -> (..., 3, 3) with R = Rz@Ry@Rx."""
    rad = jnp.deg2rad(euler_deg.astype(jnp.float32))
    cx, cy, cz = jnp.cos(rad[..., 0]), jnp.cos(rad[..., 1]), jnp.cos(rad[..., 2])
    sx, sy, sz = jnp.sin(rad[..., 0]), jnp.sin(rad[..., 1]), jnp.sin(rad[..., 2])
    # Rows of R = Rz @ Ry @ Rx, expanded analytically.
    r00 = cz * cy
    r01 = cz * sy * sx - sz * cx
    r02 = cz * sy * cx + sz * sx
    r10 = sz * cy
    r11 = sz * sy * sx + cz * cx
    r12 = sz * sy * cx - cz * sx
    r20 = -sy
    r21 = cy * sx
    r22 = cy * cx
    rows = jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def pose_to_matrix(
    xyz_euler: jnp.ndarray,
    relative: bool = False,
    homogeneous: bool = False,
) -> jnp.ndarray:
    """Convert (B, 6) [x, y, z, rotx, roty, rotz] rows to camera matrices.

    Args:
        xyz_euler: (B, 6) pose rows, angles in degrees.
        relative: if True, re-express every pose relative to the first frame:
            F_rel[i] = F[0]^{-1} @ F[i].
        homogeneous: if True, return (B, 4, 4); otherwise (B, 3, 4).

    Returns:
        (B, 3, 4) or (B, 4, 4) camera-to-world transforms.
    """
    xyz_euler = xyz_euler.astype(jnp.float32)
    rot = euler_deg_to_rotmat(xyz_euler[:, 3:6])  # (B, 3, 3)
    t = xyz_euler[:, 0:3][..., None]              # (B, 3, 1)
    if relative:
        r0_inv = rot[0].T
        # Full-precision matmuls: the platform default truncates to bf16,
        # which is far too coarse for pose chains.
        rot = jnp.einsum("ij,bjk->bik", r0_inv, rot, precision="highest")
        t = jnp.einsum("ij,bjk->bik", r0_inv, t - t[0], precision="highest")
    mat = jnp.concatenate([rot, t], axis=-1)      # (B, 3, 4)
    if homogeneous:
        bottom = jnp.zeros((mat.shape[0], 1, 4), mat.dtype).at[:, 0, 3].set(1.0)
        mat = jnp.concatenate([mat, bottom], axis=1)
    return mat


def invert_pose(mat34: jnp.ndarray) -> jnp.ndarray:
    """Invert (..., 3, 4) rigid transforms: (R, t) -> (R^T, -R^T t)."""
    rot = mat34[..., :3, :3]
    t = mat34[..., :3, 3:]
    rot_inv = jnp.swapaxes(rot, -1, -2)
    t_inv = -jnp.einsum("...ij,...jk->...ik", rot_inv, t, precision="highest")
    return jnp.concatenate([rot_inv, t_inv], axis=-1)


def compose_poses(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose (..., 3, 4) rigid transforms: result = a @ b (as 4x4s)."""
    rot = jnp.einsum("...ij,...jk->...ik", a[..., :3, :3], b[..., :3, :3], precision="highest")
    t = jnp.einsum("...ij,...jk->...ik", a[..., :3, :3], b[..., :3, 3:], precision="highest") + a[..., :3, 3:]
    return jnp.concatenate([rot, t], axis=-1)
