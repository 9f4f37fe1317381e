"""Pose alignment: similarity transforms between predicted and GT cameras.

Reference semantics:
  - two-point similarity fit (`align_first_and_last_points`,
    /root/reference/evoworld/reprojection/reproject_vggt_open3d_utils.py:1176-1213)
    with `rotation_from_vectors` (:1126-1174, Rodrigues).
  - full Kabsch similarity (`get_camera_transformation`, :1000-1051).

All functions are jit-friendly jnp implementations (degenerate branches via
`jnp.where` instead of Python conditionals).
"""

from __future__ import annotations

import jax.numpy as jnp


def rotation_between_vectors(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix taking direction u to direction v (Rodrigues formula).

    Degenerate cases (zero-length inputs, parallel vectors) return identity;
    antiparallel vectors return a TRUE 180-degree rotation (2 pp^T - I about
    a perpendicular axis p). Known deviation: the reference's special case
    (reproject_vggt_open3d_utils.py:1161, `np.eye(3) - 2*np.outer(w, w)`) is
    a det=-1 reflection that maps u to +u instead of -u — a bug we fix
    rather than reproduce.
    """
    u = u.astype(jnp.float32)
    v = v.astype(jnp.float32)
    nu = jnp.linalg.norm(u)
    nv = jnp.linalg.norm(v)
    safe_nu = jnp.maximum(nu, 1e-15)
    safe_nv = jnp.maximum(nv, 1e-15)
    u_hat = u / safe_nu
    v_hat = v / safe_nv
    dot = jnp.clip(jnp.dot(u_hat, v_hat, precision="highest"), -1.0, 1.0)

    w = jnp.cross(u_hat, v_hat)
    w_norm = jnp.linalg.norm(w)
    w_hat = w / jnp.maximum(w_norm, 1e-15)
    angle = jnp.arccos(dot)
    k = jnp.array(
        [
            [0.0, -w_hat[2], w_hat[1]],
            [w_hat[2], 0.0, -w_hat[0]],
            [-w_hat[1], w_hat[0], 0.0],
        ],
        jnp.float32,
    )
    kk = jnp.matmul(k, k, precision="highest")
    general = jnp.eye(3) + jnp.sin(angle) * k + (1.0 - jnp.cos(angle)) * kk

    # Antiparallel: 180-degree rotation about an axis perpendicular to u
    # (R = 2 pp^T - I has det=+1 and maps u -> -u).
    alt = jnp.where(jnp.abs(u_hat[0]) > 0.9, jnp.array([0.0, 1.0, 0.0]), jnp.array([1.0, 0.0, 0.0]))
    perp = jnp.cross(u_hat, alt)
    perp = perp / jnp.maximum(jnp.linalg.norm(perp), 1e-15)
    flip = 2.0 * jnp.outer(perp, perp) - jnp.eye(3)

    out = jnp.where(jnp.isclose(dot, 1.0), jnp.eye(3), jnp.where(jnp.isclose(dot, -1.0), flip, general))
    return jnp.where((nu < 1e-15) | (nv < 1e-15), jnp.eye(3), out)


def similarity_from_point_pairs(a: jnp.ndarray, b: jnp.ndarray):
    """Fit (s, R, t) so that b[0] = s R a[0] + t and b[-1] = s R a[-1] + t.

    Only the first and last rows of each (N, 3) array are used, matching the
    reference's `align_first_and_last_points`.

    Returns:
        scale (scalar), rotation (3, 3), translation (3,).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a0, a1 = a[0], a[-1]
    b0, b1 = b[0], b[-1]
    va = a1 - a0
    vb = b1 - b0
    len_a = jnp.linalg.norm(va)
    len_b = jnp.linalg.norm(vb)
    degenerate = len_a < 1e-15
    s = jnp.where(degenerate, 1.0, len_b / jnp.maximum(len_a, 1e-15))
    rot = jnp.where(degenerate, jnp.eye(3), rotation_between_vectors(va, vb))
    t = b0 - s * jnp.matmul(rot, a0, precision="highest")
    return s, rot, t


def kabsch_similarity(gt_centers: jnp.ndarray, pred_centers: jnp.ndarray):
    """Least-squares scale + Kabsch rotation/translation from pred to GT.

    Mirrors the reference's `get_camera_transformation` (:1000-1051): scale
    theta = <gt, pred>/<pred, pred> fit first, then Kabsch on the scaled,
    centered point sets with a determinant sign fix.

    Args:
        gt_centers: (N, 3) target points.
        pred_centers: (N, 3) source points.

    Returns:
        theta (scalar), rotation (3, 3), translation (3,).
    """
    gt = gt_centers.astype(jnp.float32)
    pred = pred_centers.astype(gt.dtype)
    theta = jnp.sum(gt * pred) / jnp.maximum(jnp.sum(pred * pred), 1e-15)
    pred_s = theta * pred
    cg = gt.mean(axis=0)
    cp = pred_s.mean(axis=0)
    h = jnp.matmul((pred_s - cp).T, gt - cg, precision="highest")
    u, _, vt = jnp.linalg.svd(h)
    det = jnp.linalg.det(jnp.matmul(vt.T, u.T, precision="highest"))
    d = jnp.array([1.0, 1.0, 0.0], gt.dtype) + jnp.array([0.0, 0.0, 1.0], gt.dtype) * jnp.sign(det)
    rot = jnp.matmul(vt.T * d[None, :], u.T, precision="highest")
    t = cg - jnp.matmul(rot, cp, precision="highest")
    return theta, rot, t


def apply_similarity(points: jnp.ndarray, s, rot: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Apply x -> s R x + t to (..., 3) points."""
    return s * jnp.einsum("ij,...j->...i", rot, points, precision="highest") + t
