"""Spherical resampling: equirect sampling, equi->perspective, pano rotation,
cubemap <-> equirect.

Replaces the reference's CPU/equilib glue with pure-JAX gathers so all stages
can stay on device (reference: pyequilib `Equi2Pers` usage at
/root/reference/unified_loop_consistency.py:178-183,329 and pano rotation at
/root/reference/evoworld/inference/navigator_evoworld.py:466-512).

Images are channels-last (H, W, C) float arrays unless noted.
"""

from __future__ import annotations

import jax.numpy as jnp

from evoworld_tpu.geometry.rays import equirect_ray_grid, pinhole_ray_grid

_TWO_PI = 2.0 * jnp.pi


def _gather_hw(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """Gather pixels (H, W, C) at integer index grids (h, w) -> (h, w, C)."""
    return img[iy, ix]


def bilinear_sample_pano(pano: jnp.ndarray, lon: jnp.ndarray, lat: jnp.ndarray) -> jnp.ndarray:
    """Bilinearly sample an equirectangular image at spherical coordinates.

    Uses the same pixel mapping as `equirect_ray_grid`: pixel x covers
    longitude (x/W - 0.5)*2pi, so sampling coordinate u = (lon/2pi + 0.5)*W.
    Longitude wraps; latitude clamps at the poles.

    Args:
        pano: (H, W, C) image.
        lon: (...,) longitudes in radians, any range.
        lat: (...,) latitudes in radians in [-pi/2, pi/2].

    Returns:
        (..., C) sampled colors.
    """
    height, width = pano.shape[0], pano.shape[1]
    u = (lon / _TWO_PI + 0.5) * width
    v = (lat / jnp.pi + 0.5) * height
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = (u - u0)[..., None]
    dv = (v - v0)[..., None]
    u0i = jnp.mod(u0.astype(jnp.int32), width)
    u1i = jnp.mod(u0i + 1, width)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, height - 1)
    v1i = jnp.clip(v0i + 1, 0, height - 1)
    p00 = _gather_hw(pano, v0i, u0i)
    p01 = _gather_hw(pano, v0i, u1i)
    p10 = _gather_hw(pano, v1i, u0i)
    p11 = _gather_hw(pano, v1i, u1i)
    top = p00 * (1.0 - du) + p01 * du
    bot = p10 * (1.0 - du) + p11 * du
    return top * (1.0 - dv) + bot * dv


def _rot_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]], jnp.float32)


def _rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]], jnp.float32)


def _rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], jnp.float32)


def equi_to_pers(
    pano: jnp.ndarray,
    yaw: jnp.ndarray | float = 0.0,
    pitch: jnp.ndarray | float = 0.0,
    roll: jnp.ndarray | float = 0.0,
    out_height: int = 384,
    out_width: int = 512,
    fov_x_deg: float = 90.0,
) -> jnp.ndarray:
    """Extract a pinhole perspective view from an equirectangular panorama.

    Matches the reference's pyequilib call convention (rots in radians,
    `Equi2Pers(height=384, width=512, fov_x=90)` at
    /root/reference/unified_loop_consistency.py:178-183): a positive `yaw`
    turns the view toward *negative* panorama longitude, so the view center
    samples the panorama at longitude `-yaw` (the reference passes
    `yaw_diff = current_yaw - target_yaw`, which points the view at the
    world-frame target yaw). Pitch/roll are supported with positive pitch
    looking up; the reference always passes 0 for both.

    Args:
        pano: (H, W, C) equirectangular image.
        yaw, pitch, roll: view rotation in radians (scalars).

    Returns:
        (out_height, out_width, C) perspective image.
    """
    rays = pinhole_ray_grid(out_height, out_width, fov_x_deg)  # (h, w, 3) RDF
    yaw = jnp.asarray(yaw, jnp.float32)
    pitch = jnp.asarray(pitch, jnp.float32)
    roll = jnp.asarray(roll, jnp.float32)
    # Camera-to-pano rotation. With everything zero the view looks at the
    # panorama center (+Z). Positive pitch tilts the view up (-Y in RDF).
    rot = jnp.matmul(jnp.matmul(_rot_y(-yaw), _rot_x(-pitch), precision="highest"), _rot_z(-roll), precision="highest")
    d = jnp.einsum("ij,hwj->hwi", rot, rays, precision="highest")
    lon = jnp.arctan2(d[..., 0], d[..., 2])
    lat = jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0))
    return bilinear_sample_pano(pano, lon, lat)


def rotate_pano_yaw(pano: jnp.ndarray, degrees: jnp.ndarray | float) -> jnp.ndarray:
    """Rotate an equirectangular panorama about the vertical axis.

    Nearest-floor sampling semantics of the reference
    (`Navigator.rotate_panorama`, navigator_evoworld.py:466-512): output pixel
    x reads input pixel floor((x + degrees/360*W) mod W). Positive degrees
    shift content leftward (view turns right).

    Args:
        pano: (H, W, C) image.
        degrees: scalar rotation in degrees.

    Returns:
        rotated (H, W, C) image.
    """
    height, width = pano.shape[0], pano.shape[1]
    degrees = jnp.asarray(degrees, jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    shift = degrees / 360.0 * width
    src = jnp.mod(xs + shift, width)
    src_i = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, width - 1)
    return pano[:, src_i, :]


# ---------------------------------------------------------------------------
# Cubemap <-> equirect
#
# Face order and orientation are self-consistent (equi->cube->equi roundtrips
# to identity away from face seams); they intentionally do NOT mirror the
# reference's Open3D cube-face layout, because the TPU splat renderer
# (evoworld_tpu/ops/splat.py) projects points directly to equirect panoramas
# and the cubemap detour only remains for parity testing / the offline data
# engine (reference math: navigator_evoworld.py:514-705,
# reproject_vggt_open3d_utils.py:542-614).
# ---------------------------------------------------------------------------

#: face index -> unit direction of the face center, RDF frame.
CUBE_FACES = ("front", "right", "back", "left", "up", "down")


def _face_dirs(face_size: int) -> jnp.ndarray:
    """Ray directions for all 6 faces: (6, S, S, 3). Pixel-center convention."""
    s = (jnp.arange(face_size, dtype=jnp.float32) + 0.5) / face_size * 2.0 - 1.0
    a = jnp.broadcast_to(s[None, :], (face_size, face_size))  # varies along x
    b = jnp.broadcast_to(s[:, None], (face_size, face_size))  # varies along y
    one = jnp.ones_like(a)
    front = jnp.stack([a, b, one], -1)          # +Z
    right = jnp.stack([one, b, -a], -1)         # +X
    back = jnp.stack([-a, b, -one], -1)         # -Z
    left = jnp.stack([-one, b, a], -1)          # -X
    up = jnp.stack([a, -one, -b], -1)           # -Y
    down = jnp.stack([a, one, b], -1)           # +Y
    d = jnp.stack([front, right, back, left, up, down], 0)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def pano_to_cubemap(pano: jnp.ndarray, face_size: int) -> jnp.ndarray:
    """(H, W, C) equirect image -> (6, S, S, C) cube faces (see CUBE_FACES)."""
    d = _face_dirs(face_size)
    lon = jnp.arctan2(d[..., 0], d[..., 2])
    lat = jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0))
    return bilinear_sample_pano(pano, lon, lat)


def cubemap_to_pano(faces: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """(6, S, S, C) cube faces -> (H, W, C) equirect image (bilinear)."""
    face_size = faces.shape[1]
    d = equirect_ray_grid(height, width)  # (H, W, 3)
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    # Choose dominant axis.
    is_z = (az >= ax) & (az >= ay)
    is_x = (~is_z) & (ax >= ay)
    is_y = ~(is_z | is_x)
    face = jnp.where(
        is_z,
        jnp.where(z > 0, 0, 2),
        jnp.where(is_x, jnp.where(x > 0, 1, 3), jnp.where(y < 0, 4, 5)),
    )
    denom = jnp.where(is_z, az, jnp.where(is_x, ax, ay))
    denom = jnp.maximum(denom, 1e-12)
    # Per-face in-plane coordinates (must invert _face_dirs).
    u = jnp.where(
        is_z,
        jnp.where(z > 0, x, -x) / denom,
        jnp.where(is_x, jnp.where(x > 0, -z, z) / denom, x / denom),
    )
    v = jnp.where(
        is_z | is_x,
        y / denom,
        jnp.where(y < 0, -z, z) / denom,
    )
    # [-1, 1] -> pixel coordinates (pixel-center convention).
    fu = (u + 1.0) * 0.5 * face_size - 0.5
    fv = (v + 1.0) * 0.5 * face_size - 0.5
    u0 = jnp.floor(fu)
    v0 = jnp.floor(fv)
    du = (fu - u0)[..., None]
    dv = (fv - v0)[..., None]
    u0i = jnp.clip(u0.astype(jnp.int32), 0, face_size - 1)
    u1i = jnp.clip(u0i + 1, 0, face_size - 1)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, face_size - 1)
    v1i = jnp.clip(v0i + 1, 0, face_size - 1)
    p00 = faces[face, v0i, u0i]
    p01 = faces[face, v0i, u1i]
    p10 = faces[face, v1i, u0i]
    p11 = faces[face, v1i, u1i]
    top = p00 * (1.0 - du) + p01 * du
    bot = p10 * (1.0 - du) + p11 * du
    return top * (1.0 - dv) + bot * dv
