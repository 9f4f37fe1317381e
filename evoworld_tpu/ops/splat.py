"""Point-cloud -> equirectangular z-buffer splatting.

TPU-native replacement for the reference's Open3D offscreen cubemap raster +
cube->equirect resampling chain
(/root/reference/evoworld/reprojection/reproject_vggt_open3d_utils.py:617-711):
instead of rendering 6 pinhole faces with a C++ rasterizer and stitching them,
we project every world point directly into the target camera's spherical
coordinates and resolve visibility with a scatter-min depth buffer. One fused
XLA program, no host round-trips, no cubemap detour.

Visibility resolution:
    1. scatter-min point depth into a (H*W,) depth buffer;
    2. points whose depth equals the buffered minimum (within eps) win;
    3. winners scatter their color (last-writer-wins among exact ties).
"""

from __future__ import annotations

import jax.numpy as jnp

from evoworld_tpu.geometry.pose import invert_pose


def splat_points_to_pano(
    points: jnp.ndarray,
    colors: jnp.ndarray,
    c2w: jnp.ndarray,
    height: int,
    width: int,
    valid: jnp.ndarray | None = None,
    splat_radius: int = 1,
    depth_eps: float = 1e-6,
):
    """Render a colored point cloud to an equirectangular panorama.

    Args:
        points: (N, 3) world-space points.
        colors: (N, C) per-point colors.
        c2w: (3, 4) camera-to-world pose of the render camera.
        height, width: output panorama size.
        valid: optional (N,) boolean mask; invalid points are dropped.
        splat_radius: half-width of the square pixel footprint per point
            (1 -> 1x1, 2 -> the point also covers its right/bottom neighbors,
            approximating Open3D's ~1px point size at higher pano resolution).
        depth_eps: tie tolerance when matching winners against the z-buffer.

    Returns:
        (pano, depth, mask): (H, W, C) colors (zero where empty), (H, W)
        depth (inf where empty), (H, W) bool coverage mask.
    """
    points = points.astype(jnp.float32)
    colors = colors.astype(jnp.float32)
    w2c = invert_pose(c2w.astype(jnp.float32))
    p_cam = jnp.einsum("ij,nj->ni", w2c[:3, :3], points, precision="highest") + w2c[:3, 3]
    depth = jnp.linalg.norm(p_cam, axis=-1)
    safe_depth = jnp.maximum(depth, 1e-12)
    d = p_cam / safe_depth[:, None]
    lon = jnp.arctan2(d[:, 0], d[:, 2])
    lat = jnp.arcsin(jnp.clip(d[:, 1], -1.0, 1.0))
    u = jnp.floor((lon / (2.0 * jnp.pi) + 0.5) * width).astype(jnp.int32)
    v = jnp.floor((lat / jnp.pi + 0.5) * height).astype(jnp.int32)
    u = jnp.mod(u, width)
    v = jnp.clip(v, 0, height - 1)

    ok = depth > 1e-9
    if valid is not None:
        ok = ok & valid

    num_px = height * width
    big = jnp.float32(jnp.inf)

    pano = jnp.zeros((num_px + 1, colors.shape[-1]), jnp.float32)
    zbuf = jnp.full((num_px + 1,), big, jnp.float32)

    offsets = [(0, 0)]
    if splat_radius > 1:
        r = splat_radius - 1
        offsets = [(dy, dx) for dy in range(0, r + 1) for dx in range(0, r + 1)]

    for dy, dx in offsets:
        vv = jnp.clip(v + dy, 0, height - 1)
        uu = jnp.mod(u + dx, width)
        flat = jnp.where(ok, vv * width + uu, num_px)
        zbuf = zbuf.at[flat].min(depth)

    for dy, dx in offsets:
        vv = jnp.clip(v + dy, 0, height - 1)
        uu = jnp.mod(u + dx, width)
        flat = jnp.where(ok, vv * width + uu, num_px)
        winner = ok & (depth <= zbuf[flat] + depth_eps)
        flat_w = jnp.where(winner, flat, num_px)
        pano = pano.at[flat_w].set(colors)

    depth_img = zbuf[:num_px].reshape(height, width)
    mask = jnp.isfinite(depth_img)
    pano_img = pano[:num_px].reshape(height, width, colors.shape[-1])
    return pano_img, depth_img, mask
