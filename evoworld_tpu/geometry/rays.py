"""Per-pixel ray direction grids.

Reference semantics: /root/reference/utils/plucker_embedding.py:56-116
(`equirectangular_to_ray`). RDF convention: X right, Y down, Z forward; the
panorama center maps to +Z, the top row to -Y.
"""

from __future__ import annotations

import jax.numpy as jnp


def equirect_ray_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Unit ray directions for every pixel of an equirectangular image.

    Pixel (x, y) maps to longitude phi = (x/W - 0.5) * 2*pi and latitude
    theta = (y/H - 0.5) * pi (pixel-corner convention, matching the
    reference's `xs / target_W` grid). The direction is

        d = [cos(theta) sin(phi), sin(theta), cos(theta) cos(phi)]

    Args:
        height: output grid height.
        width: output grid width.

    Returns:
        (height, width, 3) array of unit vectors.
    """
    ys = jnp.arange(height, dtype=dtype)
    xs = jnp.arange(width, dtype=dtype)
    theta = (ys / height - 0.5) * jnp.pi          # (H,) latitude
    phi = (xs / width - 0.5) * (2.0 * jnp.pi)     # (W,) longitude
    cos_t = jnp.cos(theta)[:, None]
    sin_t = jnp.sin(theta)[:, None]
    cos_p = jnp.cos(phi)[None, :]
    sin_p = jnp.sin(phi)[None, :]
    d_x = cos_t * sin_p
    d_y = jnp.broadcast_to(sin_t, (height, width))
    d_z = cos_t * cos_p
    return jnp.stack([d_x, d_y, d_z], axis=-1)


def pinhole_ray_grid(
    height: int,
    width: int,
    fov_x_deg: float = 90.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Unit ray directions for a pinhole camera looking down +Z (RDF).

    The horizontal field of view is `fov_x_deg`; the vertical FOV follows from
    the aspect ratio with square pixels. Pixel centers are used, so the
    principal point sits at ((W-1)/2, (H-1)/2).

    Returns:
        (height, width, 3) array of unit vectors in camera coordinates.
    """
    fx = (width / 2.0) / jnp.tan(jnp.deg2rad(jnp.asarray(fov_x_deg, dtype)) / 2.0)
    xs = jnp.arange(width, dtype=dtype) - (width - 1) / 2.0
    ys = jnp.arange(height, dtype=dtype) - (height - 1) / 2.0
    x = jnp.broadcast_to(xs[None, :], (height, width)) / fx
    y = jnp.broadcast_to(ys[:, None], (height, width)) / fx
    z = jnp.ones((height, width), dtype)
    d = jnp.stack([x, y, z], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def pinhole_intrinsics(height: int, width: int, fov_x_deg: float = 90.0, dtype=jnp.float32) -> jnp.ndarray:
    """3x3 intrinsic matrix matching `pinhole_ray_grid`."""
    import numpy as np

    fx = (width / 2.0) / np.tan(np.deg2rad(fov_x_deg) / 2.0)
    return jnp.asarray(
        [[fx, 0.0, (width - 1) / 2.0], [0.0, fx, (height - 1) / 2.0], [0.0, 0.0, 1.0]],
        dtype=dtype,
    )
