"""Pluecker camera-ray embeddings.

Reference semantics: /root/reference/utils/plucker_embedding.py:221-255
(`ray_c2w_to_plucker`, torch path used by the model): the output channel order
is [direction(3), moment(3)] where moment = origin x direction.
"""

from __future__ import annotations

import jax.numpy as jnp


def plucker_embedding(rays: jnp.ndarray, c2w: jnp.ndarray) -> jnp.ndarray:
    """World-frame Pluecker coordinates for camera rays under N poses.

    Args:
        rays: (H, W, 3) unit ray directions in camera coordinates.
        c2w: (N, 3, 4) camera-to-world transforms (rotation | translation).

    Returns:
        (N, 6, H, W) array; channels 0:3 are the world-frame ray directions,
        channels 3:6 the moments t x d.
    """
    rays = rays.astype(jnp.float32)
    c2w = c2w.astype(jnp.float32)
    rot = c2w[:, :3, :3]
    t = c2w[:, :3, 3]
    d_world = jnp.einsum("nij,hwj->nhwi", rot, rays, precision="highest")
    origin = jnp.broadcast_to(t[:, None, None, :], d_world.shape)
    moment = jnp.cross(origin, d_world)
    plucker = jnp.concatenate([d_world, moment], axis=-1)  # (N, H, W, 6)
    return plucker.transpose(0, 3, 1, 2)
