"""Offline data engine: Unity cubemap captures -> equirectangular panoramas.

JAX port of the reference's batched CUDA converter
(/root/reference/dataset/data_engine/cube_to_pano_batched_io.py:56-128):
each captured frame is a directory of 6 face PNGs
({front,back,left,right,top,bottom}.png); the converter resamples them into
a (H, W) equirectangular panorama with the reference's exact face-selection
and UV math (including its rotated longitude convention
lon = -x/W*2pi - pi + pi/2). The Unity capture itself (C# scripts,
SURVEY.md §2.3) stays out of scope — only the on-disk format matters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

FACE_ORDER = ("right", "left", "bottom", "top", "front", "back")


@functools.partial(jax.jit, static_argnames=("height", "width"))
def unity_cubes_to_pano(faces: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """(6, S, S, 3) float faces in FACE_ORDER -> (H, W, 3) panorama.

    Vectorized nearest-neighbor resampling with the reference's coordinate
    conventions (cube_to_pano_batched_io.py:70-127).
    """
    face_size = faces.shape[1]
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    yv = jnp.broadcast_to(xs[None, :], (height, width))   # note: reference
    xv = jnp.broadcast_to(ys[:, None], (height, width))   # swaps names

    lon = (-yv / width) * 2.0 * jnp.pi - jnp.pi + jnp.pi / 2.0
    lat = (xv / height) * jnp.pi - jnp.pi / 2.0

    x = jnp.cos(lat) * jnp.cos(lon)
    y = jnp.sin(lat)
    z = jnp.cos(lat) * jnp.sin(lon)
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    is_x = (ax >= ay) & (ax >= az)
    is_y = (ay >= ax) & (ay >= az) & ~is_x
    is_z = ~(is_x | is_y)
    face = jnp.where(
        is_x, jnp.where(x > 0, 0, 1),
        jnp.where(is_y, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5)),
    )

    safe = lambda d: jnp.maximum(d, 1e-12)
    u = jnp.where(
        is_x, jnp.where(x > 0, -z, z) / safe(ax),
        jnp.where(is_y, -x / safe(ay), jnp.where(z > 0, x, -x) / safe(az)),
    )
    v = jnp.where(
        is_x, -y / safe(ax),
        jnp.where(is_y, jnp.where(y > 0, -z, z) / safe(ay), -y / safe(az)),
    )
    u = (u + 1.0) / 2.0
    v = (v + 1.0) / 2.0
    u_px = jnp.clip((u * (face_size - 1)).astype(jnp.int32), 0, face_size - 1)
    v_px = jnp.clip(((1.0 - v) * (face_size - 1)).astype(jnp.int32), 0, face_size - 1)
    return faces[face, v_px, u_px]


def ue_cubes_to_pano(faces: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Unreal Engine capture variant (reference
    cube_to_pano_batched_io_UE.py:10-18): top/bottom faces arrive rotated
    180 degrees at load; the sampling math is otherwise identical to Unity's
    (process_batch at :45 calls the same converter — the `_UE`-suffixed
    function at :131 is dead code, and its +pi longitude differs from the
    Unity formula by exactly 2*pi, a no-op under cos/sin).

    Args:
        faces: (6, S, S, 3) in FACE_ORDER, raw (unrotated) UE captures.
    """
    fixed = faces.at[2].set(jnp.rot90(faces[2], 2, axes=(0, 1)))  # bottom
    fixed = fixed.at[3].set(jnp.rot90(faces[3], 2, axes=(0, 1)))  # top
    return unity_cubes_to_pano(fixed, height, width)
