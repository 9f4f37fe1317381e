"""Point-cloud filtering for the explicit 3D memory.

TPU-native redesign of the reference's `PointCloudProcessor.filter_predictions`
(/root/reference/evoworld/reprojection/reproject_vggt_open3d_utils.py:174-337):
instead of compacting the point array (dynamic shapes), every point keeps its
slot and filtering produces a boolean `valid` mask consumed by the splat
renderer — static shapes end to end, so the whole memory rebuild stays inside
one XLA program.

Semantics preserved:
  - conf_thres is a PERCENTILE (default 50; 0 disables) over the per-point
    confidence (:294-310);
  - optional black/white background masks on colors (:312-328);
  - scene scale = || p95(points) - p5(points) || (:330-337).
"""

from __future__ import annotations

import jax.numpy as jnp


def confidence_mask(
    conf: jnp.ndarray,
    conf_percentile: float = 50.0,
    colors: jnp.ndarray | None = None,
    mask_black_bg: bool = False,
    mask_white_bg: bool = False,
) -> jnp.ndarray:
    """Boolean mask of points passing the percentile confidence filter.

    Args:
        conf: (...,) per-point confidence.
        conf_percentile: percentile in [0, 100]; 0 keeps everything.
        colors: optional (..., 3) colors in [0, 1] for background masks.
    """
    flat = conf.reshape(-1)
    threshold = jnp.where(
        conf_percentile == 0.0, -jnp.inf, jnp.percentile(flat, conf_percentile)
    )
    mask = conf >= threshold
    if colors is not None and mask_black_bg:
        mask = mask & (colors.sum(axis=-1) * 255.0 >= 16.0)
    if colors is not None and mask_white_bg:
        white = (colors[..., 0] > 240 / 255) & (colors[..., 1] > 240 / 255) & (colors[..., 2] > 240 / 255)
        mask = mask & ~white
    return mask


def scene_scale(points: jnp.ndarray, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """|| p95 - p5 || over valid points (reference :330-337)."""
    pts = points.reshape(-1, 3)
    if valid is not None:
        v = valid.reshape(-1, 1)
        pts = jnp.where(v, pts, jnp.nan)
    lo = jnp.nanpercentile(pts, 5.0, axis=0)
    hi = jnp.nanpercentile(pts, 95.0, axis=0)
    return jnp.linalg.norm(hi - lo)
