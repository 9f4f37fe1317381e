"""Sky segmentation for optional sky-point filtering.

Interface equivalent of the reference's `SkySegmentationProcessor`
(/root/reference/evoworld/reprojection/reproject_vggt_open3d_utils.py:51-163,
onnxruntime + skyseg.onnx): `sky_mask(image) -> (H, W) float mask in
[0, 255]` where low values mark sky, multiplied into point confidences.

The default EvoWorld paths disable sky masking entirely
(`mask_sky=False` in the unified loop :476 and `--no_mask_sky` in the
training prep script), so exact model parity is not load-bearing; until the
ONNX weights are converted, a gradient/brightness heuristic stands in — it
marks bright, low-texture upper-image regions, which is what the
downstream confidence multiply needs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sky_mask_heuristic(image: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) [0, 1] -> (H, W) mask; 0 ~ sky, 255 ~ not sky."""
    h = image.shape[0]
    lum = image.mean(-1)
    # Local gradient magnitude (sky is smooth).
    gx = jnp.abs(jnp.diff(lum, axis=1, append=lum[:, -1:]))
    gy = jnp.abs(jnp.diff(lum, axis=0, append=lum[-1:, :]))
    smooth = (gx + gy) < 0.02
    bright = lum > 0.55
    blueish = image[..., 2] >= image[..., 0] - 0.05
    upper = (jnp.arange(h) < h * 0.6)[:, None]
    sky = smooth & bright & blueish & upper
    return jnp.where(sky, 0.0, 255.0)


def apply_sky_mask(conf: jnp.ndarray, images: jnp.ndarray) -> jnp.ndarray:
    """Zero confidences on sky pixels (reference conf * binary mask :277)."""
    masks = jax.vmap(sky_mask_heuristic)(images)
    return conf * (masks > 0.01).astype(conf.dtype)
