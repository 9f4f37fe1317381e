"""Antialiased resize + separable Gaussian blur.

Equivalent of the reference's `_resize_with_antialiasing` /
`_gaussian_blur2d` (/root/reference/evoworld/pipeline/pipeline_evoworld.py:
746-850), used to downscale frames to 224x224 for CLIP conditioning: sigma =
max((factor-1)/2, 1e-3), kernel size ~4*sigma (odd), reflect padding, then
bicubic interpolation. (torch uses align_corners=True bicubic; jax.image uses
half-pixel sampling — the difference is sub-pixel at the borders.)

Channels-last (N, H, W, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gaussian_kernel1d(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    if size % 2 == 0:
        x = x + 0.5
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return g / g.sum()


def gaussian_blur2d(images: jnp.ndarray, kernel_size: tuple[int, int], sigma: tuple[float, float]) -> jnp.ndarray:
    """Separable Gaussian blur with reflect padding, (N, H, W, C)."""
    ky, kx = kernel_size
    kernel_x = _gaussian_kernel1d(kx, sigma[1]).astype(images.dtype)
    kernel_y = _gaussian_kernel1d(ky, sigma[0]).astype(images.dtype)

    pad_x = ((kx - 1) // 2, kx - 1 - (kx - 1) // 2)
    pad_y = ((ky - 1) // 2, ky - 1 - (ky - 1) // 2)

    x = jnp.pad(images, ((0, 0), (0, 0), pad_x, (0, 0)), mode="reflect")
    x = _depthwise(x, kernel_x.reshape(1, kx))
    x = jnp.pad(x, ((0, 0), pad_y, (0, 0), (0, 0)), mode="reflect")
    x = _depthwise(x, kernel_y.reshape(ky, 1))
    return x


def _depthwise(x: jnp.ndarray, kernel2d: jnp.ndarray) -> jnp.ndarray:
    """Depthwise conv of a (kh, kw) kernel over every channel."""
    c = x.shape[-1]
    kh, kw = kernel2d.shape
    kern = jnp.broadcast_to(kernel2d[:, :, None, None], (kh, kw, 1, c))
    return jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def resize_antialiased(images: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Gaussian-prefiltered bicubic resize, (N, H, W, C) -> (N, h, w, C)."""
    h, w = images.shape[1], images.shape[2]
    oh, ow = out_hw
    factor_h, factor_w = h / oh, w / ow
    sigma_h = max((factor_h - 1.0) / 2.0, 0.001)
    sigma_w = max((factor_w - 1.0) / 2.0, 0.001)
    ky = int(max(2.0 * 2 * sigma_h, 3))
    kx = int(max(2.0 * 2 * sigma_w, 3))
    ky += 1 - ky % 2
    kx += 1 - kx % 2
    if factor_h > 1.0 or factor_w > 1.0:
        images = gaussian_blur2d(images, (ky, kx), (sigma_h, sigma_w))
    return _bicubic_align_corners(images, (oh, ow))


def _cubic_kernel(t, a: float = -0.75):
    """Keys cubic convolution kernel (torch bicubic's a = -0.75)."""
    import numpy as np

    t = np.abs(t)
    out = np.where(
        t <= 1.0,
        (a + 2.0) * t**3 - (a + 3.0) * t**2 + 1.0,
        np.where(t < 2.0, a * t**3 - 5.0 * a * t**2 + 8.0 * a * t - 4.0 * a, 0.0),
    )
    return out


def _resize_matrix(n_in: int, n_out: int):
    """(n_out, n_in) bicubic interpolation weights, align_corners=True
    (matching torch F.interpolate(mode="bicubic", align_corners=True), the
    reference's convention)."""
    import numpy as np

    if n_out == 1:
        pos = np.zeros((1,))
    else:
        pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    base = np.floor(pos).astype(int)
    frac = pos - base
    w = np.zeros((n_out, n_in), np.float32)
    for k in range(-1, 3):
        idx = np.clip(base + k, 0, n_in - 1)
        w[np.arange(n_out), idx] += _cubic_kernel(k - frac).astype(np.float32)
    return w


def _bicubic_align_corners(images: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Separable align-corners bicubic resize via two small matmuls."""
    h, w = images.shape[1], images.shape[2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return images
    wh = jnp.asarray(_resize_matrix(h, oh), images.dtype)
    ww = jnp.asarray(_resize_matrix(w, ow), images.dtype)
    x = jnp.einsum("oh,nhwc->nowc", wh, images, precision="highest")
    return jnp.einsum("pw,nowc->nopc", ww, x, precision="highest")


def resize_bilinear_align_corners(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with torch align_corners=True sampling.

    Output pixel i samples input coordinate i*(H-1)/(H'-1) — the convention
    of torch F.interpolate(mode="bilinear", align_corners=True), used by the
    upstream DPT head's fusion/output upsampling (vggt custom_interpolate).
    jax.image.resize's half-pixel convention drifts from it at the borders.
    Works on (..., H, W, C).
    """
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x

    def axis_weights(n_in, n_out):
        if n_out == 1 or n_in == 1:
            lo = jnp.zeros((n_out,), jnp.int32)
            return lo, lo, jnp.zeros((n_out,), jnp.float32)
        pos = jnp.linspace(0.0, n_in - 1.0, n_out)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
        return lo, lo + 1, (pos - lo).astype(jnp.float32)

    y0, y1, wy = axis_weights(h, oh)
    x0, x1, wx = axis_weights(w, ow)
    orig = x.dtype
    xf = x.astype(jnp.float32)
    top = jnp.take(xf, y0, axis=-3)
    bot = jnp.take(xf, y1, axis=-3)
    rows = top + (bot - top) * wy.reshape((-1, 1, 1))
    left = jnp.take(rows, x0, axis=-2)
    right = jnp.take(rows, x1, axis=-2)
    out = left + (right - left) * wx.reshape((-1, 1))
    return out.astype(orig)
