"""Evaluation metrics: PSNR, SSIM, Frechet distance (FVD core), latent MSE.

Formula-exact JAX ports of the reference harness
(/root/reference/evoworld/metrics/):
  - PSNR per frame on [0, 1] images: 20*log10(1/sqrt(mse)), 100 when
    mse < 1e-10 (other_metrics/calculate_psnr.py:6-14);
  - SSIM with an 11x11 sigma-1.5 Gaussian window, valid crop of 5 px,
    C1=0.01^2, C2=0.03^2, averaged over channels
    (other_metrics/calculate_ssim.py:6-44);
  - Frechet distance between Gaussian feature moments (fvd/styleganv/
    fvd.py:79-89) — the I3D/LPIPS/Inception feature extractors plug in via
    `evoworld_tpu.eval.feature_nets` with converted weights.

Videos are (N, F, H, W, C) in [0, 1], channels-last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Per-image PSNR on [0, 1 ] arrays of any matching shape."""
    mse = jnp.mean((img1.astype(jnp.float32) - img2.astype(jnp.float32)) ** 2)
    return jnp.where(mse < 1e-10, 100.0, 20.0 * jnp.log10(1.0 / jnp.sqrt(mse)))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    # Host-side numpy so the normalization really happens in float64 (the
    # reference's cv2 path); the device compute below is float32 — the
    # cv2-golden test passes at that precision (tests/test_data_eval.py).
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    g = g / g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def _filter2d_same(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """cv2.filter2D equivalent (reflect-101 border), single channel (H, W)."""
    k = window.shape[0]
    pad = k // 2
    padded = jnp.pad(img, ((pad, pad), (pad, pad)), mode="reflect")
    return jax.lax.conv_general_dilated(
        padded[None, :, :, None],
        window[:, :, None, None].astype(img.dtype),
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        # The ambient env truncates default-precision convs to bf16 even for
        # f32 inputs; the E[x^2]-mu^2 variance terms cancel catastrophically
        # at bf16, so this must stay true f32 on device (repo convention for
        # math that gates the 1% parity tolerance).
        precision=jax.lax.Precision.HIGHEST,
    )[0, :, :, 0]


def ssim(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """SSIM of (H, W) or (H, W, C) [0, 1] images (reference formula)."""
    if img1.ndim == 3:
        vals = [ssim(img1[..., c], img2[..., c]) for c in range(img1.shape[-1])]
        return jnp.mean(jnp.stack(vals))
    # f32, not the reference's f64: jax-on-TPU has no f64 (a f64 request
    # silently truncates), and the cv2 golden parity test passes at f32.
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    c1, c2 = 0.01**2, 0.03**2
    window = _gaussian_window()
    crop = slice(5, -5)
    mu1 = _filter2d_same(img1, window)[crop, crop]
    mu2 = _filter2d_same(img2, window)[crop, crop]
    mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
    s1 = _filter2d_same(img1**2, window)[crop, crop] - mu1_sq
    s2 = _filter2d_same(img2**2, window)[crop, crop] - mu2_sq
    s12 = _filter2d_same(img1 * img2, window)[crop, crop] - mu12
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return ssim_map.mean()


def frechet_distance(feats1: np.ndarray, feats2: np.ndarray) -> float:
    """Frechet distance between Gaussians fit to (N, D) feature sets.

    numpy/scipy implementation matching the reference's styleganv FVD tail
    (fvd/styleganv/fvd.py:79-89)."""
    from scipy.linalg import sqrtm

    mu1, mu2 = feats1.mean(0), feats2.mean(0)
    diff = mu1 - mu2
    if feats1.shape[0] <= 1 or feats2.shape[0] <= 1:
        # Single-sample fallback (reference: fvd.py:85-89 skips the
        # covariance term when only one video is scored).
        return float(diff @ diff)
    sigma1 = np.cov(feats1, rowvar=False)
    sigma2 = np.cov(feats2, rowvar=False)
    covmean = sqrtm(sigma1 @ sigma2)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1 + sigma2 - 2.0 * covmean))


def batch_video_metrics(gen: np.ndarray, gt: np.ndarray) -> dict:
    """Per-frame-averaged PSNR/SSIM over (N, F, H, W, C) [0, 1] videos.

    Returns {"psnr": mean, "ssim": mean, "psnr_per_frame": (F,),
    "ssim_per_frame": (F,)} following the reference aggregation (mean over
    videos per timestamp, then mean over timestamps)."""
    assert gen.shape == gt.shape, (gen.shape, gt.shape)
    n, f = gen.shape[0], gen.shape[1]
    psnr_vals = np.zeros((n, f))
    ssim_vals = np.zeros((n, f))
    psnr_j = jax.jit(psnr)
    ssim_j = jax.jit(ssim)
    for i in range(n):
        for t in range(f):
            psnr_vals[i, t] = float(psnr_j(jnp.asarray(gen[i, t]), jnp.asarray(gt[i, t])))
            ssim_vals[i, t] = float(ssim_j(jnp.asarray(gen[i, t]), jnp.asarray(gt[i, t])))
    return {
        "psnr": float(psnr_vals.mean()),
        "ssim": float(ssim_vals.mean()),
        "psnr_per_frame": psnr_vals.mean(0),
        "ssim_per_frame": ssim_vals.mean(0),
    }
