"""Metric feature extractors: InceptionI3D (FVD) and AlexNet-LPIPS.

Flax reimplementations of the reference's metric networks
(/root/reference/evoworld/metrics/fvd/videogpt/pytorch_i3d.py — full
InceptionI3d; other_metrics/calculate_lpips.py — LPIPS-Alex spatial):
architecture-faithful so torch weights convert by name+transpose. Until
converted weights are provided, random-weight instances still define a valid
(if uncalibrated) feature space — FVD/LPIPS numbers become comparable across
our own runs, with exact parity landing with the weights.

Videos channels-last: I3D takes (N, T, H, W, 3) in [-1, 1] (the torch I3D
takes (N, 3, T, H, W)); LPIPS takes (N, H, W, 3) in [-1, 1].
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class Unit3D(nn.Module):
    """Conv3d + batchnorm(frozen, inference) + relu (I3D basic unit)."""

    features: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    strides: Tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # torch I3D (pytorch_i3d.py:78-105) computes TF-'SAME' padding
        # dynamically per dim — for stride 2 at even sizes that is (2,3),
        # NOT symmetric. XLA's "SAME" implements exactly that split.
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding="SAME", use_bias=not self.use_bn, name="conv3d", dtype=x.dtype,
        )(x)
        if self.use_bn:
            # Inference-mode batch norm: scale/bias/mean/var loaded from ckpt
            # (torch BatchNorm3d eps=1e-5, pytorch_i3d.py:68).
            x = nn.BatchNorm(
                use_running_average=True, epsilon=1e-5, momentum=0.99,
                name="bn", dtype=jnp.float32,
            )(x)
        if self.activation:
            x = nn.relu(x)
        return x


class InceptionBlock(nn.Module):
    """I3D Inception mixing block (4 branches)."""

    out: Tuple[int, int, int, int, int, int]  # b0, b1a, b1b, b2a, b2b, b3b

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b0 = Unit3D(self.out[0], name="b0")(x)
        b1 = Unit3D(self.out[1], name="b1a")(x)
        b1 = Unit3D(self.out[2], (3, 3, 3), name="b1b")(b1)
        b2 = Unit3D(self.out[3], name="b2a")(x)
        b2 = Unit3D(self.out[4], (3, 3, 3), name="b2b")(b2)
        b3 = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1), padding=((1, 1), (1, 1), (1, 1)))
        b3 = Unit3D(self.out[5], name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionI3D(nn.Module):
    """I3D (Carreira & Zisserman) to 400-class logits.

    (N, T, H, W, 3) in [-1, 1] -> (N, num_classes) averaged logits — the
    feature used by the reference's FVD (fvd/styleganv/fvd.py:9-18 feeds
    i3d_torchscript with return_features; videogpt variant uses logits).
    """

    num_classes: int = 400

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # Max pools mirror the torch model's MaxPool3dSamePadding (TF-'SAME'
        # dynamic padding, pytorch_i3d.py:15-34); after ReLU all activations
        # are >= 0, so -inf vs 0 pad values cannot change any window max.
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = Unit3D(64, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = InceptionBlock((64, 96, 128, 16, 32, 32), name="Mixed_3b")(x)
        x = InceptionBlock((128, 128, 192, 32, 96, 64), name="Mixed_3c")(x)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
        x = InceptionBlock((192, 96, 208, 16, 48, 64), name="Mixed_4b")(x)
        x = InceptionBlock((160, 112, 224, 24, 64, 64), name="Mixed_4c")(x)
        x = InceptionBlock((128, 128, 256, 24, 64, 64), name="Mixed_4d")(x)
        x = InceptionBlock((112, 144, 288, 32, 64, 64), name="Mixed_4e")(x)
        x = InceptionBlock((256, 160, 320, 32, 128, 128), name="Mixed_4f")(x)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2), padding="SAME")
        x = InceptionBlock((256, 160, 320, 32, 128, 128), name="Mixed_5b")(x)
        x = InceptionBlock((384, 192, 384, 48, 128, 128), name="Mixed_5c")(x)
        # Head mirrors torch avg_pool([2,7,7], stride 1) + logits + time mean
        # (pytorch_i3d.py:301-310): global spatial mean (the 7x7 window IS
        # the whole 224-input feature map), sliding temporal mean of width 2,
        # 1x1x1 logits conv (linear, so conv-vs-pool order commutes), then
        # mean over the T'-1 window positions.
        x = jnp.mean(x, axis=(2, 3), keepdims=True)        # spatial
        if x.shape[1] > 1:
            x = (x[:, :-1] + x[:, 1:]) / 2                 # temporal window 2
        x = Unit3D(self.num_classes, use_bn=False, activation=False, name="logits")(x)
        return jnp.mean(x, axis=(1, 2, 3))                 # window-position mean


_ALEX_CFG = ((64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1))
_ALEX_POOL_AFTER = (0, 1)  # maxpool after layers 0 and 1 (and features end)


class AlexNetFeatures(nn.Module):
    """AlexNet conv tower returning the 5 relu feature maps (LPIPS taps)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        feats = []
        for i, (c, k, s, p) in enumerate(_ALEX_CFG):
            x = nn.Conv(c, (k, k), strides=(s, s), padding=p, name=f"conv{i}", dtype=x.dtype)(x)
            x = nn.relu(x)
            feats.append(x)
            if i in _ALEX_POOL_AFTER:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return feats


class LPIPSAlex(nn.Module):
    """LPIPS distance with AlexNet backbone and linear calibration heads.

    (N, H, W, 3) pairs in [-1, 1] -> (N,) distances (spatial mean, matching
    the reference's `spatial=True` then mean — calculate_lpips.py:10-30).
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        # LPIPS input normalization (imagenet-ish shift/scale on [-1,1]).
        shift = jnp.asarray([-0.030, -0.088, -0.188], x.dtype)
        scale = jnp.asarray([0.458, 0.448, 0.450], x.dtype)
        xn = (x - shift) / scale
        yn = (y - shift) / scale
        net = AlexNetFeatures(name="net")
        fx = net(xn)
        fy = net(yn)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
            b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
            diff = (a - b) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{i}", dtype=x.dtype)(diff)
            total = total + jnp.mean(w[..., 0], axis=(1, 2))
        return total


def i3d_preprocess(videos: jnp.ndarray, target: int = 224) -> jnp.ndarray:
    """(N, T, H, W, 3) [0, 1] -> I3D input, rescaled to [-1, 1].

    Mirrors the reference's preprocess_single (fvd/styleganv/fvd.py:37-59):
    scale the SHORTER side to `target` (bilinear, half-pixel centers ==
    torch align_corners=False), then center-crop to target x target — NOT a
    square squash, so wide panoramas keep their central square."""
    import math

    import jax

    n, t, h, w, c = videos.shape
    scale = target / min(h, w)
    rh, rw = (target, math.ceil(w * scale)) if h < w else (math.ceil(h * scale), target)
    # antialias=False: the reference downscales with plain (aliased)
    # F.interpolate bilinear; jax.image.resize antialiases by default.
    out = jax.image.resize(videos, (n, t, rh, rw, c), "bilinear", antialias=False)
    h0, w0 = (rh - target) // 2, (rw - target) // 2
    out = out[:, :, h0 : h0 + target, w0 : w0 + target]
    return out * 2.0 - 1.0
