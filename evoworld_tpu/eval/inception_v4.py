"""Inception-v4 feature extractor for the latent-MSE metric.

Architecture-faithful Flax port of timm's inception_v4 (the reference's
latent-MSE feature net, /root/reference/evoworld/metrics/other_metrics/
calculate_latent_mse.py:14-45: features from the layer before classification,
inputs 299x299 normalized to [-1, 1]). Weights convert from timm by
name+transpose once available; random weights still give a consistent
embedding space for relative comparisons.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn


class ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int] = (1, 1)
    strides: Tuple[int, int] = (1, 1)
    padding: str | int = 0

    @nn.compact
    def __call__(self, x):
        pad = self.padding if isinstance(self.padding, str) else [(self.padding,) * 2] * 2
        x = nn.Conv(self.features, self.kernel, self.strides, padding=pad,
                    use_bias=False, name="conv", dtype=x.dtype)(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, name="bn", dtype=jnp.float32)(x)
        return nn.relu(x)


class MixedA(nn.Module):  # Inception-A
    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(96, name="b0")(x)
        b1 = ConvBN(64, name="b1a")(x)
        b1 = ConvBN(96, (3, 3), padding=1, name="b1b")(b1)
        b2 = ConvBN(64, name="b2a")(x)
        b2 = ConvBN(96, (3, 3), padding=1, name="b2b")(b2)
        b2 = ConvBN(96, (3, 3), padding=1, name="b2c")(b2)
        b3 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                         count_include_pad=False)
        b3 = ConvBN(96, name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], -1)


class ReductionA(nn.Module):
    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(384, (3, 3), (2, 2), name="b0")(x)
        b1 = ConvBN(192, name="b1a")(x)
        b1 = ConvBN(224, (3, 3), padding=1, name="b1b")(b1)
        b1 = ConvBN(256, (3, 3), (2, 2), name="b1c")(b1)
        b2 = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b0, b1, b2], -1)


class MixedB(nn.Module):  # Inception-B (7x1/1x7 factorized)
    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(384, name="b0")(x)
        b1 = ConvBN(192, name="b1a")(x)
        b1 = ConvBN(224, (1, 7), padding="SAME", name="b1b")(b1)
        b1 = ConvBN(256, (7, 1), padding="SAME", name="b1c")(b1)
        b2 = ConvBN(192, name="b2a")(x)
        b2 = ConvBN(192, (7, 1), padding="SAME", name="b2b")(b2)
        b2 = ConvBN(224, (1, 7), padding="SAME", name="b2c")(b2)
        b2 = ConvBN(224, (7, 1), padding="SAME", name="b2d")(b2)
        b2 = ConvBN(256, (1, 7), padding="SAME", name="b2e")(b2)
        b3 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                         count_include_pad=False)
        b3 = ConvBN(128, name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], -1)


class ReductionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(192, name="b0a")(x)
        b0 = ConvBN(192, (3, 3), (2, 2), name="b0b")(b0)
        b1 = ConvBN(256, name="b1a")(x)
        b1 = ConvBN(256, (1, 7), padding="SAME", name="b1b")(b1)
        b1 = ConvBN(320, (7, 1), padding="SAME", name="b1c")(b1)
        b1 = ConvBN(320, (3, 3), (2, 2), name="b1d")(b1)
        b2 = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b0, b1, b2], -1)


class MixedC(nn.Module):  # Inception-C
    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(256, name="b0")(x)
        b1 = ConvBN(384, name="b1a")(x)
        b1_1 = ConvBN(256, (1, 3), padding="SAME", name="b1b1")(b1)
        b1_2 = ConvBN(256, (3, 1), padding="SAME", name="b1b2")(b1)
        b2 = ConvBN(384, name="b2a")(x)
        b2 = ConvBN(448, (3, 1), padding="SAME", name="b2b")(b2)
        b2 = ConvBN(512, (1, 3), padding="SAME", name="b2c")(b2)
        b2_1 = ConvBN(256, (1, 3), padding="SAME", name="b2d1")(b2)
        b2_2 = ConvBN(256, (3, 1), padding="SAME", name="b2d2")(b2)
        b3 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                         count_include_pad=False)
        b3 = ConvBN(256, name="b3b")(b3)
        return jnp.concatenate([b0, b1_1, b1_2, b2_1, b2_2, b3], -1)


class InceptionV4Features(nn.Module):
    """(N, 299, 299, 3) in [-1, 1] -> (N, 1536) pooled features."""

    @nn.compact
    def __call__(self, x):
        # Stem.
        x = ConvBN(32, (3, 3), (2, 2), name="stem0")(x)
        x = ConvBN(32, (3, 3), name="stem1")(x)
        x = ConvBN(64, (3, 3), padding=1, name="stem2")(x)
        x = jnp.concatenate(
            [nn.max_pool(x, (3, 3), strides=(2, 2)), ConvBN(96, (3, 3), (2, 2), name="stem3")(x)], -1
        )
        y0 = ConvBN(64, name="stem4a")(x)
        y0 = ConvBN(96, (3, 3), name="stem4b")(y0)
        y1 = ConvBN(64, name="stem5a")(x)
        y1 = ConvBN(64, (1, 7), padding="SAME", name="stem5b")(y1)
        y1 = ConvBN(64, (7, 1), padding="SAME", name="stem5c")(y1)
        y1 = ConvBN(96, (3, 3), name="stem5d")(y1)
        x = jnp.concatenate([y0, y1], -1)
        x = jnp.concatenate(
            [ConvBN(192, (3, 3), (2, 2), name="stem6")(x), nn.max_pool(x, (3, 3), strides=(2, 2))], -1
        )
        for i in range(4):
            x = MixedA(name=f"mixed_a{i}")(x)
        x = ReductionA(name="reduction_a")(x)
        for i in range(7):
            x = MixedB(name=f"mixed_b{i}")(x)
        x = ReductionB(name="reduction_b")(x)
        for i in range(3):
            x = MixedC(name=f"mixed_c{i}")(x)
        return jnp.mean(x, axis=(1, 2))


def latent_mse(feats_a: jnp.ndarray, feats_b: jnp.ndarray) -> jnp.ndarray:
    """Mean squared distance between feature sets (reference
    calculate_latent_mse.py:34-45)."""
    return jnp.mean((feats_a - feats_b) ** 2)
