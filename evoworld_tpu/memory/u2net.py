"""U^2-Net salient-object segmentation — the architecture behind the
reference's `skyseg.onnx` sky-segmentation model.

The reference runs sky segmentation through onnxruntime on a 320x320 input
(`SkySegmentationProcessor._run_inference`,
/root/reference/evoworld/reprojection/reproject_vggt_open3d_utils.py:132-163)
with the model downloaded from huggingface.co/JianyuanWang/skyseg — a
U^2-Net (Qin et al., Pattern Recognition 2020) trained for sky masks, as
exported from the public xuebinqin/U-2-Net `u2net.py` definition. This
module restates that published architecture in Flax (channels-last,
inference-mode batch norm); `convert_u2net_onnx_initializers` in
`memory.skyseg` loads the ONNX initializers into it.

Structure (full U2NET, in_ch 3, out_ch 1):
  encoder  : RSU7(3,32,64) RSU6(64,32,128) RSU5(128,64,256) RSU4(256,128,512)
             RSU4F(512,256,512) RSU4F(512,256,512), 2x maxpool between
  decoder  : RSU4F(1024,256,512) RSU4(1024,128,256) RSU5(512,64,128)
             RSU6(256,32,64) RSU7(128,16,64), bilinear upsample + concat skips
  heads    : six 3x3 side convs -> 1 channel, upsampled to input size,
             concatenated -> 1x1 fuse conv; all outputs sigmoid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _maxpool_ceil(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max-pool with ceil_mode=True (torch MaxPool2d(2,2,ceil_mode=True))."""
    h, w = x.shape[1], x.shape[2]
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _upsample_like(x: jnp.ndarray, target_hw) -> jnp.ndarray:
    """Bilinear resize to target spatial size (torch F.upsample align_corners=False)."""
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, target_hw[0], target_hw[1], c), "bilinear")


class REBNCONV(nn.Module):
    """conv3x3(dilation=dirate) + BN(eval) + ReLU (u2net.py REBNCONV)."""

    out_ch: int
    dirate: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, (3, 3), padding=self.dirate,
                    kernel_dilation=self.dirate, name="conv_s1")(x)
        # Inference-mode batch norm: parameters loaded from the checkpoint.
        scale = self.param("bn_scale", nn.initializers.ones, (self.out_ch,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.out_ch,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.out_ch,))
        var = self.param("bn_var", nn.initializers.ones, (self.out_ch,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return nn.relu(x)


class RSU(nn.Module):
    """Residual U-block of `height` levels (RSU7 has height 7, ... RSU4: 4)."""

    height: int
    mid_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x):
        hxin = REBNCONV(self.out_ch, name="rebnconvin")(x)

        # Encoder: heights 1..height-1 with pooling between, then the
        # bottom conv at dirate 2.
        enc = [REBNCONV(self.mid_ch, name="rebnconv1")(hxin)]
        h = enc[0]
        for i in range(2, self.height):
            h = _maxpool_ceil(h)
            h = REBNCONV(self.mid_ch, name=f"rebnconv{i}")(h)
            enc.append(h)
        top = REBNCONV(self.mid_ch, dirate=2, name=f"rebnconv{self.height}")(h)

        # Decoder: concat with the mirror encoder level, upsample between.
        d = top
        for i in range(self.height - 1, 0, -1):
            out_ch = self.out_ch if i == 1 else self.mid_ch
            d = REBNCONV(out_ch, name=f"rebnconv{i}d")(
                jnp.concatenate([d, enc[i - 1]], axis=-1)
            )
            if i > 1:
                d = _upsample_like(d, enc[i - 2].shape[1:3])
        return d + hxin


class RSU4F(nn.Module):
    """Dilated (pool-free) residual U-block (u2net.py RSU4F)."""

    mid_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x):
        hxin = REBNCONV(self.out_ch, name="rebnconvin")(x)
        h1 = REBNCONV(self.mid_ch, dirate=1, name="rebnconv1")(hxin)
        h2 = REBNCONV(self.mid_ch, dirate=2, name="rebnconv2")(h1)
        h3 = REBNCONV(self.mid_ch, dirate=4, name="rebnconv3")(h2)
        h4 = REBNCONV(self.mid_ch, dirate=8, name="rebnconv4")(h3)
        d3 = REBNCONV(self.mid_ch, dirate=4, name="rebnconv3d")(
            jnp.concatenate([h4, h3], axis=-1))
        d2 = REBNCONV(self.mid_ch, dirate=2, name="rebnconv2d")(
            jnp.concatenate([d3, h2], axis=-1))
        d1 = REBNCONV(self.out_ch, dirate=1, name="rebnconv1d")(
            jnp.concatenate([d2, h1], axis=-1))
        return d1 + hxin


class U2Net(nn.Module):
    """Full U2NET (u2net.py U2NET(3, 1)). Input (N, H, W, 3), returns the
    fused sigmoid saliency map (N, H, W, 1) — outputs[0] of the ONNX session,
    the only one the reference consumes (:152)."""

    @nn.compact
    def __call__(self, x):
        hx1 = RSU(7, 32, 64, name="stage1")(x)
        hx = _maxpool_ceil(hx1)
        hx2 = RSU(6, 32, 128, name="stage2")(hx)
        hx = _maxpool_ceil(hx2)
        hx3 = RSU(5, 64, 256, name="stage3")(hx)
        hx = _maxpool_ceil(hx3)
        hx4 = RSU(4, 128, 512, name="stage4")(hx)
        hx = _maxpool_ceil(hx4)
        hx5 = RSU4F(256, 512, name="stage5")(hx)
        hx = _maxpool_ceil(hx5)
        hx6 = RSU4F(256, 512, name="stage6")(hx)
        hx6up = _upsample_like(hx6, hx5.shape[1:3])

        hx5d = RSU4F(256, 512, name="stage5d")(jnp.concatenate([hx6up, hx5], -1))
        hx5dup = _upsample_like(hx5d, hx4.shape[1:3])
        hx4d = RSU(4, 128, 256, name="stage4d")(jnp.concatenate([hx5dup, hx4], -1))
        hx4dup = _upsample_like(hx4d, hx3.shape[1:3])
        hx3d = RSU(5, 64, 128, name="stage3d")(jnp.concatenate([hx4dup, hx3], -1))
        hx3dup = _upsample_like(hx3d, hx2.shape[1:3])
        hx2d = RSU(6, 32, 64, name="stage2d")(jnp.concatenate([hx3dup, hx2], -1))
        hx2dup = _upsample_like(hx2d, hx1.shape[1:3])
        hx1d = RSU(7, 16, 64, name="stage1d")(jnp.concatenate([hx2dup, hx1], -1))

        size = x.shape[1:3]
        d1 = nn.Conv(1, (3, 3), padding=1, name="side1")(hx1d)
        d2 = _upsample_like(nn.Conv(1, (3, 3), padding=1, name="side2")(hx2d), size)
        d3 = _upsample_like(nn.Conv(1, (3, 3), padding=1, name="side3")(hx3d), size)
        d4 = _upsample_like(nn.Conv(1, (3, 3), padding=1, name="side4")(hx4d), size)
        d5 = _upsample_like(nn.Conv(1, (3, 3), padding=1, name="side5")(hx5d), size)
        d6 = _upsample_like(nn.Conv(1, (3, 3), padding=1, name="side6")(hx6), size)
        d0 = nn.Conv(1, (1, 1), name="outconv")(
            jnp.concatenate([d1, d2, d3, d4, d5, d6], axis=-1)
        )
        return nn.sigmoid(d0)
