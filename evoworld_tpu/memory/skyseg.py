"""Sky segmentation for optional sky-point filtering.

Equivalent of the reference's `SkySegmentationProcessor`
(/root/reference/evoworld/reprojection/reproject_vggt_open3d_utils.py:51-163):
an ONNX U^2-Net (`skyseg.onnx`, huggingface.co/JianyuanWang/skyseg) run at
320x320, min-max normalized to [0, 255]; downstream multiplies point
confidences by (mask > 0.01) (:275-277).

TPU-native path: the U^2-Net architecture is restated in Flax
(`memory.u2net`) and the ONNX file's initializers load through a
hand-rolled protobuf reader (`memory.onnx_io` — no onnxruntime in this
image). When no weights file is available, a gradient/brightness heuristic
stands in (the default EvoWorld paths disable sky masking entirely:
`mask_sky=False` in the unified loop :476, so the net is never load-bearing
in the shipped flows).
"""

from __future__ import annotations

from typing import Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# ONNX initializer -> Flax params conversion
# ---------------------------------------------------------------------------

def convert_u2net_onnx_initializers(
    src: Mapping[str, np.ndarray],
) -> Tuple[dict, list]:
    """Convert torch-export-named ONNX initializers into U2Net params.

    torch.onnx.export preserves state-dict names for initializers, so the
    keys look like `stage1.rebnconvin.conv_s1.weight`,
    `stage2d.rebnconv3.bn_s1.running_mean`, `side4.weight`, `outconv.bias`.
    Conv kernels transpose OIHW -> HWIO. Returns (params, report); report
    lists unmapped source keys and missing targets.
    """
    from evoworld_tpu.models.weights import _set, _t_conv

    params: dict = {}
    report: list = []
    used = set()

    def strip(k: str) -> str:
        # Wrapper prefixes some exporters add.
        for pref in ("u2net.", "model.", "module."):
            if k.startswith(pref):
                k = k[len(pref):]
        return k

    bn_map = {
        "weight": "bn_scale", "bias": "bn_bias",
        "running_mean": "bn_mean", "running_var": "bn_var",
    }
    for key, val in src.items():
        k = strip(key)
        parts = k.split(".")
        if parts[-1] == "num_batches_tracked":
            used.add(key)
            continue
        if len(parts) >= 3 and parts[-2] == "conv_s1":
            dst = "/".join(parts[:-2]) + "/conv_s1/" + (
                "kernel" if parts[-1] == "weight" else "bias")
            _set(params, dst, _t_conv(val) if parts[-1] == "weight" else val)
            used.add(key)
        elif len(parts) >= 3 and parts[-2] == "bn_s1" and parts[-1] in bn_map:
            _set(params, "/".join(parts[:-2]) + "/" + bn_map[parts[-1]], val)
            used.add(key)
        elif len(parts) == 2 and (parts[0].startswith("side") or parts[0] == "outconv"):
            dst = parts[0] + "/" + ("kernel" if parts[1] == "weight" else "bias")
            _set(params, dst, _t_conv(val) if parts[1] == "weight" else val)
            used.add(key)
    report.extend(
        f"unmapped source key {k}" for k in sorted(set(src) - used)
    )
    for stage in ("stage1", "stage6", "stage1d", "outconv", "side6"):
        if stage not in params:
            report.append(f"missing {stage}")
    return {"params": params}, report


# ---------------------------------------------------------------------------
# Processor
# ---------------------------------------------------------------------------

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class SkySegmentation:
    """U^2-Net sky mask with the reference's exact pre/post-processing.

    `weights_path`: optional skyseg.onnx; None -> heuristic fallback.
    """

    def __init__(self, weights_path: Optional[str] = None):
        self.params = None
        if weights_path:
            from evoworld_tpu.memory.onnx_io import read_onnx_initializers
            from evoworld_tpu.memory.u2net import U2Net

            inits = read_onnx_initializers(weights_path)
            params, report = convert_u2net_onnx_initializers(inits)
            if any(r.startswith("missing") for r in report):
                raise ValueError(
                    f"skyseg conversion incomplete ({report[:4]} ...); "
                    "unsupported ONNX naming?"
                )
            self.params = jax.tree.map(jnp.asarray, params)
            self._net = U2Net()
            self._apply = jax.jit(
                lambda p, x: self._net.apply(p, x)
            )

    def sky_mask(self, image: jnp.ndarray) -> jnp.ndarray:
        """(H, W, 3) RGB in [0, 1] -> (H, W) float mask in [0, 255]; low
        values mark sky (reference `_run_inference` + `segment_sky`)."""
        if self.params is None:
            return sky_mask_heuristic(image)
        h, w = image.shape[:2]
        x = jax.image.resize(image, (320, 320, 3), "bilinear")
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        out = self._apply(self.params, x[None])[0, :, :, 0]
        # Reference post-process (:155-161): min-max -> [0, 255] uint8 grid,
        # then resize back to the source size.
        lo, hi = jnp.min(out), jnp.max(out)
        norm = (out - lo) / jnp.maximum(hi - lo, 1e-12) * 255.0
        norm = jnp.floor(norm).astype(jnp.float32)  # uint8 quantization
        full = jax.image.resize(norm, (h, w), "bilinear")
        # segment_sky flips polarity: output 255 where NOT sky (<1 -> sky).
        return jnp.where(full < 1.0, 255.0, 0.0)

    def apply_to_conf(self, conf: jnp.ndarray, images: jnp.ndarray) -> jnp.ndarray:
        """Zero confidences on sky pixels (reference conf * binary mask :277)."""
        masks = jnp.stack([self.sky_mask(img) for img in images])
        if masks.shape[1:] != conf.shape[1:]:
            masks = jax.image.resize(masks, conf.shape, "bilinear")
        return conf * (masks > 0.01).astype(conf.dtype)


def sky_mask_heuristic(image: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) [0, 1] -> (H, W) mask; 0 ~ sky, 255 ~ not sky.

    Weights-free fallback marking bright, low-texture, blue-ish upper-image
    regions — what the downstream confidence multiply needs when no
    skyseg.onnx is provided."""
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
    """Heuristic-path conf masking (kept for existing callers/tests)."""
    masks = jax.vmap(sky_mask_heuristic)(images)
    return conf * (masks > 0.01).astype(conf.dtype)
