"""Full metric harness: reference-format eval_score.json entries.

Mirrors `/root/reference/evoworld/metrics/calculate_all_metrics.py:216-227`:
the aggregated result has keys fvd / ssim / psnr / lpips / latent_mse /
loop_closure_latent_mse, each shaped

    {"value": {timestamp: mean}, "value_mean": float,
     "value_std": {timestamp: std},      # absent for fvd
     "video_setting": ..., "video_setting_name": ...}

(per-metric structure from calculate_psnr.py:53-69, calculate_lpips.py:62-80,
calculate_latent_mse.py:60-80, calculate_all_metrics.py:150-159).

Feature networks (LPIPS-Alex, Inception-v4, I3D) run with converted torch
weights when provided; without them (zero-egress image) they run with fixed
seed-0 random weights and the result carries `"weights": "random_seed0"` so
values are comparable across our own runs but not to the reference harness.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from evoworld_tpu.eval.feature_nets import InceptionI3D, LPIPSAlex, i3d_preprocess
from evoworld_tpu.eval.inception_v4 import InceptionV4Features
from evoworld_tpu.eval.metrics import frechet_distance, psnr, ssim

_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _result(per_video_per_frame: np.ndarray, video_setting, extra=None) -> dict:
    """(N, F) per-video per-frame values -> reference result dict."""
    arr = np.asarray(per_video_per_frame, np.float64)
    out = {
        "value": {int(t): float(arr[:, t].mean()) for t in range(arr.shape[1])},
        "value_mean": float(arr.mean()),
        "value_std": {int(t): float(arr[:, t].std()) for t in range(arr.shape[1])},
        "video_setting": list(video_setting),
        "video_setting_name": "time, channel, heigth, width",
    }
    if extra:
        out.update(extra)
    return out


def _frame_setting(videos: np.ndarray):
    # Reference reports (time, channel, height, width) of one video.
    n, f, h, w, c = videos.shape
    return (f, c, h, w)


def calculate_psnr(gen: np.ndarray, gt: np.ndarray) -> dict:
    """(N, F, H, W, 3) [0,1] videos -> reference-format PSNR result."""
    fn = jax.jit(jax.vmap(jax.vmap(psnr)))
    vals = np.asarray(fn(jnp.asarray(gen), jnp.asarray(gt)))
    return _result(vals, _frame_setting(gen))


def calculate_ssim(gen: np.ndarray, gt: np.ndarray) -> dict:
    fn = jax.jit(jax.vmap(jax.vmap(ssim)))
    vals = np.asarray(fn(jnp.asarray(gen), jnp.asarray(gt)))
    return _result(vals, _frame_setting(gen))


class FeatureNets:
    """Lazily-initialized metric feature nets + optional converted weights.

    `weight_dirs` maps net name ("lpips" | "inception_v4" | "i3d") to a torch
    checkpoint path; anything absent falls back to seed-0 random weights.
    """

    def __init__(self, weights: Optional[dict] = None):
        self.weights = weights or {}
        self._cache: dict = {}

    def _tag(self, name: str) -> str:
        return "converted" if name in self.weights else "random_seed0"

    def _init(self, name: str, model, sample_args, converter: Callable):
        if name in self._cache:
            return self._cache[name]
        if name in self.weights:
            params = converter(self.weights[name])
        else:
            params = model.init(jax.random.key(0), *sample_args)
        params = jax.tree.map(jnp.asarray, params)  # concrete once; also
        # keeps params as jit ARGUMENTS (closures bake HLO constants)
        self._cache[name] = params
        return params

    def lpips_fn(self):
        model = LPIPSAlex()
        from evoworld_tpu.eval.weights import convert_lpips_state_dict

        params = self._init(
            "lpips", model,
            (jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3))),
            convert_lpips_state_dict,
        )
        fn = jax.jit(model.apply)
        return (lambda a, b: fn(params, a, b)), self._tag("lpips")

    def inception_fn(self):
        model = InceptionV4Features()
        from evoworld_tpu.eval.weights import convert_inception_v4_state_dict

        params = self._init(
            "inception_v4", model, (jnp.zeros((1, 299, 299, 3)),),
            convert_inception_v4_state_dict,
        )
        fn = jax.jit(model.apply)
        return (lambda x: fn(params, x)), self._tag("inception_v4")

    def i3d_fn(self):
        model = InceptionI3D()
        from evoworld_tpu.eval.weights import convert_i3d_state_dict

        params = self._init(
            "i3d", model, (jnp.zeros((1, 10, 32, 32, 3)),),
            convert_i3d_state_dict,
        )
        fn = jax.jit(model.apply)
        return (lambda v: fn(params, v)), self._tag("i3d")


def calculate_lpips(gen: np.ndarray, gt: np.ndarray, nets: FeatureNets) -> dict:
    """LPIPS-Alex per frame ([-1,1] inputs; spatial mean) — reference
    calculate_lpips.py:25-80.

    Frames below 64 px on a side are upscaled first: AlexNet's stride-4 stem
    plus two maxpools collapses smaller maps to zero size (the reference only
    ever feeds full-resolution frames, so it never hits this).
    """
    fn, tag = nets.lpips_fn()
    n, f, h, w = gen.shape[:4]
    if min(h, w) < 64:
        scale = 64 / min(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        gen = np.asarray(jax.image.resize(jnp.asarray(gen), (n, f, nh, nw, 3), "bilinear"))
        gt = np.asarray(jax.image.resize(jnp.asarray(gt), (n, f, nh, nw, 3), "bilinear"))
    vals = np.zeros((n, f))
    for i in range(n):
        a = jnp.asarray(gen[i] * 2.0 - 1.0)
        b = jnp.asarray(gt[i] * 2.0 - 1.0)
        vals[i] = np.asarray(fn(a, b))
    return _result(vals, _frame_setting(gen), {"weights": tag})


def _inception_preprocess(frames: np.ndarray) -> jnp.ndarray:
    """(M, H, W, 3) [0,1] -> (M, 299, 299, 3) imagenet-normalized
    (reference transform: Resize(299) + Normalize, calculate_latent_mse.py:40-44)."""
    x = jax.image.resize(jnp.asarray(frames), (frames.shape[0], 299, 299, 3), "bilinear")
    return (x - _IMAGENET_MEAN) / _IMAGENET_STD


def calculate_latent_mse(gen: np.ndarray, gt: np.ndarray, nets: FeatureNets) -> dict:
    """Inception-v4 feature MSE per frame — calculate_latent_mse.py:34-80.

    The reference averages squared feature differences over (videos,
    channels) per timestamp.
    """
    fn, tag = nets.inception_fn()
    n, f = gen.shape[:2]
    fg = np.zeros((n, f, 1536), np.float32)
    fr = np.zeros((n, f, 1536), np.float32)
    for i in range(n):
        fg[i] = np.asarray(fn(_inception_preprocess(gen[i])))
        fr[i] = np.asarray(fn(_inception_preprocess(gt[i])))
    sq = (fg - fr) ** 2
    mse_t = sq.mean(axis=(0, 2))
    std_t = sq.std(axis=(0, 2))
    return {
        "value": {int(t): float(mse_t[t]) for t in range(f)},
        "value_mean": float(mse_t.mean()),
        "value_std": {int(t): float(std_t[t]) for t in range(f)},
        "video_setting": list(_frame_setting(gen)),
        "video_setting_name": "time, channel, heigth, width",
        "weights": tag,
    }


def calculate_fvd_batch(
    gen: np.ndarray, gt: np.ndarray, nets: FeatureNets,
    min_timestamp: int = 10, batch_size: int = 10, i3d_size: int = 224,
) -> dict:
    """FVD per clip length 10..F (I3D features) — calculate_all_metrics.py:81-160."""
    fn, tag = nets.i3d_fn()
    n, f = gen.shape[:2]

    def feats(videos, t):
        out = []
        for start in range(0, n, batch_size):
            clip = jnp.asarray(videos[start : start + batch_size, :t])
            out.append(np.asarray(fn(i3d_preprocess(clip, i3d_size))))
        return np.concatenate(out)

    results = {}
    for t in range(min_timestamp, f + 1):
        results[int(t)] = frechet_distance(feats(gen, t), feats(gt, t))
    return {
        "value": results,
        "value_mean": float(np.mean(list(results.values()))),
        "fvd_setting": "styleganv-equivalent-i3d",
        "weights": tag,
        "video_setting": list(gen.shape[:2]) + [3, gen.shape[2], gen.shape[3]],
        "video_setting_name": "batch_size, channel, time, height, width",
    }


def calculate_all_metrics(
    gen: np.ndarray, gt: np.ndarray,
    nets: Optional[FeatureNets] = None,
    with_fvd: bool = True,
    i3d_size: int = 224,
) -> dict:
    """(N, F, H, W, 3) [0,1] videos -> full reference-format result dict
    (calculate_all_metrics.py:216-221)."""
    nets = nets or FeatureNets()
    result = {}
    if with_fvd and gen.shape[0] >= 2 and gen.shape[1] >= 10:
        result["fvd"] = calculate_fvd_batch(gen, gt, nets, i3d_size=i3d_size)
    result["ssim"] = calculate_ssim(gen, gt)
    result["psnr"] = calculate_psnr(gen, gt)
    result["lpips"] = calculate_lpips(gen, gt, nets)
    result["latent_mse"] = calculate_latent_mse(gen, gt, nets)
    result["loop_closure_latent_mse"] = calculate_latent_mse(
        gen[:, -1:], gt[:, -1:], nets
    )
    return result
