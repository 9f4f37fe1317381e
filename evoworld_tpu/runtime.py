"""Runtime assembly: build models/pipelines from config, loading converted
checkpoints when available.

Checkpoint layout expected (converted or HF-format): a pipeline directory
with `unet/`, `vae/`, `image_encoder/` subfolders containing
`*.safetensors` files in diffusers/transformers naming — the same layout the
reference's `from_pretrained` consumes (navigator_evoworld.py:103-119); the
converters in `models.weights` transpose them into our trees on load.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import jax
import jax.numpy as jnp

from evoworld_tpu.config import EvoWorldConfig
from evoworld_tpu.diffusion.pipeline import PanoDiffusionPipeline, make_random_pipeline
from evoworld_tpu.models.clip import CLIPVisionTower
from evoworld_tpu.models.unet import UNetSpatioTemporal
from evoworld_tpu.models.vae import AutoencoderKLTemporal
from evoworld_tpu.utils.logging import get_logger

logger = get_logger()


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[name]


def _keep_fp32(path) -> bool:
    """True for leaves our modules declare fp32 (norm affines, LayerScale,
    learned pose seed) — precision-critical and tiny; everything else (conv /
    matmul kernels, biases) goes to the compute dtype."""
    names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
    for n in names:
        n = str(n)
        if "norm" in n or n in ("ls1", "ls2", "empty_pose_tokens"):
            return True
    return False


def cast_compute_leaves(params, dtype):
    """Cast matmul/conv leaves to `dtype` host-side, keeping fp32-declared
    leaves (see _keep_fp32) in fp32. Returns numpy leaves so downstream
    host-offload is one transfer."""
    import numpy as np

    def cast(path, x):
        target = np.float32 if _keep_fp32(path) else jnp.dtype(dtype)
        return np.asarray(x).astype(target)

    return jax.tree_util.tree_map_with_path(cast, params)


def _load_safetensors_dir(path: str) -> Optional[dict]:
    from evoworld_tpu.models.weights import load_safetensors

    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        return None
    state: dict = {}
    for f in files:
        state.update(load_safetensors(f))
    return state


def _inference_mesh(rt):
    """Frame-sharding mesh for multi-chip inference (None on one device)."""
    n = len(jax.devices())
    if n <= 1:
        return None
    from evoworld_tpu.parallel.mesh import make_mesh

    return make_mesh(model=rt.mesh_model or 1)


def build_pipeline(config: EvoWorldConfig) -> PanoDiffusionPipeline:
    """Build the diffusion pipeline, converting a checkpoint when given.

    On a multi-device runtime the pipeline shards the denoise loop's frame
    axis over the mesh's data axis automatically.
    """
    rt = config.runtime
    dtype = _dtype(rt.compute_dtype)
    ckpt = rt.checkpoint_dir or rt.svd_checkpoint
    mesh = _inference_mesh(rt)

    if ckpt and os.path.isdir(ckpt):
        from evoworld_tpu.models.weights import (
            convert_clip_state_dict,
            convert_unet_state_dict,
            convert_vae_state_dict,
        )

        logger.info(f"Loading checkpoint from {ckpt}")
        unet_sd = _load_safetensors_dir(os.path.join(ckpt, "unet"))
        vae_sd = _load_safetensors_dir(os.path.join(ckpt, "vae"))
        clip_sd = _load_safetensors_dir(os.path.join(ckpt, "image_encoder"))
        if unet_sd and vae_sd and clip_sd:
            cast = lambda tree: jax.tree.map(lambda x: jnp.asarray(x, dtype), tree)
            params = {
                "unet": cast(convert_unet_state_dict(unet_sd)),
                "vae": cast(convert_vae_state_dict(vae_sd)),
                "clip": cast(convert_clip_state_dict(clip_sd)),
            }
            return PanoDiffusionPipeline(
                UNetSpatioTemporal(), AutoencoderKLTemporal(), CLIPVisionTower(),
                params, config.pipeline, dtype, mesh=mesh,
            )
        logger.warning(f"checkpoint dir {ckpt} incomplete; falling back")

    if not rt.allow_random_weights:
        raise FileNotFoundError(
            f"no usable checkpoint at {ckpt!r} and runtime.allow_random_weights=false"
        )
    if rt.model_preset == "tiny":
        from evoworld_tpu.models.clip import CLIPVisionConfig
        from evoworld_tpu.models.unet import UNetConfig
        from evoworld_tpu.models.vae import VAEConfig

        logger.warning("Building TINY random pipeline (smoke mode)")
        return make_random_pipeline(
            config.pipeline,
            unet_config=UNetConfig(block_out_channels=(32, 64, 128, 128), num_attention_heads=(2, 4, 8, 8)),
            vae_config=VAEConfig(block_out_channels=(32, 64, 128, 128)),
            clip_config=CLIPVisionConfig(hidden_size=64, num_layers=2, num_heads=4, mlp_dim=128),
            compute_dtype=dtype,
            seed=rt.seed,
            mesh=mesh,
        )
    logger.warning("Building pipeline with RANDOM weights (no checkpoint found)")
    return make_random_pipeline(config.pipeline, compute_dtype=dtype, zero_init=False, seed=config.runtime.seed, mesh=mesh)


def build_reconstructor(config: EvoWorldConfig):
    """Build the VGGT reconstructor callable (random weights if no ckpt)."""
    from evoworld_tpu.models.vggt import VGGT, VGGTConfig
    from evoworld_tpu.models.vggt.model import make_reconstructor
    from evoworld_tpu.models.vggt.aggregator import AggregatorConfig

    rt = config.runtime
    dtype = _dtype(rt.compute_dtype)
    # Multi-chip: frame-sharded VGGT with head-sharded global attention
    # (models/vggt/model.py::make_reconstructor). Host param offload is a
    # single-device memory tactic and is skipped on meshes.
    mesh = _inference_mesh(rt) if rt.vggt_mesh else None
    if rt.vggt_checkpoint and os.path.exists(rt.vggt_checkpoint):
        from evoworld_tpu.models.vggt.weights import load_vggt_torch_checkpoint

        logger.info(f"Loading VGGT from {rt.vggt_checkpoint}")
        params, report = load_vggt_torch_checkpoint(rt.vggt_checkpoint)
        if report:
            preview = "; ".join(report[:8])
            logger.warning(f"VGGT conversion: {len(report)} issues ({preview} ...)")
            if not rt.allow_random_weights:
                raise ValueError(
                    f"VGGT checkpoint {rt.vggt_checkpoint} did not convert cleanly"
                )
        # Keep leaves as client-side numpy: make_reconstructor's host-offload
        # then makes the single transfer straight to accelerator-host memory.
        # Cast only matmul/conv weights to the compute dtype; norm affines and
        # LayerScale gammas stay fp32 (the modules declare them fp32, and the
        # reference keeps fp32 master weights under autocast — casting them
        # to bf16 loses geometry-parity headroom for nothing).
        params = cast_compute_leaves(params, dtype)
        return make_reconstructor(VGGT(VGGTConfig()), params, dtype, mesh=mesh)
    if not rt.allow_random_weights:
        raise FileNotFoundError("no VGGT checkpoint and allow_random_weights=false")
    if rt.vggt_tiny:
        logger.warning("Building TINY random VGGT (smoke mode)")
        # The DPT heads tap 4 layers, so even the tiny aggregator keeps depth 4.
        config_ = VGGTConfig(
            aggregator=AggregatorConfig(
                embed_dim=64, depth=4, num_heads=4, num_register_tokens=2,
                output_layers=(0, 1, 2, 3), patch_encoder_depth=1,
            )
        )
    else:
        logger.warning("Building VGGT with RANDOM weights")
        config_ = VGGTConfig()
    model = VGGT(config_)
    sample = jnp.zeros((1, 2, 126, 518, 3), dtype)
    if rt.vggt_tiny:
        params = model.init(jax.random.key(rt.seed), sample)
        params = jax.tree.map(lambda x: x.astype(dtype), params)
    else:
        # Full 1B random init is a pathological compile (thousands of RNG
        # ops); without real weights the values are arbitrary anyway — use
        # cheap deterministic role-aware leaves built host-side. Kept as
        # numpy so make_reconstructor's host-offload is ONE tunnel transfer
        # straight into the accelerator host's pinned memory.
        from evoworld_tpu.models.weights import host_random_params

        shapes = jax.eval_shape(lambda k: model.init(k, sample), jax.random.key(0))
        params = host_random_params(shapes, rt.seed, dtype, as_numpy=True)
    return make_reconstructor(model, params, dtype, mesh=mesh)
