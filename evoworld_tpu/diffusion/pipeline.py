"""Single-clip panoramic video diffusion pipeline, jitted end-to-end.

Functional equivalent of the reference's extended SVD pipeline
(`StableVideoDiffusionPipeline.__call__`,
/root/reference/evoworld/pipeline/pipeline_evoworld.py:456-741):

  1. CLIP-encode the first frame (antialiased 224x224, zero-embed negative);
  2. VAE-encode the 1+25 conditioning frames (first + rendered 3D memory)
     with noise augmentation;
  3. assemble per-frame conditioning: first-frame latent repeated + per-frame
     memory latent + 6-ch Pluecker = 14 channels (18 with the noisy latent,
     SURVEY.md §2.6); memory latents zeroed when mask_mem;
  4. 25-step Euler/Karras denoise with 2-way CFG and per-frame guidance
     linspace(1, 3) — implemented as a single `lax.scan`, CFG as a batch of 2;
  5. chunked temporal-VAE decode.

Unlike the reference there are no host round-trips: the whole clip generation
is one XLA program, shardable with pjit over a device mesh (batch/CFG/frame
axes). Latent math runs in fp32, model compute in bf16.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from evoworld_tpu.diffusion.scheduler import (
    EulerScheduleConfig,
    euler_step,
    karras_sigmas,
    scale_model_input,
    sigma_to_timestep,
)
from evoworld_tpu.models.clip import CLIPVisionTower, clip_preprocess
from evoworld_tpu.models.unet import UNetSpatioTemporal
from evoworld_tpu.models.vae import AutoencoderKLTemporal
from evoworld_tpu.ops.resize import resize_antialiased


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    height: int = 576
    width: int = 1024
    num_frames: int = 25
    num_steps: int = 25
    min_guidance: float = 1.0
    max_guidance: float = 3.0
    fps: int = 7
    motion_bucket_id: int = 127
    noise_aug_strength: float = 0.02
    decode_chunk: int = 5
    encode_chunk: int = 2  # must divide num_frames + 1
    vae_scaling: float = 0.18215
    schedule: EulerScheduleConfig = EulerScheduleConfig()

    @property
    def latent_height(self) -> int:
        return self.height // 8

    @property
    def latent_width(self) -> int:
        return self.width // 8


class PanoDiffusionPipeline:
    """Bundles the three models + params and exposes a jitted `generate`.

    Args:
        unet, vae, clip_tower: Flax modules.
        params: dict with keys "unet", "vae", "clip".
        config: pipeline hyperparameters.
        compute_dtype: model compute dtype (bf16 on TPU).
    """

    def __init__(
        self,
        unet: UNetSpatioTemporal,
        vae: AutoencoderKLTemporal,
        clip_tower: CLIPVisionTower,
        params: dict[str, Any],
        config: PipelineConfig = PipelineConfig(),
        compute_dtype=jnp.bfloat16,
        mesh=None,
    ):
        """`mesh`: optional jax.sharding.Mesh with a "data" axis — the denoise
        loop's frame axis and the VAE/cond encode batches are then sharded
        over ICI (the north-star multi-chip inference path, SURVEY.md §2.4:
        "shard the CFG batch x frame dims of the UNet via GSPMD")."""
        self.unet = unet
        self.vae = vae
        self.clip_tower = clip_tower
        self.params = params
        self.config = config
        self.compute_dtype = compute_dtype
        self.mesh = mesh
        # Three staged jits instead of one mega-program: peak HBM is the max
        # of the stages rather than their union, and a failure localizes to a
        # stage. Dispatch overhead (2 extra launches per clip) is noise next
        # to 25 UNet forwards.
        self._encode = jax.jit(self._encode_impl)
        self._denoise = jax.jit(self._denoise_impl)
        self._decode = jax.jit(self._decode_impl)

    def _shard_frames(self, x: jnp.ndarray, axis: int) -> jnp.ndarray:
        """Constrain `axis` of x to the mesh's data axis (no-op without mesh)."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = [None] * x.ndim
        spec[axis] = "data"
        return jax.lax.with_sharding_constraint(x, NamedSharding(self.mesh, P(*spec)))

    # ------------------------------------------------------------------
    def __call__(
        self,
        image: jnp.ndarray,
        plucker: jnp.ndarray,
        memory_frames: jnp.ndarray,
        rng: jax.Array,
        mask_mem: bool = False,
        latents: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Generate one clip.

        Args:
            image: (H, W, 3) first frame in [-1, 1].
            plucker: (F, 6, h, w) Pluecker embedding (channel-first, as
                produced by `geometry.plucker_embedding`).
            memory_frames: (F, H, W, 3) rendered memory panoramas in [-1, 1]
                (zeros + mask_mem=True for the first segment).
            rng: JAX PRNG key.
            mask_mem: zero out memory conditioning latents.
            latents: optional pre-drawn (F, h, w, 4) standard-normal noise.

        Returns:
            (F, H, W, 3) frames in [0, 1].
        """
        mask_flag = jnp.asarray(1.0 if mask_mem else 0.0, jnp.float32)
        if latents is None:
            rng, sub = jax.random.split(rng)
            latents = jax.random.normal(
                sub,
                (self.config.num_frames, self.config.latent_height, self.config.latent_width, 4),
                jnp.float32,
            )
        context_cfg, cond_cfg = self._encode(self.params, image, plucker, memory_frames, mask_flag, rng)
        denoised = self._denoise(self.params, latents, context_cfg, cond_cfg)
        return self._decode(self.params, denoised)

    # ------------------------------------------------------------------
    def _encode_impl(self, params, image, plucker, memory_frames, mask_flag, rng):
        cfg = self.config
        dtype = self.compute_dtype
        f = cfg.num_frames

        # --- CLIP context from the first frame -------------------------
        x224 = resize_antialiased(image[None], (224, 224))
        clip_in = clip_preprocess((x224 + 1.0) / 2.0)
        embed = self.clip_tower.apply(params["clip"], clip_in.astype(dtype))  # (1, 1024)
        context = embed[:, None, :].astype(dtype)                             # (1, 1, 1024)
        context_cfg = jnp.concatenate([jnp.zeros_like(context), context], 0)  # (2, 1, 1024)

        # --- VAE-encode conditioning frames (noise-augmented) ----------
        cond_images = jnp.concatenate([image[None], memory_frames], axis=0)   # (1+F, H, W, 3)
        noise = jax.random.normal(rng, cond_images.shape, jnp.float32)
        cond_images = cond_images + cfg.noise_aug_strength * noise
        # Chunked encode: all 26 frames at once needs ~9 GB of activations at
        # 1024x576 — far over a v5e chip's HBM.
        ec = cfg.encode_chunk
        assert (f + 1) % ec == 0, "encode_chunk must divide num_frames + 1"
        img_chunks = cond_images.reshape((f + 1) // ec, ec, *cond_images.shape[1:])

        def encode_chunk(c):
            return self.vae.apply(
                params["vae"], c.astype(dtype), method=AutoencoderKLTemporal.encode_mode
            ).astype(jnp.float32)

        if self.mesh is not None:
            # Sharded path: encode all cond frames at once, frame-sharded over
            # the mesh (per-chip activation footprint = full/-N).
            cond_latents = encode_chunk(self._shard_frames(cond_images, 0))
        else:
            cond_latents = jax.lax.map(encode_chunk, img_chunks)
            cond_latents = cond_latents.reshape(f + 1, *cond_latents.shape[2:])  # (1+F, h, w, 4)

        first_lat = jnp.broadcast_to(cond_latents[0:1], (f,) + cond_latents.shape[1:])
        mem_lat = cond_latents[1:] * (1.0 - mask_flag)
        plucker_hwc = jnp.transpose(plucker, (0, 2, 3, 1)).astype(jnp.float32)  # (F, h, w, 6)

        cond = jnp.concatenate([first_lat, mem_lat, plucker_hwc], axis=-1)     # (F, h, w, 14)
        uncond = jnp.concatenate([jnp.zeros_like(first_lat), jnp.zeros_like(mem_lat), plucker_hwc], -1)
        cond_cfg = jnp.stack([uncond, cond], axis=0)                           # (2, F, h, w, 14)
        return context_cfg, cond_cfg

    # ------------------------------------------------------------------
    def _denoise_impl(self, params, init_noise, context_cfg, cond_cfg):
        cfg = self.config
        dtype = self.compute_dtype
        f = cfg.num_frames

        # --- micro-conditioning ---------------------------------------
        time_ids = jnp.asarray(
            [[cfg.fps - 1, cfg.motion_bucket_id, cfg.noise_aug_strength]], jnp.float32
        )
        time_ids_cfg = jnp.concatenate([time_ids, time_ids], 0)                # (2, 3)

        # --- denoise loop ---------------------------------------------
        sigmas = karras_sigmas(cfg.num_steps, cfg.schedule)
        guidance = jnp.linspace(cfg.min_guidance, cfg.max_guidance, f).reshape(1, f, 1, 1, 1)

        latents = init_noise * sigmas[0]                                       # (F, h, w, 4)

        latents = self._shard_frames(latents, 0)
        cond_cfg = self._shard_frames(cond_cfg, 1)

        def step(lat, sig_pair):
            sigma, sigma_next = sig_pair
            lat_in = scale_model_input(lat, sigma)[None]                       # (1, F, h, w, 4)
            lat_in = jnp.concatenate([lat_in, lat_in], 0)                      # (2, F, h, w, 4)
            unet_in = jnp.concatenate([lat_in, cond_cfg], axis=-1)             # (2, F, h, w, 18)
            unet_in = self._shard_frames(unet_in, 1)
            out = self.unet.apply(
                params["unet"],
                unet_in.astype(dtype),
                sigma_to_timestep(sigma),
                context_cfg,
                time_ids_cfg,
            ).astype(jnp.float32)                                              # (2, F, h, w, 4)
            pred = out[0:1] + guidance * (out[1:2] - out[0:1])
            lat = euler_step(pred[0], lat, sigma, sigma_next)
            return lat, ()

        sig_pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=-1)
        latents, _ = jax.lax.scan(step, latents, sig_pairs)
        return latents

    # ------------------------------------------------------------------
    def _decode_impl(self, params, latents):
        cfg = self.config
        dtype = self.compute_dtype
        f = cfg.num_frames

        # --- chunked temporal decode ----------------------------------
        chunk = cfg.decode_chunk
        assert f % chunk == 0, "num_frames must be divisible by decode_chunk"
        lat_chunks = (latents / cfg.vae_scaling).reshape(f // chunk, chunk, *latents.shape[1:])

        def decode_chunk(c):
            return self.vae.apply(
                params["vae"], c.astype(dtype), chunk, method=AutoencoderKLTemporal.decode
            ).astype(jnp.float32)

        if self.mesh is not None:
            # Chunk-parallel decode: vmap over chunks, chunk axis sharded.
            frames = jax.vmap(decode_chunk)(self._shard_frames(lat_chunks, 0))
        else:
            frames = jax.lax.map(decode_chunk, lat_chunks)
        frames = frames.reshape(f, cfg.height, cfg.width, 3)
        return jnp.clip(frames / 2.0 + 0.5, 0.0, 1.0)


def make_random_pipeline(
    config: PipelineConfig = PipelineConfig(),
    unet_config=None,
    vae_config=None,
    clip_config=None,
    seed: int = 0,
    compute_dtype=jnp.bfloat16,
    zero_init: bool = False,
    mesh=None,
) -> PanoDiffusionPipeline:
    """Build a pipeline with randomly initialized (or zero) weights.

    Used for smoke tests, benchmarks, and the graft entry; real checkpoints
    load through `evoworld_tpu.models.weights` converters instead.
    """
    from evoworld_tpu.models.clip import CLIPVisionConfig
    from evoworld_tpu.models.unet import UNetConfig
    from evoworld_tpu.models.vae import VAEConfig

    unet = UNetSpatioTemporal(unet_config or UNetConfig())
    vae = AutoencoderKLTemporal(vae_config or VAEConfig())
    clip_tower = CLIPVisionTower(clip_config or CLIPVisionConfig())

    from evoworld_tpu.models.weights import host_random_params

    def init_or_zeros(fn, model_salt):
        # Shapes via eval_shape; values host-side. Device-side flax init of a
        # 1.5B tree is a pathological compile on remote backends, and random
        # weights only need to be deterministic, not distribution-faithful.
        # model_salt decorrelates the three models' streams (same seed would
        # make same-shaped leaves bitwise identical across unet/vae/clip).
        shapes = jax.eval_shape(fn, jax.random.key(0))
        if zero_init:
            # Store in compute dtype: a full fp32 1.5B-param tree alone is
            # 6 GB of HBM — inference keeps everything in bf16.
            return jax.tree.map(lambda s: jnp.zeros(s.shape, compute_dtype), shapes)
        return host_random_params(shapes, seed * 3 + model_salt, compute_dtype)

    unet_params = init_or_zeros(
        lambda k: unet.init(
            k,
            jnp.zeros((1, 2, 8, 16, 18), compute_dtype),
            jnp.asarray(1.0),
            jnp.zeros((1, 1, 1024), compute_dtype),
            jnp.zeros((1, 3)),
        ),
        model_salt=0,
    )
    vae_params = init_or_zeros(
        lambda k: vae.init(k, jnp.zeros((2, 64, 64, 3), compute_dtype), 2),
        model_salt=1,
    )
    clip_params = init_or_zeros(
        lambda k: clip_tower.init(k, jnp.zeros((1, 224, 224, 3), compute_dtype)),
        model_salt=2,
    )
    params = {"unet": unet_params, "vae": vae_params, "clip": clip_params}
    return PanoDiffusionPipeline(unet, vae, clip_tower, params, config, compute_dtype, mesh=mesh)
