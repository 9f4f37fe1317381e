"""Sharded EDM fine-tuning step.

Functional equivalent of the reference training loop body
(/root/reference/evoworld/trainer/train_evoworld.py:510-724):

  - latents   = vae.encode(frames).sample() * 0.18215
  - cond lat  = vae.encode(frames + sigma_aug * eps) (unscaled),
                sigma_aug ~ LogNormal(-3, 0.5)
  - sigma     ~ LogNormal(0.7, 1.6); noisy = latents + sigma * eps
  - unet([noisy/sqrt(sigma^2+1); first-frame lat; memory lat; Pluecker],
         t = 0.25 log sigma, CLIP ctx, added_time_ids [7, 127, sigma_aug])
  - denoised  = c_out * pred + c_skip * noisy
  - loss      = mean((1+sigma^2)/sigma^2 * (denoised - latents)^2)
  - conditioning dropout: p zeroes CLIP + first-frame latents, 2p memory
    latents (:645-675)
  - only temporal transformer blocks, conv_in/out, and all norm params train
    (:303-315); optimizer AdamW + cosine schedule.

Distribution: one jitted step over a ("data", "model") mesh — batch sharded
over data (DDP analog), optimizer state sharded (ZeRO-1 analog), large
kernels optionally sharded over model (TP). Gradient all-reduce is emitted by
GSPMD; there is no explicit collective code (SURVEY.md §2.5).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from evoworld_tpu.diffusion.scheduler import edm_loss_weight, sigma_to_timestep
from evoworld_tpu.models.clip import clip_preprocess
from evoworld_tpu.models.vae import AutoencoderKLTemporal
from evoworld_tpu.ops.resize import resize_antialiased


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    weight_decay: float = 1e-2
    max_grad_norm: float = 1.0
    conditioning_dropout_prob: float = 0.1
    sigma_loc: float = 0.7
    sigma_scale: float = 1.6
    cond_sigma_loc: float = -3.0
    cond_sigma_scale: float = 0.5
    vae_scaling: float = 0.18215
    fps_cond: float = 7.0
    motion_bucket_id: float = 127.0
    total_steps: int = 30000
    warmup_steps: int = 500
    lr_schedule: str = "cosine"  # "cosine" | "constant"
    zero_stage: int = 1  # 1: opt-state sharding; >=2: + gradient reduce-scatter
    # Frames per VAE-encoder apply inside the loss (0 = all at once). Encoding
    # 26 frames of 1024x576 in one conv stack peaks ~4 GiB/layer of transient
    # activations; per-frame encodes are independent, so chunking is exact.
    vae_encode_chunk: int = 8


def trainable_mask(params) -> Any:
    """Boolean pytree: True for trainable leaves (reference partial-unfreeze
    semantics — path contains a temporal transformer block, conv_in/out, or
    any norm)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(path):
        return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)

    masks = {}
    for path, _ in flat:
        s = path_str(path).lower()
        masks[path_str(path)] = (
            "temporal_transformer_block" in s
            or "conv_in" in s
            or "conv_out" in s
            or "norm" in s
        )

    def to_mask(path, _leaf):
        return masks[path_str(path)]

    return jax.tree_util.tree_map_with_path(to_mask, params)


def freeze_master_cast(params, compute_dtype=jnp.bfloat16, mask=None):
    """Master-weight policy of the reference's mixed-precision training:
    fp32 master copies exist ONLY for trainable leaves; frozen leaves are
    stored directly in the compute dtype.

    DeepSpeed/accelerate fp16 training (train.sh --mixed_precision fp16,
    config/deepspeed_o1_4gpu.yaml) keeps fp32 masters only for parameters in
    the optimizer's param list — the ~74% frozen remainder of the 1.5B UNet
    lives in half precision. Mirroring that here removes ~4.3 GiB from the
    single-chip training-state floor (frozen fp32 2.25 GiB + their transient
    bf16 compute copies ~2.1 GiB): the modules compute in the input dtype, so
    bf16-stored frozen leaves flow through with no cast copy at all.
    """
    if mask is None:
        mask = trainable_mask(params)
    return jax.tree.map(
        lambda p, m: p if m else p.astype(compute_dtype), params, mask
    )


def make_lr_schedule(config: TrainConfig) -> optax.Schedule:
    """The optimizer's LR schedule — single source of truth, also used by the
    trainer's metric logging (keeps the logged lr honest)."""
    if config.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, config.learning_rate, config.warmup_steps, config.total_steps
        )
    return optax.constant_schedule(config.learning_rate)


def make_optimizer(config: TrainConfig, params) -> optax.GradientTransformation:
    schedule = make_lr_schedule(config)
    mask = trainable_mask(params)
    labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
    train_tx = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adamw(
            schedule,
            b1=config.adam_b1,
            b2=config.adam_b2,
            eps=config.adam_eps,
            weight_decay=config.weight_decay,
        ),
    )
    # multi_transform: frozen leaves get zero updates and carry no Adam state;
    # the grad-norm clip sees only the trainable subset (matching the
    # reference, which clips the optimizer's param list only).
    return optax.multi_transform({"train": train_tx, "freeze": optax.set_to_zero()}, labels)


from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_train_state(config: TrainConfig, unet_params) -> tuple[TrainState, optax.GradientTransformation]:
    opt = make_optimizer(config, unet_params)
    return TrainState(unet_params, opt.init(unet_params), jnp.zeros((), jnp.int32)), opt


def _shard_axis(x: jnp.ndarray, mesh, axis: int) -> jnp.ndarray:
    """Constrain `axis` of x to the mesh's data axis (no-op without mesh) —
    the training-side twin of diffusion/pipeline.py::_shard_frames."""
    if mesh is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = [None] * x.ndim
    spec[axis] = "data"
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def edm_loss(
    unet,
    vae,
    clip_tower,
    unet_params,
    frozen_params: dict,
    batch: dict,
    rng: jax.Array,
    config: TrainConfig,
    compute_dtype=jnp.bfloat16,
    frame_mesh=None,
) -> jnp.ndarray:
    """EDM denoising loss for one batch.

    batch:
      pixel_values: (B, F, H, W, 3) in [-1, 1]
      memory_values: (B, F, H, W, 3) in [-1, 1]
      plucker: (B, F, h, w, 6) channels-last

    `frame_mesh`: optional mesh whose "data" axis the FRAME dimension of the
    activations is constrained to (sequence-parallel training). This is how
    bs-1 reference-scale training (1024x576x25) fits 16 GiB chips: the batch
    axis is unshardable at bs1, but the ~60 GiB of per-step activation temps
    scale with frames x latent-pixels, and frames shard cleanly — spatial
    convs/attention are frame-independent; only the temporal-mix layers
    cross chips (SCALING.md "Training sharding").
    """
    px = batch["pixel_values"]
    mem = batch["memory_values"]
    plucker = batch["plucker"].astype(jnp.float32)
    b, f = px.shape[0], px.shape[1]

    r_lat, r_noise, r_csig, r_cnoise, r_sig, r_drop, r_clipz = jax.random.split(rng, 7)

    def vae_encode_sample(images, key):
        flat = images.reshape((-1,) + images.shape[2:])
        flat = _shard_axis(flat, frame_mesh, 0)  # (B*F) folds the frame axis
        n = flat.shape[0]
        chunk = config.vae_encode_chunk or n
        moments = jnp.concatenate(
            [
                vae.apply(
                    frozen_params["vae"],
                    flat[i : i + chunk].astype(compute_dtype),
                    method=AutoencoderKLTemporal.encode_moments,
                )
                for i in range(0, n, chunk)
            ],
            axis=0,
        ).astype(jnp.float32)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        z = mean + std * jax.random.normal(key, mean.shape, jnp.float32)
        return z.reshape(images.shape[:2] + z.shape[1:])

    latents = vae_encode_sample(px, r_lat) * config.vae_scaling          # (B, F, h, w, 4)
    latents = _shard_axis(latents, frame_mesh, 1)

    # Conditioning latents with noise augmentation (unscaled).
    cond_imgs = jnp.concatenate([px[:, 0:1], mem], axis=1)               # (B, 1+F, H, W, 3)
    cond_sigma = jnp.exp(
        config.cond_sigma_loc
        + config.cond_sigma_scale * jax.random.normal(r_csig, (b,), jnp.float32)
    )
    cond_imgs = cond_imgs + cond_sigma[:, None, None, None, None] * jax.random.normal(
        r_cnoise, cond_imgs.shape, jnp.float32
    )
    cond_lat = vae_encode_sample(cond_imgs, r_clipz)                      # (B, 1+F, h, w, 4)
    first_lat = jnp.broadcast_to(cond_lat[:, 0:1], cond_lat[:, 1:].shape)
    mem_lat = cond_lat[:, 1:]

    # CLIP context of the first frame.
    x224 = resize_antialiased(px[:, 0], (224, 224))
    embeds = clip_tower.apply(
        frozen_params["clip"], clip_preprocess((x224 + 1.0) / 2.0).astype(compute_dtype)
    ).astype(jnp.float32)
    context = embeds[:, None, :]                                          # (B, 1, 1024)

    # Conditioning dropout (p: CLIP+first-frame, 2p: memory).
    p = config.conditioning_dropout_prob
    rand = jax.random.uniform(r_drop, (b,))
    img_keep = (rand >= p).astype(jnp.float32)
    mem_keep = (rand >= 2.0 * p).astype(jnp.float32)
    context = context * img_keep[:, None, None]
    first_lat = first_lat * img_keep[:, None, None, None, None]
    mem_lat = mem_lat * mem_keep[:, None, None, None, None]

    # EDM noise level and preconditioning.
    sigma = jnp.exp(
        config.sigma_loc + config.sigma_scale * jax.random.normal(r_sig, (b,), jnp.float32)
    )
    sig = sigma[:, None, None, None, None]
    noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
    noisy = latents + noise * sig
    inp = noisy / jnp.sqrt(sig**2 + 1.0)

    unet_in = jnp.concatenate([inp, first_lat, mem_lat, plucker], axis=-1)  # (B, F, h, w, 18)
    unet_in = _shard_axis(unet_in, frame_mesh, 1)
    timesteps = sigma_to_timestep(sigma)
    time_ids = jnp.stack(
        [
            jnp.full((b,), config.fps_cond),
            jnp.full((b,), config.motion_bucket_id),
            cond_sigma,
        ],
        axis=-1,
    )

    pred = unet.apply(
        unet_params,
        unet_in.astype(compute_dtype),
        timesteps,
        context.astype(compute_dtype),
        time_ids,
    ).astype(jnp.float32)

    c_out = -sig / jnp.sqrt(sig**2 + 1.0)
    c_skip = 1.0 / (sig**2 + 1.0)
    denoised = pred * c_out + c_skip * noisy
    weight = edm_loss_weight(sig)
    loss = jnp.mean(weight * (denoised - latents) ** 2)
    return loss


def make_sharded_train_step(
    unet,
    vae,
    clip_tower,
    frozen_params: dict,
    optimizer: optax.GradientTransformation,
    config: TrainConfig,
    mesh=None,
    compute_dtype=jnp.bfloat16,
    accum_steps: int = 1,
    zero_stage: int = 1,
    shard_frames: bool = False,
    compiler_options: dict | None = None,
):
    """Build the jitted (optionally mesh-sharded) train step.

    Returns step(state, batch, rng) -> (state, metrics). When `mesh` is given
    the batch is sharded over the "data" axis and gradients are averaged by
    GSPMD-inserted collectives.

    `shard_frames` shards the FRAME axis (batch dim 1) over "data" instead of
    the batch axis — sequence parallelism for bs-per-mesh == 1, where batch
    sharding is a no-op but the activation temps (which scale with frames x
    latent-pixels, ~60 GiB at the reference 1024x576x25 shape) split ~1/N per
    chip. See edm_loss's `frame_mesh` and SCALING.md "Training sharding".

    `zero_stage` >= 2 additionally constrains the gradients to data-axis
    shards before the optimizer update (DeepSpeed ZeRO-2 dataflow: the
    gradient reduction lowers to reduce-scatter and the update runs on
    shards; updated params all-gather back to replicated). CPU optimizer
    offload (the reference's o2_offload config) is a deliberate non-goal:
    with ZeRO-1/2 sharding, 1.5 B params of fp32 Adam state fit v5e-8 HBM.

    With accum_steps > 1 the batch leaves carry a leading micro-batch axis
    (accum, B, ...); gradients are averaged over the micro-batches inside a
    `lax.scan` and the optimizer is applied ONCE per global step — the
    reference's `accelerator.accumulate` semantics
    (train_evoworld.py:525, --gradient_accumulation_steps 4 in train.sh:20).

    `compiler_options` passes per-jit XLA options (the multi-chip dryrun
    compiles this step on a virtual CPU backend with
    {"xla_backend_optimization_level": 0}: the gate is compile-dominated and
    executes one tiny step, so skipping the expensive LLVM passes halves its
    wall clock without touching any production compile).
    """

    def value_and_grads(params, mask, batch, rng):
        # Differentiate only the trainable subset — torch's requires_grad=False
        # semantics (the reference freezes ~74% of the 1.5B tree,
        # train_evoworld.py partial unfreeze): stop_gradient cuts the frozen
        # leaves' VJPs out of the backward graph, and collapsing their (then
        # symbolically-zero) cotangents to () scalars keeps the accum carry,
        # grad-norm metric, and optimizer from ever materializing ~4.3 GB of
        # dead fp32 gradients. Without this, the full-architecture train step
        # cannot fit a 16 GB chip at ANY resolution (params 5.7 + full grads
        # 5.7 + moments 3.0 + bf16 copy 2.8 = 17.2 GB before activations).
        def loss_fn(p):
            p = jax.tree.map(
                lambda x, m: x if m else jax.lax.stop_gradient(x), p, mask
            )
            return edm_loss(
                unet, vae, clip_tower, p, frozen_params, batch, rng, config,
                compute_dtype, frame_mesh=mesh if shard_frames else None,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.tree.map(
            lambda g, m: g if m else jnp.zeros((), g.dtype), grads, mask
        )
        return loss, grads

    def step_fn(state: TrainState, batch: dict, rng: jax.Array):
        mask = trainable_mask(state.params)
        if accum_steps == 1:
            loss, grads = value_and_grads(state.params, mask, batch, rng)
        else:
            keys = jax.random.split(rng, accum_steps)

            def body(carry, xs):
                loss_sum, grad_sum = carry
                micro_batch, key = xs
                loss, grads = value_and_grads(state.params, mask, micro_batch, key)
                grad_sum = jax.tree.map(
                    lambda a, g: a + g.astype(jnp.float32), grad_sum, grads
                )
                return (loss_sum + loss, grad_sum), None

            zeros = jax.tree.map(
                lambda p, m: jnp.zeros(p.shape if m else (), jnp.float32),
                state.params, mask,
            )
            (loss_sum, grad_sum), _ = jax.lax.scan(body, (0.0, zeros), (batch, keys))
            loss = loss_sum / accum_steps
            grads = jax.tree.map(
                lambda g, p: (g / accum_steps).astype(p.dtype), grad_sum, state.params
            )

        if mesh is not None and zero_stage >= 2:
            from evoworld_tpu.parallel.mesh import zero_shard_specs

            grads = jax.lax.with_sharding_constraint(
                grads, zero_shard_specs(grads, mesh)
            )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1)
        # Norm of the TRAINABLE gradients (frozen cotangents are () zeros) —
        # the quantity the reference monitors (its clip sees only the
        # optimizer's param list).
        gnorm = optax.global_norm(grads)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    if mesh is None:
        # Pin every argument to the default device. Orbax-restored state is
        # committed (x.committed=True) while freshly-initialized state is
        # not, and pjit keys its executable on that — without explicit
        # in_shardings a resume pays TWO full recompiles (one for the
        # restored state, one more for its first step output). Pinning makes
        # fresh and resumed runs share a single executable (measured:
        # 121 s -> 0.6 s for the first post-restore step on the tiny config).
        sds = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        return jax.jit(step_fn, in_shardings=(sds, sds, sds), donate_argnums=(0,),
                       compiler_options=compiler_options)

    from jax.sharding import NamedSharding, PartitionSpec as P

    if shard_frames:
        # Frame sharding happens INSIDE the step (edm_loss's
        # with_sharding_constraint calls, which GSPMD pads for frame counts
        # that don't divide the mesh — the reference trains F=25 on meshes
        # of 8). An explicit frame spec in in_shardings would instead
        # REQUIRE divisibility at lower time, so the batch argument accepts
        # any placement here (AUTO: committed sharded inputs stay put,
        # host arrays replicate).
        batch_shardings = None
    else:
        batch_spec = P(None, "data") if accum_steps > 1 else P("data")
        batch_sharding = NamedSharding(mesh, batch_spec)
        batch_shardings = {
            "pixel_values": batch_sharding,
            "memory_values": batch_sharding,
            "plucker": batch_sharding,
        }
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step_fn,
        in_shardings=(None, batch_shardings, repl),
        donate_argnums=(0,),
        compiler_options=compiler_options,
    )
