"""Training orchestration: batching, accumulation, checkpointing, validation.

Equivalent of the reference trainer main loop
(/root/reference/evoworld/trainer/train_evoworld.py:85-924) minus
accelerate/DeepSpeed — distribution is the mesh-sharded train step
(train_step.py), checkpoints are Orbax with keep-limit pruning and
resume-latest (reference :470-494, :740-769, :884-891), validation renders
side-by-side clips every `validation_steps` (:771-875).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from evoworld_tpu.data.dataset import EpisodeDataset
from evoworld_tpu.geometry.plucker import plucker_embedding
from evoworld_tpu.geometry.pose import pose_to_matrix
from evoworld_tpu.geometry.rays import equirect_ray_grid
from evoworld_tpu.train.train_step import (
    TrainConfig,
    TrainState,
    freeze_master_cast,
    make_optimizer,
    make_sharded_train_step,
)
from evoworld_tpu.utils.logging import get_logger

logger = get_logger()


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    output_dir: str = "outputs/train"
    max_steps: int = 30000
    checkpointing_steps: int = 500
    checkpoints_total_limit: int = 2
    validation_steps: int = 1000
    log_steps: int = 10
    gradient_accumulation_steps: int = 1
    per_device_batch_size: int = 1  # reference --per_gpu_batch_size (train.sh:19)
    resume: bool = True
    use_ema: bool = False
    ema_decay: float = 0.9999
    # Batches buffered ahead by the background prefetch thread — the
    # reference's DataLoader num_workers analogue (train_evoworld.py:349-359,
    # arg_parser.py:148). 0 disables prefetching (synchronous iteration).
    prefetch_depth: int = 2


_NO_SHARDING = object()  # sentinel: None would collapse to an empty subtree


def _tree_shardings(tree):
    """Sharding per array leaf (sentinel for any non-array leaf)."""
    return jax.tree.map(
        lambda x: x.sharding if isinstance(x, jax.Array) else _NO_SHARDING, tree
    )


def _place_like(tree, shardings):
    """device_put each array leaf onto its recorded sharding."""
    return jax.tree.map(
        lambda x, s: x if s is _NO_SHARDING else jax.device_put(x, s),
        tree, shardings,
    )


def ema_update(ema_params, params, decay: float):
    """EMA of the params (reference EMAModel, train_evoworld.py:226-231,
    :727-729 — swapped in for validation/final export)."""
    return jax.tree.map(lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema_params, params)


class CheckpointManager:
    """Orbax-backed save/restore with keep-limit + resume-latest."""

    def __init__(self, directory: str, keep: int = 2):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
        )

    def save(self, step: int, state: TrainState, ema_params=None):
        import orbax.checkpoint as ocp

        items = dict(
            params=ocp.args.StandardSave(state.params),
            opt_state=ocp.args.StandardSave(state.opt_state),
        )
        if ema_params is not None:
            # Persisted alongside the raw params (reference EMAModel state is
            # saved/loaded by the accelerate hooks, train_evoworld.py:236-269).
            items["ema"] = ocp.args.StandardSave(ema_params)
        self.manager.save(step, args=ocp.args.Composite(**items))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def _step_dir(self, step: int) -> str:
        """Resolve the on-disk directory for `step` via the manager (honors
        custom step name formats); falls back to the default `<dir>/<step>`."""
        try:
            return str(self.manager._get_read_step_directory(step, self.manager.directory))
        except Exception:  # noqa: BLE001 — orbax-internal API drift
            return os.path.join(self.directory, str(step))

    def restore(self, step: int, state: TrainState, with_ema: bool = False):
        """Restore a TrainState; with_ema also returns the saved EMA params
        (None when the checkpoint predates EMA or was written without it)."""
        import orbax.checkpoint as ocp

        items = dict(
            params=ocp.args.StandardRestore(state.params),
            opt_state=ocp.args.StandardRestore(state.opt_state),
        )
        # Probe the item directory rather than item_metadata(): the latter
        # logs handler-registry warnings for every composite item. The step
        # directory is resolved through the manager so non-default step
        # formats (fixed-length, name prefixes) still find the ema item.
        if with_ema:
            if os.path.isdir(os.path.join(self._step_dir(step), "ema")):
                items["ema"] = ocp.args.StandardRestore(state.params)
            else:
                logger.warning(
                    f"checkpoint step {step} has no 'ema' item; restoring raw "
                    "params only (EMA will reset)"
                )
        restored = self.manager.restore(step, args=ocp.args.Composite(**items))
        out = TrainState(restored["params"], restored["opt_state"], jnp.asarray(step, jnp.int32))
        if with_ema:
            return out, restored.get("ema")
        return out


def episode_batches(
    dataset: EpisodeDataset,
    batch_size: int,
    latent_hw: tuple[int, int],
    seed: int = 0,
) -> Iterator[dict]:
    """Yield train batches with Pluecker embeddings, forever.

    Mirrors the reference's per-sample pose -> relative 3x4 -> Pluecker at
    latent resolution (train_evoworld.py:558-564), channels-last.
    """
    rays = equirect_ray_grid(*latent_hw)
    rng = np.random.default_rng(seed)
    while True:
        idxs = rng.integers(0, len(dataset), size=batch_size)
        px, mem, plk = [], [], []
        for i in idxs:
            sample = dataset[int(i)]
            f = sample.pixel_values.shape[0]
            px.append(sample.pixel_values)
            mem.append(sample.memory_values[:f])
            c2w = pose_to_matrix(jnp.asarray(sample.cam_traj), relative=True)
            p = plucker_embedding(rays, c2w)          # (F, 6, h, w)
            plk.append(jnp.transpose(p, (0, 2, 3, 1)))
        yield {
            "pixel_values": jnp.asarray(np.stack(px)),
            "memory_values": jnp.asarray(np.stack(mem)),
            "plucker": jnp.stack(plk),
        }


def train(
    unet,
    vae,
    clip_tower,
    unet_params,
    frozen_params: dict,
    dataset: EpisodeDataset,
    config: TrainConfig,
    trainer_config: TrainerConfig,
    mesh=None,
    batch_size: int = 1,
    compute_dtype=jnp.bfloat16,
    validation_fn=None,
):
    """Run the training loop; returns the final TrainState."""
    # Reference mixed-precision master-weight policy: fp32 masters only for
    # the trainable subset; frozen leaves live in the compute dtype (see
    # freeze_master_cast). Checkpoints written by this trainer carry the
    # mixed-dtype tree; resuming restores it as saved.
    unet_params = freeze_master_cast(unet_params, compute_dtype)
    optimizer = make_optimizer(config, unet_params)
    opt_state = optimizer.init(unet_params)
    if mesh is not None:
        # ZeRO-1: park Adam moments data-axis-sharded (reference default,
        # config/deepspeed_o1_4gpu.yaml zero_stage: 1). GSPMD keeps the
        # sharded layout through the jitted update.
        from evoworld_tpu.parallel.mesh import shard_opt_state_zero1

        opt_state = jax.device_put(opt_state, shard_opt_state_zero1(opt_state, mesh))
    state = TrainState(unet_params, opt_state, jnp.zeros((), jnp.int32))

    ckpt = CheckpointManager(
        os.path.join(trainer_config.output_dir, "checkpoints"),
        keep=trainer_config.checkpoints_total_limit,
    )
    restored_ema = None
    if trainer_config.resume and ckpt.latest_step() is not None:
        step0 = ckpt.latest_step()
        logger.info(f"Resuming from checkpoint step {step0}")
        shardings = _tree_shardings((state.params, state.opt_state))
        if trainer_config.use_ema:
            state, restored_ema = ckpt.restore(step0, state, with_ema=True)
        else:
            state = ckpt.restore(step0, state)
        # Checkpoints saved before the mixed-dtype master policy carry
        # all-fp32 frozen leaves; re-apply the cast so a resumed run keeps
        # the memory win and compiles the same step executable as a fresh
        # one. Idempotent for checkpoints already in the mixed policy.
        state = TrainState(
            freeze_master_cast(state.params, compute_dtype),
            state.opt_state,
            state.step,
        )
        if mesh is not None:
            # Re-apply the pre-restore placements (ZeRO-1 opt-state shards,
            # the caller's param sharding): orbax returns single-device
            # committed arrays, which would both mis-place the 1.5B-param
            # state and key a separate step executable.
            state = TrainState(
                _place_like(state.params, shardings[0]),
                _place_like(state.opt_state, shardings[1]),
                state.step,
            )
            if restored_ema is not None:
                restored_ema = _place_like(restored_ema, shardings[0])
        elif restored_ema is not None:
            # Single-device: decommit (orbax arrays are committed, fresh ones
            # are not, and jit keys on that) so ema_update reuses its
            # executable across fresh and resumed runs.
            restored_ema = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), restored_ema)

    accum = trainer_config.gradient_accumulation_steps
    step_fn = make_sharded_train_step(
        unet, vae, clip_tower, frozen_params, optimizer, config, mesh, compute_dtype,
        accum_steps=accum, zero_stage=config.zero_stage,
    )

    h = dataset.height // 8
    w = dataset.width // 8
    batches = episode_batches(dataset, batch_size, (h, w))
    if trainer_config.prefetch_depth > 0:
        # Overlap host-side batch assembly (PNG decode, Pluecker embedding)
        # with the async device step, like the reference's multi-worker
        # DataLoader does on GPU hosts.
        from evoworld_tpu.data.prefetch import PrefetchIterator

        batches = PrefetchIterator(batches, depth=trainer_config.prefetch_depth)
    rng = jax.random.key(0)

    from evoworld_tpu.utils.trackers import JSONLTracker

    tracker = JSONLTracker(trainer_config.output_dir)
    from evoworld_tpu.train.train_step import make_lr_schedule

    lr_schedule = make_lr_schedule(config)

    running = 0.0
    t0 = time.time()
    start_step = int(state.step)
    ema_params = None
    if trainer_config.use_ema:
        # Resume keeps the EMA history; fall back to the raw params only for
        # fresh runs (or checkpoints written before EMA was enabled). Must be
        # a REAL copy: the train step donates its state, so aliasing
        # state.params would leave the EMA pointing at deleted buffers.
        ema_params = restored_ema if restored_ema is not None else jax.tree.map(jnp.copy, state.params)
    ema_fn = jax.jit(ema_update, static_argnums=(2,)) if trainer_config.use_ema else None
    try:
        for step in range(start_step, trainer_config.max_steps):
            if accum == 1:
                batch = next(batches)
            else:
                # Stack micro-batches on a leading axis; grads are averaged
                # inside the jitted step and the optimizer applied once.
                micro = [next(batches) for _ in range(accum)]
                batch = jax.tree.map(lambda *xs: jnp.stack(xs), *micro)
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batch, sub)
            loss_acc = float(metrics["loss"])
            if ema_fn is not None:
                ema_params = ema_fn(ema_params, state.params, trainer_config.ema_decay)
            running += loss_acc

            if (step + 1) % trainer_config.log_steps == 0:
                dt = time.time() - t0
                mean_loss = running / trainer_config.log_steps
                logger.info(
                    f"step {step + 1} loss {mean_loss:.4f} "
                    f"({dt / trainer_config.log_steps:.2f}s/step)"
                )
                # Reference logs train_loss + lr to its trackers
                # (train_evoworld.py:732-735).
                tracker.log(step + 1, {
                    "train_loss": mean_loss,
                    "lr": float(lr_schedule(step + 1)),
                    "grad_norm": float(metrics["grad_norm"]),
                    "sec_per_step": dt / trainer_config.log_steps,
                })
                running, t0 = 0.0, time.time()

            if (step + 1) % trainer_config.checkpointing_steps == 0:
                ckpt.save(step + 1, state, ema_params=ema_params)
                logger.info(f"checkpoint saved at step {step + 1}")

            if validation_fn is not None and (step + 1) % trainer_config.validation_steps == 0:
                validation_fn(
                    dataclasses.replace(state, params=ema_params) if ema_params is not None else state,
                    step + 1,
                )
    finally:
        close = getattr(batches, "close", None)
        if close is not None:
            close()

    if int(state.step) > start_step:
        ckpt.save(int(state.step), state, ema_params=ema_params)
        logger.info(f"final checkpoint saved at step {int(state.step)}")
    if ema_params is not None:
        return dataclasses.replace(state, params=ema_params)
    return state
