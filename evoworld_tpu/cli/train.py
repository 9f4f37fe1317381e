"""EDM fine-tuning entry point.

Equivalent of `train.sh` -> `train_evoworld.py` (reference trainer, SURVEY.md
§3.3): loads the SVD checkpoint (conv_in surgery applied at conversion),
freezes everything except temporal transformer blocks / conv_in / conv_out /
norms, and runs the sharded EDM objective over the episode dataset with
Orbax checkpointing and resume-latest.

Usage:
  python -m evoworld_tpu.cli.train --data.root=<dataset_root> \
      --data.single_episode=false --train.total_steps=30000 \
      [--runtime.svd_checkpoint=...] [--runtime.mesh_model=1]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from evoworld_tpu.cli.common import logger, parse_config
from evoworld_tpu.data.dataset import EpisodeDataset
from evoworld_tpu.parallel.mesh import make_mesh
from evoworld_tpu.runtime import build_pipeline, _dtype
from evoworld_tpu.train.trainer import train


def main(argv=None):
    config = parse_config(argv)
    data, rt = config.data, config.runtime

    # Loop-level knobs (--trainer.*: gradient_accumulation_steps,
    # per_device_batch_size, checkpointing/validation cadence, EMA — the
    # reference's accelerate-level flags, arg_parser.py) come from the config
    # tree; output dir and step budget are DERIVED from their canonical knobs,
    # so reject overrides that would otherwise be silently clobbered.
    import dataclasses

    from evoworld_tpu.train.trainer import TrainerConfig

    _defaults = TrainerConfig()
    if config.trainer.output_dir != _defaults.output_dir:
        raise SystemExit("--trainer.output_dir is derived here; use --runtime.save_dir")
    if config.trainer.max_steps != _defaults.max_steps:
        raise SystemExit("--trainer.max_steps is derived here; use --train.total_steps")
    trainer_config = dataclasses.replace(
        config.trainer,
        output_dir=rt.save_dir,
        max_steps=config.train.total_steps,
    )

    dataset = EpisodeDataset(
        data.root,
        height=config.pipeline.height,
        width=config.pipeline.width,
        sequence_length=data.sequence_length,
        sampling=data.sampling,
        reprojection_name=data.reprojection_name,
        memory_path=data.memory_path,
        pos_scale=data.pos_scale,
        single_episode=data.single_episode,
    )
    logger.info(f"dataset: {len(dataset)} episodes")

    pipeline = build_pipeline(config)
    frozen = {"vae": pipeline.params["vae"], "clip": pipeline.params["clip"]}

    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1:
        model_axis = rt.mesh_model
        mesh = make_mesh(model=model_axis)
        logger.info(f"mesh: {dict(mesh.shape)}")

    # Validation: render a clip on the first episode and save a GT|generated
    # side-by-side GIF (reference train_evoworld.py:771-875). The tracker is
    # created ONCE — per-call construction would reset its wall-clock origin.
    from evoworld_tpu.utils.trackers import JSONLTracker

    val_tracker = JSONLTracker(rt.save_dir, run_name="validation")

    def validation_fn(state, step):
        import numpy as np

        from evoworld_tpu.loop.navigator import Navigator
        from evoworld_tpu.utils.video import export_gif, side_by_side

        pipeline.params = {**pipeline.params, "unet": state.params}
        navigator = Navigator(pipeline, num_frames=config.pipeline.num_frames)
        sample = dataset[0]
        frames = navigator.generate_segment(
            sample.cam_traj,
            jnp.asarray(sample.pixel_values[0]),
            jnp.asarray(sample.memory_values[: config.pipeline.num_frames]),
            jax.random.key(rt.seed),
            use_memory=True,
        )
        gt = np.clip(sample.pixel_values[: frames.shape[0]] / 2 + 0.5, 0, 1)
        import os

        out = os.path.join(rt.save_dir, f"validation_{step:06d}.gif")
        export_gif(side_by_side(gt, np.asarray(frames)), out)
        logger.info(f"validation gif: {out}")
        # Score the rollout against GT and stream to the tracker sink
        # (reference logs validation media to wandb/tb, :771-875).
        from evoworld_tpu.eval.metrics import batch_video_metrics

        scores = batch_video_metrics(np.asarray(frames)[None], gt[None])
        val_tracker.log(step, {"val_psnr": scores["psnr"], "val_ssim": scores["ssim"]})
        val_tracker.log_artifact(step, "validation_gif", out)

    state = train(
        pipeline.unet,
        pipeline.vae,
        pipeline.clip_tower,
        pipeline.params["unet"],
        frozen,
        dataset,
        config.train,
        trainer_config,
        mesh=mesh,
        batch_size=trainer_config.per_device_batch_size
        * max(1, mesh.shape["data"] if mesh is not None else 1),
        compute_dtype=_dtype(rt.compute_dtype),
        validation_fn=validation_fn,
    )
    logger.info(f"training done at step {int(state.step)}")


if __name__ == "__main__":
    main()
