"""Single-clip generation on one episode using pre-rendered memory panoramas.

Equivalent of `run_single_segment.sh` -> `run_single_segment()`
(/root/reference/unified_loop_consistency.py:513-540 ->
forward_evoworld.process_batch): loads the episode (memory sampling
"reprojection" = shipped rendered panoramas), builds the relative-pose
Pluecker embedding, runs one 25-frame clip, writes predictions/ and
predictions_gt/.

Usage:
  python -m evoworld_tpu.cli.run_single_segment \
      --data.root=/root/reference/example/case_000 \
      --runtime.save_dir=outputs/single_segment \
      [--pipeline.num_steps=25] [--runtime.svd_checkpoint=...]
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from evoworld_tpu.cli.common import frames_from_minus1_1, logger, parse_config, save_frames
from evoworld_tpu.data.dataset import EpisodeDataset
from evoworld_tpu.loop.navigator import Navigator
from evoworld_tpu.runtime import build_pipeline


def main(argv=None):
    config = parse_config(argv)
    data, rt = config.data, config.runtime

    dataset = EpisodeDataset(
        data.root,
        height=config.pipeline.height,
        width=config.pipeline.width,
        sequence_length=data.sequence_length,
        sampling="reprojection",
        reprojection_name=data.reprojection_name,
        memory_path=data.memory_path,
        pos_scale=data.pos_scale,
        single_episode=data.single_episode,
    )
    pipeline = build_pipeline(config)
    navigator = Navigator(pipeline, num_frames=config.pipeline.num_frames)

    for idx in range(len(dataset)):
        sample = dataset[idx]
        name = os.path.basename(sample.episode_path.rstrip("/")) or "episode"
        logger.info(f"Generating {name} ({sample.pixel_values.shape[0]} GT frames)")

        rng = jax.random.key(rt.seed + idx)
        frames = navigator.generate_segment(
            sample.cam_traj,
            jnp.asarray(sample.pixel_values[0]),
            jnp.asarray(sample.memory_values[: config.pipeline.num_frames]),
            rng,
            use_memory=True,
        )

        out_dir = os.path.join(rt.save_dir, name)
        save_frames(frames, os.path.join(out_dir, "predictions"))
        save_frames(
            frames_from_minus1_1(sample.pixel_values), os.path.join(out_dir, "predictions_gt")
        )
        logger.info(f"Saved to {out_dir}")


if __name__ == "__main__":
    main()
