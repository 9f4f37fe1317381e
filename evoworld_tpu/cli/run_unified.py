"""3-segment evolving-memory generation (the main entry point).

Equivalent of `run_unified_pipeline.sh` / `inference_unity_curve.sh`
(/root/reference/unified_loop_consistency.py:495-511 + process_episode):
per episode, generate num_segments clips; after each, reconstruct (VGGT),
align, splat-render the next segment's memory conditioning. Episode range
sharding via --data.start_idx/--data.end_idx replaces the reference's
per-GPU shell loop (inference_unity_curve_multi_gpu.sh).

Usage:
  python -m evoworld_tpu.cli.run_unified --data.root=<dataset or episode> \
      --runtime.save_dir=outputs/unified [--loop.num_segments=3]
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from evoworld_tpu.cli.common import (
    AsyncFrameWriter,
    frames_from_minus1_1,
    logger,
    parse_config,
)
from evoworld_tpu.data.dataset import EpisodeDataset, load_camera_poses
from evoworld_tpu.loop.navigator import Navigator, calculate_segment_indices
from evoworld_tpu.loop.unified import UnifiedLoop
from evoworld_tpu.runtime import _inference_mesh, build_pipeline, build_reconstructor


def main(argv=None):
    config = parse_config(argv)
    data, rt = config.data, config.runtime

    dataset = EpisodeDataset(
        data.root,
        height=config.pipeline.height,
        width=config.pipeline.width,
        sampling="empty_with_traj",
        pos_scale=data.pos_scale,
        single_episode=data.single_episode,
        load_complete_episode=True,
    )
    pipeline = build_pipeline(config)
    navigator = Navigator(pipeline, num_frames=config.pipeline.num_frames)
    reconstructor = build_reconstructor(config) if config.loop.num_segments > 1 else None
    loop = UnifiedLoop(navigator, reconstructor, config.loop,
                       mesh=_inference_mesh(config.runtime))

    from evoworld_tpu.utils.profiling import phase_timer

    end = data.end_idx if data.end_idx >= 0 else len(dataset)
    for idx in range(data.start_idx, min(end, len(dataset))):
        # host_decode: PNG decode + resize of the episode's frames (the
        # native threaded loader when built — data/native_io.py); sync=False:
        # pure host work, a device barrier would misattribute queued compute.
        with phase_timer("host_decode", sync=False):
            sample = dataset[idx]
        name = os.path.basename(sample.episode_path.rstrip("/")) or "episode"
        logger.info(f"Episode {name}")
        camera_params = load_camera_poses(os.path.join(sample.episode_path, "camera_poses.txt"))

        ep_dir = os.path.join(rt.save_dir, name)

        # Stream each segment to disk as it finishes (the reference writes
        # PNGs per segment too, unified_loop_consistency.py:430-440) — deep
        # episodes then hold only the reconstruction window in HBM instead of
        # every decoded frame + memory stack (a 5-segment 1024x576 episode is
        # ~850 MB of frames + ~170 MB/segment of renders in fp32). Encoding
        # happens on a background thread (AsyncFrameWriter) so the ~100
        # ms/frame PNG encode overlaps the next segment's device compute;
        # host_save now times only the u8 conversion + enqueue, and the
        # writer's own busy seconds are reported at episode end.
        def save_segment(seg_id, frames, writer):
            with phase_timer("host_save", sync=False):
                start = seg_id * (config.pipeline.num_frames - 1)
                writer.submit(frames, os.path.join(ep_dir, f"predictions_{seg_id}"), start)
                s, e, _ = calculate_segment_indices(seg_id, config.loop.num_target_view)
                gt = sample.pixel_values[s - 1 : e - 1] if seg_id else sample.pixel_values[0:e]
                writer.submit(
                    frames_from_minus1_1(gt[1:] if seg_id else gt),
                    os.path.join(ep_dir, f"predictions_gt_{seg_id}"), start,
                )

        def save_memory(seg_id, mem, writer):
            with phase_timer("host_save", sync=False):
                writer.submit(mem, os.path.join(ep_dir, f"rendered_panorama_{seg_id}"),
                              0, "{:02d}.png")

        with AsyncFrameWriter() as writer:
            loop.run_episode(
                jnp.asarray(sample.pixel_values[0]),
                sample.cam_traj,
                camera_params,
                jax.random.key(rt.seed + idx),
                on_segment=lambda seg_id, frames: save_segment(seg_id, frames, writer),
                on_memory=lambda seg_id, mem: save_memory(seg_id, mem, writer),
            )
        from evoworld_tpu.utils.profiling import phase_add

        # Overlapped with device compute — reported separately from the
        # inline host_save (u8 convert + enqueue) so E2E artifacts show
        # both the true encode cost and that it left the critical path.
        phase_add("host_encode_overlapped", writer.busy_s)
        logger.info(
            f"Saved episode to {ep_dir} "
            f"(writer encoded {writer.busy_s:.1f} s in the background)"
        )


if __name__ == "__main__":
    main()
