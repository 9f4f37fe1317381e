"""Unified evolving-memory loop: generate -> reconstruct -> re-condition.

Functional equivalent of `UnifiedLoopConsistencyPipeline.process_episode`
(/root/reference/unified_loop_consistency.py:398-492):

  for segment_id in range(num_segments):
    1. generate a 25-frame pano clip (segment 0: zero memory + mask_mem);
    2. drop the duplicated first frame for segments > 0 (:427-428);
    3. if not last segment:
       a. extract look-at-center perspective views of ALL generated frames
          (yaw toward pose (segment_id+1)*24+24, :299-334);
       b. run the feed-forward reconstructor (VGGT) on them;
       c. update pose yaws with the computed look-at yaws (:455-459);
       d. align GT cameras to the reconstruction (first/last-point
          similarity) and splat-render the next 24 target views;
       e. memory for the next segment = [last generated frame context] +
          rendered panoramas (pipeline prepends the start frame itself).

Unlike the reference there are NO file-mediated handoffs: frames,
perspective crops, point clouds, and rendered memories stay device arrays
across the whole loop (the reference writes PNGs between every stage,
SURVEY.md §3.1).

The reconstructor is injected: any callable
  images (S, Hp, Wp, 3) in [0,1] -> dict(world_points (S, h, w, 3),
  conf (S, h, w), extrinsic (S, 3, 4) w2c, colors optional)
works — the real VGGT lives in evoworld_tpu.models.vggt.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from evoworld_tpu.geometry.pose import pose_to_matrix
from evoworld_tpu.geometry.resample import equi_to_pers
from evoworld_tpu.loop.navigator import Navigator, calculate_segment_indices
from evoworld_tpu.memory.pointcloud import confidence_mask
from evoworld_tpu.memory.render import align_target_poses, render_memory_panoramas


@dataclasses.dataclass(frozen=True)
class LoopConfig:
    num_segments: int = 3
    num_frames: int = 25
    num_target_view: int = 24
    pers_height: int = 384
    pers_width: int = 512
    pers_fov_x: float = 90.0
    conf_percentile: float = 50.0
    pos_scale: float = 0.1
    # Bound the reconstruction window to the most recent N generated frames
    # (0 = reference parity: VGGT re-runs on ALL accumulated frames every
    # segment, unified_loop_consistency.py:336-368 — quadratic-ish cost in
    # segments since VGGT's global attention is O(frames^2)). A bounded
    # window keeps per-segment reconstruct cost flat; alignment and yaw
    # bookkeeping shift with the window automatically.
    max_recon_frames: int = 0
    # Drop frames older than the recon window from the device as the episode
    # advances (pure memory optimization — bit-identical to keep-everything-
    # and-slice; tests flip this off to assert exactly that). Only takes
    # effect when max_recon_frames bounds the window.
    trim_residency: bool = True


class UnifiedLoop:
    """Episode-level orchestration of the evolving 3D memory."""

    def __init__(
        self,
        navigator: Navigator,
        reconstructor: Optional[Callable] = None,
        config: LoopConfig = LoopConfig(),
        mesh=None,
    ):
        self.navigator = navigator
        self.reconstructor = reconstructor
        self.config = config
        # Multi-chip: the 24 memory renders shard over the mesh (the splat's
        # z-buffer views are independent — memory/render.py). None on one
        # device.
        self.mesh = mesh
        # Jitted device paths: eager dispatch is pathological over the dev
        # tunnel (each op is a network round-trip — the eager splat measured
        # ~15 s/segment at TINY scale). jit caches per (shape, static) so the
        # growing all_frames axis and the two segment_ids each compile once.
        self._extract_jit = jax.jit(self._extract_impl)
        self._render_jit = jax.jit(
            self._render_impl,
            static_argnames=("segment_id", "height", "width", "recon_start"),
        )

    def _extract_impl(self, frames: jnp.ndarray, yaws: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config

        def one(args):
            frame, yaw = args
            return equi_to_pers(
                frame, yaw=yaw, out_height=cfg.pers_height,
                out_width=cfg.pers_width, fov_x_deg=cfg.pers_fov_x,
            )

        return jax.lax.map(one, (frames, yaws))

    def _render_impl(
        self, world_points, conf, extrinsic, colors, temp_cam,
        segment_id: int, height: int, width: int, recon_start: int = 0,
    ) -> jnp.ndarray:
        cfg = self.config
        gt_c2w = pose_to_matrix(temp_cam, relative=True)
        target_c2w = align_target_poses(
            gt_c2w, extrinsic, segment_id, cfg.num_target_view, recon_start=recon_start
        )
        points = world_points.reshape(-1, 3)
        valid = confidence_mask(conf, cfg.conf_percentile).reshape(-1)
        return render_memory_panoramas(
            points, colors.reshape(-1, 3), valid, target_c2w, height, width,
            mesh=self.mesh,
        )

    # -- reference convert_pano_to_pers (:299-334) ---------------------
    def panos_to_perspectives(
        self, frames: jnp.ndarray, camera_params: np.ndarray, segment_id: int,
        frame_offset: int = 0,
    ):
        """Extract look-at-center perspective views of generated panoramas.

        Args:
            frames: (N, H, W, 3) generated panoramas in [0, 1].
            camera_params: (M, 6) UNSCALED OpenCV-RDF pose rows.
            frame_offset: global index of frames[0] (nonzero when a bounded
                reconstruction window drops the oldest frames).

        Returns:
            (pers (N, Hp, Wp, 3), target_yaws_deg (N,)) — the yaw assigned to
            each frame's virtual perspective camera.
        """
        cfg = self.config
        look_at_idx = (segment_id + 1) * cfg.num_target_view + cfg.num_target_view
        n = frames.shape[0]
        yaws = []
        for i in range(n):
            idx = frame_offset + i  # pose row of frames[i] (0-based)
            if idx < len(camera_params):
                cur = camera_params[idx]
                look = camera_params[min(look_at_idx, len(camera_params) - 1)]
                target_yaw = math.atan2(look[0] - cur[0], look[2] - cur[2])
                yaw_diff = math.radians(cur[4]) - target_yaw
            else:
                yaw_diff = 0.0
            yaws.append(yaw_diff)
        yaws = np.asarray(yaws, np.float32)

        pers = self._extract_jit(frames, jnp.asarray(yaws))
        return pers, np.degrees(yaws)

    # -- memory rebuild (:442-489) -------------------------------------
    def rebuild_memory(
        self,
        all_frames: jnp.ndarray,
        camera_params: np.ndarray,
        segment_id: int,
        frames_dropped: int = 0,
    ) -> jnp.ndarray:
        """Run reconstruction on generated frames and render next-segment
        memory panoramas. Returns (num_target_view, H, W, 3) in [0, 1].

        `frames_dropped`: global index of all_frames[0] — nonzero when the
        caller already trimmed frames older than the reconstruction window
        off the device (run_episode's residency bound); pose-row bookkeeping
        and the alignment fit are in GLOBAL frame indices.
        """
        from evoworld_tpu.utils.profiling import force_sync, phase_timer
        from evoworld_tpu.utils.logging import get_logger

        logger = get_logger()
        assert self.reconstructor is not None, "no reconstructor injected"
        cfg = self.config
        _, end_idx, _ = calculate_segment_indices(segment_id, cfg.num_target_view)

        # Bounded reconstruction window (max_recon_frames=0 -> all frames,
        # reference parity). The window is anchored at the newest frame; the
        # frame offset shifts the pose-row bookkeeping and the alignment's
        # first/last-center fit consistently.
        n_total = all_frames.shape[0]
        window = n_total if not cfg.max_recon_frames else min(n_total, cfg.max_recon_frames)
        offset = frames_dropped + (n_total - window)
        recon_frames = all_frames[n_total - window:] if n_total > window else all_frames

        with phase_timer(f"pers_extract_s{segment_id}", logger=logger):
            pers, target_yaws = self.panos_to_perspectives(
                recon_frames, camera_params, segment_id, frame_offset=offset
            )
            force_sync(pers)
        with phase_timer(f"reconstruct_s{segment_id}", logger=logger):
            preds = self.reconstructor(pers)
            force_sync(preds)

        # Update yaw column with the look-at yaws (reference :455-459).
        temp_cam = camera_params.copy()
        s = max(0, end_idx - len(target_yaws))
        temp_cam[s:end_idx, 4] = target_yaws[: end_idx - s]

        conf = preds["conf"]
        colors = preds.get("colors")
        if colors is None:
            colors = pers[:, : conf.shape[1], : conf.shape[2], :]

        height, width = all_frames.shape[1], all_frames.shape[2]
        with phase_timer(f"splat_render_s{segment_id}", logger=logger):
            out = self._render_jit(
                preds["world_points"], conf, preds["extrinsic"], colors,
                jnp.asarray(temp_cam, jnp.float32),
                segment_id=segment_id, height=height, width=width,
                recon_start=offset,
            )
            force_sync(out)
        return out

    # -- reference process_episode (:398-492) --------------------------
    def run_episode(
        self,
        start_image: jnp.ndarray,
        scaled_traj: np.ndarray,
        camera_params: np.ndarray,
        rng: jax.Array,
        on_segment: Optional[Callable] = None,
        on_memory: Optional[Callable] = None,
    ) -> Dict[str, List[jnp.ndarray]]:
        """Generate `num_segments` clips with evolving 3D memory.

        Args:
            start_image: (H, W, 3) first GT frame in [-1, 1].
            scaled_traj: (M, 6) pose rows with pos_scale applied (pipeline
                conditioning path).
            camera_params: (M, 6) UNSCALED pose rows (reconstruction path).
            rng: PRNG key.
            on_segment: optional `(segment_id, frames) -> None` sink. When
                given, each segment's frames stream to it as they finish and
                are NOT accumulated in the return value — deep episodes then
                hold only the reconstruction window on device instead of
                every decoded frame (a 5-segment 1024x576 episode's frames
                alone are ~850 MB fp32; the reference writes each segment to
                PNG as it goes, unified_loop_consistency.py:430-440).
                Rendered memory stacks follow the same rule: in streaming
                mode they go to `on_memory` (or are dropped if it is None)
                instead of accumulating ~170 MB/segment in the return value —
                only the newest render is ever read again internally.
            on_memory: optional `(segment_id, rendered) -> None` sink for the
                per-segment memory panorama stacks (streaming mode only).

        Returns:
            dict with "segments": list of (F or F-1, H, W, 3) frame arrays in
            [0, 1] and "memories": list of rendered memory stacks (both empty
            when on_segment is given — streaming mode).
        """
        cfg = self.config
        all_frames: Optional[jnp.ndarray] = None
        frames_dropped = 0  # global index of all_frames[0] (window trimming)
        memories_out = []
        segments_out = []
        memory_frames = jnp.zeros(
            (cfg.num_frames, start_image.shape[0], start_image.shape[1], 3), jnp.float32
        )
        current = start_image

        for segment_id in range(cfg.num_segments):
            start_idx, end_idx, _ = calculate_segment_indices(segment_id, cfg.num_target_view)
            # Pose rows are 1-based for segment_id > 0; segment 0's start_idx
            # is already 0-based (reference pano_to_pers_utils.py:5-14), so
            # its slice keeps all num_frames poses.
            segment = (
                scaled_traj[start_idx - 1 : end_idx - 1]
                if segment_id
                else scaled_traj[0:end_idx]
            )
            rng, sub = jax.random.split(rng)
            from evoworld_tpu.utils.logging import get_logger
            from evoworld_tpu.utils.profiling import force_sync, phase_timer

            with phase_timer(f"generate_s{segment_id}", logger=get_logger()):
                frames = self.navigator.generate_segment(
                    segment, current, memory_frames, sub, use_memory=segment_id > 0
                )
                force_sync(frames)
            new_frames = frames[1:] if segment_id > 0 else frames
            if on_segment is not None:
                on_segment(segment_id, new_frames)
            else:
                segments_out.append(new_frames)
            all_frames = new_frames if all_frames is None else jnp.concatenate([all_frames, new_frames], 0)
            # Bound device residency: frames older than the reconstruction
            # window are never read again — drop them so deep episodes don't
            # accumulate the whole history in HBM (observed RESOURCE_EXHAUSTED
            # at segments=5 on a 16 GB chip). Pure memory optimization:
            # rebuild_memory would slice the same window out anyway.
            if (cfg.trim_residency and cfg.max_recon_frames
                    and all_frames.shape[0] > cfg.max_recon_frames):
                drop = all_frames.shape[0] - cfg.max_recon_frames
                frames_dropped += drop
                all_frames = all_frames[drop:]
            current = frames[-1] * 2.0 - 1.0  # carry into next segment, [-1, 1]

            if segment_id < cfg.num_segments - 1 and self.reconstructor is not None:
                rendered = self.rebuild_memory(all_frames, camera_params, segment_id,
                                               frames_dropped=frames_dropped)
                # Reconstruction/splat run single-device while the pipeline's
                # arrays may be replicated over a mesh; re-place the renders
                # into the pipeline's domain before they join its inputs.
                if hasattr(current, "sharding"):
                    rendered = jax.device_put(rendered, current.sharding)
                if on_segment is not None:
                    if on_memory is not None:
                        on_memory(segment_id, rendered)
                else:
                    memories_out.append(rendered)
                # Next-segment memory: 25 frames = context frame + 24 renders
                # in [-1, 1] (dataset transform convention, reference :422).
                memory_frames = jnp.concatenate(
                    [current[None], rendered * 2.0 - 1.0], axis=0
                )

        return {"segments": segments_out, "memories": memories_out}
