"""Navigator: path segmentation and per-segment clip generation.

Functional equivalent of the reference `Navigator`
(/root/reference/evoworld/inference/navigator_evoworld.py:48-512): splits a
pose path into 25-frame segments (stride 24), builds relative-pose Pluecker
embeddings per segment, invokes the diffusion pipeline, and carries the last
generated frame into the next segment. Pano yaw-rotation between segments
(straight-path mode) uses `geometry.rotate_pano_yaw`.

Everything stays as device arrays — the reference's PIL round-trips
(tensor -> PIL -> transform) are gone.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from evoworld_tpu.diffusion.pipeline import PanoDiffusionPipeline
from evoworld_tpu.geometry.plucker import plucker_embedding
from evoworld_tpu.geometry.pose import pose_to_matrix
from evoworld_tpu.geometry.rays import equirect_ray_grid


def split_curve_into_segments(path: np.ndarray, segment_len: int = 25) -> List[np.ndarray]:
    """25-frame windows with 1-frame overlap (reference
    `split_curve_into_segments`, navigator_evoworld.py:303-318)."""
    n = len(path)
    if n < segment_len:
        return [path]
    segments = []
    start, end = 0, segment_len
    while end <= n:
        segments.append(path[start:end])
        start = end - 1
        end = start + segment_len
    if end - start > 1 and start < n:
        segments.append(path[start:])
    return segments


def split_path_into_segments(path: np.ndarray, atol: float = 1e-2) -> List[np.ndarray]:
    """Split a pose path at rotation changes (straight-path mode, reference
    `split_path_into_segments`, navigator_evoworld.py:276-301): consecutive
    poses with equal rotation belong to one segment; at a rotation change the
    previous position is re-emitted with the new rotation as the new
    segment's first pose."""
    segments: List[np.ndarray] = []
    current: List[np.ndarray] = []
    last = path[0].copy()
    for step in path:
        if np.allclose(step[3:6], last[3:6], atol=atol):
            current.append(step.copy())
            last = step.copy()
            continue
        segments.append(np.stack(current))
        bridge = last.copy()
        bridge[3:6] = step[3:6]
        current = [bridge, step.copy()]
        last = step.copy()
    if current:
        segments.append(np.stack(current))
    return segments


def calculate_segment_indices(segment_id: int, num_target_view: int = 24):
    """(start, end, look_at) frame indices for a segment (reference
    pano_to_pers_utils.py:5-14; 1-based pose-row indexing)."""
    look_at_idx = (segment_id + 1) * num_target_view + num_target_view
    start_idx = segment_id * num_target_view + 1
    if segment_id == 0:
        start_idx -= 1
    end_idx = start_idx + num_target_view + 1
    return start_idx, end_idx, look_at_idx


def extend_segment(segment: np.ndarray, target_len: int, step_size: float = 0.4, pos_scale: float = 0.1) -> np.ndarray:
    """Extrapolate a short tail segment to `target_len` poses keeping the last
    step delta (reference `extend_segment`, navigator_evoworld.py:132-171)."""
    seg = np.asarray(segment, np.float32)
    if len(seg) >= target_len:
        return seg
    if len(seg) == 1:
        roty = np.deg2rad(seg[0, 4])
        delta = np.array(
            [step_size * np.sin(roty) * pos_scale, 0, step_size * np.cos(roty) * pos_scale, 0, 0, 0],
            np.float32,
        )
    else:
        delta = seg[-1] - seg[-2]
    extra = seg[-1] + delta * np.arange(1, target_len - len(seg) + 1)[:, None]
    return np.concatenate([seg, extra.astype(np.float32)], axis=0)


@dataclasses.dataclass
class Navigator:
    """Drives the pipeline along a segmented pose path."""

    pipeline: PanoDiffusionPipeline
    num_frames: int = 25

    def __post_init__(self):
        cfg = self.pipeline.config
        self.rays = equirect_ray_grid(cfg.height // 8, cfg.width // 8)

    def plucker_for_segment(self, segment: np.ndarray) -> jnp.ndarray:
        """(F, 6) poses -> (F, 6, h, w) Pluecker embedding, relative-to-first
        (reference move_forward, navigator_evoworld.py:194-196)."""
        c2w = pose_to_matrix(jnp.asarray(segment, jnp.float32), relative=True)
        return plucker_embedding(self.rays, c2w)

    def generate_segment(
        self,
        segment: np.ndarray,
        start_image: jnp.ndarray,
        memory_frames: jnp.ndarray,
        rng: jax.Array,
        use_memory: bool,
    ) -> jnp.ndarray:
        """Generate one 25-frame clip.

        Args:
            segment: (F, 6) pose rows (positions already pos-scaled).
            start_image: (H, W, 3) in [-1, 1].
            memory_frames: (F, H, W, 3) in [-1, 1] (zeros when no memory).
            use_memory: False -> mask memory conditioning (segment 0,
                reference navigator :420-423).

        Returns:
            (F, H, W, 3) frames in [0, 1].
        """
        if len(segment) < self.num_frames:
            segment = extend_segment(segment, self.num_frames)
        plucker = self.plucker_for_segment(segment[: self.num_frames])
        return self.pipeline(
            start_image, plucker, memory_frames, rng, mask_mem=not use_memory
        )

    def navigate_path(
        self,
        path: np.ndarray,
        start_image: jnp.ndarray,
        memory_frames: jnp.ndarray,
        rng: jax.Array,
        curve: bool = True,
    ) -> List[jnp.ndarray]:
        """Drive the whole path, segment by segment.

        Straight-path mode (curve=False) rotates the carried panorama by the
        yaw delta between segments before generating (reference
        `navigate_path`, navigator_evoworld.py:335-392); curve mode uses
        fixed 25-frame windows. Segment 0 runs memory-masked, later segments
        conditioned on `memory_frames` (reference :361-364).

        Returns a list of per-segment (F, H, W, 3) frame stacks in [0, 1].
        """
        from evoworld_tpu.geometry.resample import rotate_pano_yaw

        segments = (
            split_curve_into_segments(path, self.num_frames)
            if curve
            else split_path_into_segments(path)
        )
        current = start_image
        current_angle = float(segments[0][0][4])
        generations: List[jnp.ndarray] = []
        for seg_id, segment in enumerate(segments):
            if not curve:
                rotation = float(segment[0][4]) - current_angle
                current_angle = float(segment[-1][4])
                if rotation != 0.0:
                    current = rotate_pano_yaw(current, rotation)
            rng, sub = jax.random.split(rng)
            frames = self.generate_segment(
                np.asarray(segment), current, memory_frames, sub, use_memory=seg_id > 0
            )
            generations.append(frames)
            current = frames[-1] * 2.0 - 1.0
        return generations
