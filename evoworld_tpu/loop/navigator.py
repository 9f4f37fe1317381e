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
from typing import List, Optional

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
