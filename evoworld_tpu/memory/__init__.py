from evoworld_tpu.memory.pointcloud import confidence_mask, scene_scale
from evoworld_tpu.memory.render import align_target_poses, render_memory_panoramas

__all__ = [
    "confidence_mask",
    "scene_scale",
    "align_target_poses",
    "render_memory_panoramas",
]
