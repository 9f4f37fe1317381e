from evoworld_tpu.models.vggt.model import VGGT, VGGTConfig, load_and_preprocess_images
from evoworld_tpu.models.vggt.geometry import (
    pose_encoding_to_extri_intri,
    unproject_depth_map_to_point_map,
    quat_to_rotmat,
)

__all__ = [
    "VGGT",
    "VGGTConfig",
    "load_and_preprocess_images",
    "pose_encoding_to_extri_intri",
    "unproject_depth_map_to_point_map",
    "quat_to_rotmat",
]
