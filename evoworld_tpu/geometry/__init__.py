"""Pure-JAX camera and spherical geometry (layer L0).

All functions are jit-friendly (static shapes, no Python branching on traced
values) and CPU-testable. Conventions follow the reference system:
OpenCV RDF camera frame (X right, Y down, Z forward), equirectangular
panoramas with +Z at the image center, Euler rotations composed R = Rz@Ry@Rx
in degrees, Unity->OpenCV axis conversion via sign flips.
"""

from evoworld_tpu.geometry.rays import equirect_ray_grid, pinhole_ray_grid
from evoworld_tpu.geometry.plucker import plucker_embedding
from evoworld_tpu.geometry.pose import (
    UNITY_TO_OPENCV,
    euler_deg_to_rotmat,
    pose_to_matrix,
    unity_to_opencv,
)
from evoworld_tpu.geometry.resample import (
    bilinear_sample_pano,
    equi_to_pers,
    rotate_pano_yaw,
    pano_to_cubemap,
    cubemap_to_pano,
)
from evoworld_tpu.geometry.alignment import similarity_from_point_pairs

__all__ = [
    "equirect_ray_grid",
    "pinhole_ray_grid",
    "plucker_embedding",
    "UNITY_TO_OPENCV",
    "euler_deg_to_rotmat",
    "pose_to_matrix",
    "unity_to_opencv",
    "bilinear_sample_pano",
    "equi_to_pers",
    "rotate_pano_yaw",
    "pano_to_cubemap",
    "cubemap_to_pano",
    "similarity_from_point_pairs",
]
