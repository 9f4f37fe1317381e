"""Point-cloud export for visualization / debugging.

Equivalent of the reference's scene export path (`predictions_to_glb`,
/root/reference/evoworld/reprojection/reproject_vggt_open3d_utils.py:713 and
the PLY/OBJ writers in utils/geometry.py:321-358) without the trimesh/Open3D
dependency: plain binary-less ASCII PLY / OBJ writers.
"""

from __future__ import annotations

import numpy as np


def save_ply(points: np.ndarray, colors: np.ndarray, path: str) -> None:
    """(N, 3) points + (N, 3) colors in [0, 1] -> ASCII PLY."""
    points = np.asarray(points, np.float32).reshape(-1, 3)
    colors = np.clip(np.asarray(colors).reshape(-1, 3), 0, 1)
    rgb = (colors * 255).astype(np.uint8)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(points)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for p, c in zip(points, rgb):
            f.write(f"{p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]}\n")


def save_obj(points: np.ndarray, colors: np.ndarray, path: str) -> None:
    """(N, 3) + (N, 3) [0,1] -> OBJ vertex-color lines."""
    points = np.asarray(points, np.float32).reshape(-1, 3)
    colors = np.clip(np.asarray(colors).reshape(-1, 3), 0, 1)
    with open(path, "w") as f:
        for p, c in zip(points, colors):
            f.write(f"v {p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]}\n")
