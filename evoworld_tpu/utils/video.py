"""Video export helpers: GIF and MP4 from frame stacks.

Equivalent of the reference's trainer export utilities
(/root/reference/evoworld/trainer/trainer_utils.py:182-218) and the
Navigator's save_video/save_gif (navigator_evoworld.py:233-274).
"""

from __future__ import annotations

import numpy as np


def _to_uint8(frames: np.ndarray) -> np.ndarray:
    arr = np.asarray(frames)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
    return arr


def export_gif(frames: np.ndarray, path: str, fps: int = 10) -> None:
    """(N, H, W, 3) [0,1] floats or uint8 -> animated GIF."""
    from PIL import Image

    arr = _to_uint8(frames)
    imgs = [Image.fromarray(f) for f in arr]
    imgs[0].save(
        path, save_all=True, append_images=imgs[1:],
        duration=int(1000 / fps), loop=0,
    )


def export_mp4(frames: np.ndarray, path: str, fps: int = 10) -> None:
    """(N, H, W, 3) -> MP4 via imageio (falls back to GIF if unavailable)."""
    try:
        import imageio

        writer = imageio.get_writer(path, fps=fps)
        for f in _to_uint8(frames):
            writer.append_data(f)
        writer.close()
    except Exception:
        export_gif(frames, path.rsplit(".", 1)[0] + ".gif", fps)


def side_by_side(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Horizontally concatenate two frame stacks (validation side-by-sides,
    reference train_evoworld.py:771-875)."""
    return np.concatenate([np.asarray(a), np.asarray(b)], axis=2)
