"""Shared CLI plumbing: config parsing, frame IO, seeding."""

from __future__ import annotations

import os
import queue
import sys
import threading
import time

import numpy as np

from evoworld_tpu.config import EvoWorldConfig, apply_overrides, describe
from evoworld_tpu.utils.compile_cache import enable_persistent_cache
from evoworld_tpu.utils.logging import get_logger

enable_persistent_cache()

logger = get_logger()


def parse_config(argv=None) -> EvoWorldConfig:
    argv = sys.argv[1:] if argv is None else argv
    if "--help" in argv or "-h" in argv:
        print(__doc__ or "")
        print("Overrides: --section.field=value; sections:",
              ", ".join(EvoWorldConfig.__dataclass_fields__))
        print(describe(EvoWorldConfig()))
        raise SystemExit(0)
    return apply_overrides(EvoWorldConfig(), argv)


def save_frames(frames: np.ndarray, out_dir: str, start_index: int = 0, fmt: str = "{:03d}.png"):
    """(N, H, W, 3) [0, 1] floats -> PNG files (reference save_frames naming,
    forward_evoworld.py:159-180). Uses the C++ threaded PNG encoder when
    built (`make -C native`); PIL otherwise. uint8 input is written as-is."""
    os.makedirs(out_dir, exist_ok=True)
    arr = np.asarray(frames)
    if arr.dtype == np.uint8:
        u8 = arr
    else:
        # scale first, clip in place: one temp + 3 passes instead of 5
        buf = np.multiply(arr, 255.0, dtype=np.float32)
        np.clip(buf, 0.0, 255.0, out=buf)
        u8 = buf.astype(np.uint8)
    paths = [os.path.join(out_dir, fmt.format(start_index + i)) for i in range(len(u8))]

    from evoworld_tpu.data.native_io import save_png_batch

    if save_png_batch(paths, u8):
        return
    from PIL import Image

    for path, frame in zip(paths, u8):
        Image.fromarray(frame).save(path)


def frames_from_minus1_1(frames: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(frames) / 2.0 + 0.5, 0.0, 1.0)


class AsyncFrameWriter:
    """Background PNG writer: overlaps host encode with device compute.

    The production loop streams segments to disk as they finish; writing
    synchronously serializes ~100 ms/frame of PNG encode behind the device
    (E2E_r5.json: 140 s of host_save across a 3-segment episode). While the
    device executes, the host CPU is idle — the tunnel RPC blocks with the
    GIL released, and the native encoder (native/imageio.cpp) releases it
    too — so a single writer thread makes segment saves effectively free
    even on this 1-core host.

    `submit` only forces the frames to host and enqueues; the float->u8
    conversion ALSO runs on the worker — on this host clip+scale+cast of a
    600 MB fp32 stack costs 2-12 s (first-touch page faults dominate; the
    hot-page steady state is ~2 s), comparable to the encode itself, so it
    must not sit on the critical path either. The
    queue is bounded (default 2 pending fp32 stacks, ~1.2 GB worst case at
    the 2000x1000 pano-memory size) so a slow disk backpressures the loop
    instead of accumulating episodes in RAM. `close()` drains, joins, and
    re-raises any worker exception — callers MUST close before reading the
    outputs (eval) or exiting.
    """

    def __init__(self, max_pending: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=max_pending)
        self._err: BaseException | None = None
        self.busy_s = 0.0  # worker seconds actually spent encoding
        self._thread = threading.Thread(target=self._run, name="frame-writer", daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            job = self._q.get()
            if job is None:
                return
            t0 = time.perf_counter()
            try:
                save_frames(*job)
            except BaseException as e:  # noqa: BLE001 — surfaced via close()
                self._err = e
            finally:
                self.busy_s += time.perf_counter() - t0
                self._q.task_done()

    def submit(self, frames, out_dir: str, start_index: int = 0, fmt: str = "{:03d}.png"):
        if self._err is not None:
            raise self._err
        # np.asarray forces a device->host readback NOW (the caller's array
        # may be a jax output); conversion + encode happen on the worker.
        self._q.put((np.asarray(frames), out_dir, start_index, fmt))

    def close(self):
        """Drain the queue, stop the worker, re-raise the first failure."""
        self._q.put(None)
        self._thread.join()
        if self._err is not None:
            raise self._err

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        # Still drain on error: partially-written episodes are more useful
        # than truncated ones, and join keeps tmpdirs valid for tests.
        self.close()
        return False
