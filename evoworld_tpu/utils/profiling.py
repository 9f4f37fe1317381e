"""Tracing and phase timing.

The reference has essentially no profiling (SURVEY.md §5.1 — manual VRAM
printers only); this is the greenfield TPU observability layer: wall-clock
phase timers that force device sync, and `jax.profiler` trace capture for
xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

_PHASE_TOTALS: dict[str, float] = defaultdict(float)
_PHASE_COUNTS: dict[str, int] = defaultdict(int)


def force_sync(tree) -> float:
    """Force completion of the computation producing `tree` via a scalar
    readback per array leaf.

    `jax.block_until_ready` is a no-op over the remote-TPU tunnel (CLAUDE.md);
    reading back one reduced scalar is the only reliable sync, and is what
    bench.py uses for its timings. Returns the summed scalar (cheap checksum).
    """
    import jax.numpy as jnp

    total = 0.0
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "dtype") and hasattr(leaf, "sum"):
            total += float(jnp.sum(jnp.asarray(leaf, jnp.float32)))
    return total


@contextlib.contextmanager
def phase_timer(name: str, sync: bool = True, logger=None):
    """Time a phase; forces completion of pending device work on exit."""
    t0 = time.perf_counter()
    yield
    if sync:
        try:
            jax.effects_barrier()
        except Exception:
            pass
    dt = time.perf_counter() - t0
    _PHASE_TOTALS[name] += dt
    _PHASE_COUNTS[name] += 1
    if logger is not None:
        logger.info(f"[{name}] {dt * 1e3:.1f} ms{_hbm_suffix()}")


def _hbm_suffix() -> str:
    """' | hbm used/peak GB' when the backend exposes memory_stats."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        used = stats.get("bytes_in_use", 0) / 2**30
        peak = stats.get("peak_bytes_in_use", 0) / 2**30
        return f" | hbm {used:.2f}/{peak:.2f} GB"
    except Exception:  # noqa: BLE001 — not all backends report stats
        return ""


def phase_add(name: str, seconds: float) -> None:
    """Record externally-measured time under a phase name (e.g. background
    writer threads whose work overlaps device compute and therefore must
    not be timed inline)."""
    _PHASE_TOTALS[name] += seconds
    _PHASE_COUNTS[name] += 1


def phase_reset() -> None:
    """Clear accumulated phase totals (e.g. between a compile episode and a
    steady-state measurement episode in bench_loop.py)."""
    _PHASE_TOTALS.clear()
    _PHASE_COUNTS.clear()


def phase_report() -> dict[str, dict]:
    return {
        k: {"total_s": _PHASE_TOTALS[k], "count": _PHASE_COUNTS[k],
            "mean_ms": 1e3 * _PHASE_TOTALS[k] / max(_PHASE_COUNTS[k], 1)}
        for k in _PHASE_TOTALS
    }


@contextlib.contextmanager
def trace_context(log_dir: str | None):
    """Capture a jax.profiler trace when log_dir is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
