"""Persistent XLA compilation cache.

Compiles over the axon dev tunnel are expensive (trivial jit ~60 s; the
full pipeline ~10 min; the 3-clip loop's first run ~30 min) and the CPU
GSPMD test compiles are minutes each. jax's persistent cache works on both
backends here (measured: 59.3 s -> 1.6 s across processes for a probe
program), keyed by HLO hash, so code changes invalidate automatically.

The cache directory is scoped by a HOST FINGERPRINT (platform + CPU flag
hash): XLA:CPU caches AOT machine code compiled for the *build* host's CPU
features, and a shared directory served entries compiled with
`+prefer-no-gather` etc. to hosts lacking those features — the loader then
rejects every entry ("could lead to execution errors such as SIGILL",
MULTICHIP_r04.json tail), so the cache never amortized cross-machine and
at worst could execute mismatched AOT code. Fingerprinting gives each
distinct machine type its own namespace; same-machine reuse is unaffected.

Call `enable_persistent_cache()` before the first compile; benches, CLIs,
the driver entry, and the test suite all opt in.
"""

from __future__ import annotations

import hashlib
import os
import platform

BASE_DIR = os.path.expanduser("~/.cache/evoworld_tpu_xla")


def _host_fingerprint() -> str:
    """Short stable id for this machine type (arch + CPU model + features).

    Reads the first processor's identity lines from /proc/cpuinfo (Linux);
    falls back to platform.processor() elsewhere. The model/family/stepping
    lines matter as much as `flags`: LLVM's AOT codegen keys tuning features
    (+prefer-no-gather etc.) off the CPUID MODEL, so two hosts with
    identical ISA flag sets but different models still reject each other's
    artifacts — observed live between this environment's rotating hosts.
    """
    ident: list[str] = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not line.strip():  # end of the first processor block
                    break
                key = line.split(":", 1)[0].strip()
                if key in ("vendor_id", "cpu family", "model", "stepping", "model name"):
                    ident.append(line.strip())
                elif key in ("flags", "Features"):
                    ident.append(" ".join(sorted(line.split(":", 1)[1].split())))
    except OSError:
        ident = [platform.processor()]
    digest = hashlib.sha256("\n".join(ident).encode()).hexdigest()[:12]
    return f"{platform.machine()}-{digest}"


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    """Enable jax's on-disk compilation cache (idempotent, best-effort)."""
    import jax

    try:
        if cache_dir is None:
            cache_dir = os.path.join(BASE_DIR, _host_fingerprint())
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything that takes meaningful compile time; the tunnel
        # round-trip alone dwarfs the 1 s floor.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — older jax or read-only fs: run uncached
        pass
