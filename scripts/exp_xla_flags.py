"""XLA flag sweep over the full UNet forward (single chip).

The non-attention ~1.1 s of the 1.955 s forward is elementwise chains at
practical HBM bandwidth (scripts/README.md); deeper fusion is the only
remaining compiler-side lever. Each flag set runs in a subprocess (flags
must be set before backend init) around scripts/exp_unet_fwd.py, which
prints `forward N ms`.

Run on the TPU tunnel: python scripts/exp_xla_flags.py
(child bench: scripts/exp_unet_fwd.py)
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

# TPU flags go through per-jit compiler_options (EVW_COMPILER_OPTIONS in
# the child), NOT XLA_FLAGS: the client is a CPU XLA build whose flag
# parser fatally rejects TPU-only names, while the actual compile happens
# server-side over the tunnel.
FLAG_SETS = {
    "baseline": {},
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem128m": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
    "latency_sched": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "async_all": {"xla_tpu_enable_async_collective_fusion": "true"},
}


def main():
    import json

    child = os.path.join(HERE, "exp_unet_fwd.py")
    for name, flags in FLAG_SETS.items():
        env = dict(os.environ)
        env["EVW_COMPILER_OPTIONS"] = json.dumps(flags) if flags else ""
        print(f"=== {name}: compiler_options={flags}", flush=True)
        try:
            out = subprocess.run(
                [sys.executable, child],
                env=env, capture_output=True, text=True, timeout=3600,
            )
            for line in (out.stdout + out.stderr).splitlines():
                if "forward" in line or "compile" in line or "Error" in line:
                    print(f"  {line}", flush=True)
            if out.returncode != 0:
                print(f"  exit={out.returncode}", flush=True)
        except subprocess.TimeoutExpired:
            print("  TIMEOUT", flush=True)


if __name__ == "__main__":
    main()
