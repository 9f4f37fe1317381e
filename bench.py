"""Benchmark: seconds per 25-frame 1024x576 panoramic clip (single-clip
pipeline, 25 Euler steps x 2-way CFG + chunked temporal VAE decode).

Mirrors the reference's inference cost drivers (BASELINE.md): the denoise
loop at latents (25, 18, 72, 128) and the VAE decode. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s/clip", "vs_baseline": N/60}
vs_baseline is relative to the 60 s/clip north-star target (BASELINE.json);
< 1.0 beats the target.

Runs on whatever JAX platform is active (TPU under the driver). Use
--small for a fast CPU smoke run.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import os

import jax
import jax.numpy as jnp

from evoworld_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

# Explicit platform pin for the tunnel-down CPU fallback subprocess: the
# JAX_PLATFORMS env var alone is not honored once the axon plugin registers.
if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])


def build_pipeline(small: bool):
    from evoworld_tpu.diffusion.pipeline import PipelineConfig, make_random_pipeline
    from evoworld_tpu.models.clip import CLIPVisionConfig
    from evoworld_tpu.models.unet import UNetConfig
    from evoworld_tpu.models.vae import VAEConfig

    if small:
        config = PipelineConfig(height=64, width=128, num_frames=5, num_steps=3, decode_chunk=5)
        return make_random_pipeline(
            config,
            unet_config=UNetConfig(block_out_channels=(32, 64, 128, 128), num_attention_heads=(2, 4, 8, 8)),
            vae_config=VAEConfig(block_out_channels=(32, 64, 128, 128)),
            clip_config=CLIPVisionConfig(hidden_size=64, num_layers=2, num_heads=4, mlp_dim=128),
            compute_dtype=jnp.bfloat16,
            zero_init=True,
        ), config
    config = PipelineConfig()  # 1024x576x25, 25 steps
    return make_random_pipeline(config, compute_dtype=jnp.bfloat16, zero_init=True), config


def build_sized(height: int, width: int):
    """Full models at a given pano size (fallback ladder for tight HBM)."""
    from evoworld_tpu.diffusion.pipeline import PipelineConfig, make_random_pipeline

    config = PipelineConfig(height=height, width=width)
    return make_random_pipeline(config, compute_dtype=jnp.bfloat16, zero_init=True), config


def run_once(pipeline, config, key, mask):
    h, w, f = config.height, config.width, config.num_frames
    image = jnp.zeros((h, w, 3), jnp.float32)
    plucker = jnp.zeros((f, 6, h // 8, w // 8), jnp.float32)
    memory = jnp.zeros((f, h, w, 3), jnp.float32)
    out = pipeline(image, plucker, memory, key, mask_mem=mask)
    return float(jnp.sum(out[..., 0, 0, 0]))


def _device_reachable(total_s: float = 1500.0, slice_s: float = 300.0) -> bool:
    """True iff a trivial op completes on the active backend within budget.

    The axon TPU tunnel can wedge for long stretches (a crashed worker takes
    10+ minutes to recover, CLAUDE.md); a hung first jit would make the
    driver record nothing. Probe in bounded slices and keep retrying until
    `total_s` so a worker that comes back mid-recovery still gets benched
    instead of falling to the CPU smoke number. Each probe runs in its own
    daemon thread because a wedged backend call cannot be cancelled — the
    first thread to succeed flips the shared event.
    """
    import threading

    done = threading.Event()

    def probe():
        try:
            float(jnp.sum(jnp.ones(()) + 1.0))
            done.set()
        except Exception:  # noqa: BLE001 — treated as unreachable
            pass

    deadline = time.time() + total_s
    attempt = 0
    while time.time() < deadline:
        attempt += 1
        threading.Thread(target=probe, daemon=True).start()
        if done.wait(min(slice_s, max(1.0, deadline - time.time()))):
            return True
        print(f"# device probe attempt {attempt} timed out; retrying "
              f"({deadline - time.time():.0f}s left)", file=sys.stderr)
    return done.is_set()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--small", action="store_true", help="tiny smoke config")
    parser.add_argument("--repeats", type=int, default=2)
    args = parser.parse_args()

    if not args.small and not _device_reachable():
        # Tunnel wedged: re-pin to CPU in a fresh interpreter and record the
        # honestly-labeled smoke number rather than hanging the driver.
        # (The hung backend thread cannot be killed in-process.)
        import subprocess

        print("# device unreachable after 600s; falling back to --small on CPU",
              file=sys.stderr)
        env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_PLATFORM="cpu")
        out = subprocess.run(
            [sys.executable, __file__, "--small", "--repeats", str(args.repeats)],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        sys.stderr.write(out.stderr)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            raise SystemExit("cpu fallback also failed")
        rec = json.loads(line[-1])
        rec["note"] = "TPU tunnel unreachable; CPU smoke config (not the headline metric)"
        print(json.dumps(rec))
        return

    # Size ladder: full target first; on runtime failure (HBM pressure /
    # worker fault) fall back so the driver always records a number.
    sizes = [(None, None)] if args.small else [(576, 1024), (288, 512)]
    last_error = None
    for height, width in sizes:
        try:
            if args.small:
                pipeline, config = build_pipeline(True)
            else:
                pipeline, config = build_sized(height, width)
            _bench(pipeline, config, args)
            return
        except Exception as exc:  # noqa: BLE001 — report, then try smaller
            last_error = exc
            print(f"# bench failed at {width}x{height}: {type(exc).__name__}: {exc}",
                  file=sys.stderr)
            time.sleep(60)  # let a crashed worker begin recovery
    raise SystemExit(f"all bench sizes failed: {last_error}")


# Peak numbers for MFU/roofline: TPU v5e (device_kind "TPU v5 lite") —
# 197 bf16 TFLOP/s MXU peak, 819 GB/s HBM bandwidth (public spec).
_PEAKS = {"TPU v5 lite": (197e12, 819e9), "TPU v5e": (197e12, 819e9)}


def _unit_cost(fn, *args):
    """(flops, hbm bytes) of one jitted call via XLA's cost analysis."""
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _pipeline_cost(pipeline, config):
    """Analytic per-clip (flops, bytes): XLA cost analysis of each UNIT
    (UNet forward, VAE encode/decode chunk, CLIP) times its trip count —
    lax.scan/map bodies are counted ONCE by cost_analysis, so lowering the
    whole stage would undercount the denoise loop 25x."""
    from evoworld_tpu.models.vae import AutoencoderKLTemporal

    cfg = config
    f, h, w = cfg.num_frames, cfg.height, cfg.width
    lh, lw = cfg.latent_height, cfg.latent_width
    dtype = pipeline.compute_dtype
    p = pipeline.params

    unet_f, unet_b = _unit_cost(
        lambda pr, x, t, c, ti: pipeline.unet.apply(pr, x, t, c, ti),
        p["unet"], jnp.zeros((2, f, lh, lw, 18), dtype), jnp.asarray(1.0),
        jnp.zeros((2, 1, 1024), dtype), jnp.zeros((2, 3)),
    )
    ec = cfg.encode_chunk
    enc_f, enc_b = _unit_cost(
        lambda pr, x: pipeline.vae.apply(pr, x, method=AutoencoderKLTemporal.encode_mode),
        p["vae"], jnp.zeros((ec, h, w, 3), dtype),
    )
    clip_f, clip_b = _unit_cost(
        lambda pr, x: pipeline.clip_tower.apply(pr, x),
        p["clip"], jnp.zeros((1, 224, 224, 3), dtype),
    )
    dc = cfg.decode_chunk
    dec_f, dec_b = _unit_cost(
        lambda pr, x: pipeline.vae.apply(pr, x, dc, method=AutoencoderKLTemporal.decode),
        p["vae"], jnp.zeros((dc, lh, lw, 4), dtype),
    )
    n_steps, n_enc, n_dec = cfg.num_steps, (f + 1) // ec, f // dc
    flops = n_steps * unet_f + n_enc * enc_f + clip_f + n_dec * dec_f
    bytes_ = n_steps * unet_b + n_enc * enc_b + clip_b + n_dec * dec_b
    detail = {
        "unet_fwd_tflops": round(unet_f / 1e12, 2),
        "unet_fwd_gb": round(unet_b / 1e9, 2),
        "denoise_tflops": round(n_steps * unet_f / 1e12, 1),
        "encode_tflops": round((n_enc * enc_f + clip_f) / 1e12, 1),
        "decode_tflops": round(n_dec * dec_f / 1e12, 1),
    }
    return flops, bytes_, detail


def _bench(pipeline, config, args):
    h, w, f = config.height, config.width, config.num_frames

    image = jnp.zeros((h, w, 3), jnp.float32)
    plucker = jnp.zeros((f, 6, h // 8, w // 8), jnp.float32)
    memory = jnp.zeros((f, h, w, 3), jnp.float32)

    def run(key, mask):
        out = pipeline(image, plucker, memory, key, mask_mem=mask)
        # Scalar readback: forces execution even on backends where
        # block_until_ready is a no-op (axon tunnel), without timing a full
        # frame transfer to host.
        return float(jnp.sum(out[..., 0, 0, 0]))

    # Warmup / compile.
    t0 = time.time()
    run(jax.random.key(0), True)
    compile_time = time.time() - t0
    print(f"# compile+first-run: {compile_time:.1f}s", file=sys.stderr)

    times = []
    for i in range(args.repeats):
        t0 = time.time()
        run(jax.random.key(i + 1), False)
        times.append(time.time() - t0)
    value = min(times)

    metric = f"sec_per_clip_{w}x{h}x{f}" + ("_small" if args.small else "")
    rec = {
        "metric": metric,
        "value": round(value, 3),
        "unit": "s/clip",
        "vs_baseline": round(value / 60.0, 4),
    }
    # MFU / roofline (VERDICT r3 #3): achieved TFLOP/s + fraction of peak and
    # HBM bandwidth, from XLA cost analysis of the units x trip counts.
    peaks = _PEAKS.get(jax.devices()[0].device_kind)
    if peaks and not args.small:
        try:
            flops, bytes_, detail = _pipeline_cost(pipeline, config)
            peak_f, peak_b = peaks
            rec.update({
                "tflops_per_clip": round(flops / 1e12, 1),
                "achieved_tflops": round(flops / value / 1e12, 2),
                "mfu": round(flops / value / peak_f, 4),
                "hbm_gb_per_clip": round(bytes_ / 1e9, 1),
                "achieved_hbm_gbps": round(bytes_ / value / 1e9, 1),
                "hbm_utilization": round(bytes_ / value / peak_b, 4),
                "cost_detail": detail,
            })
        except Exception as exc:  # noqa: BLE001 — analysis must not kill the bench
            print(f"# cost analysis unavailable: {type(exc).__name__}: {exc}",
                  file=sys.stderr)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
