"""Training-step benchmark: sec/step for the full-architecture SVD UNet.

The reference trains 1024x576x25 at bs 1/GPU on 4 GPUs with grad-accum 4,
fp16, ZeRO-1 (train.sh:5-31, config/deepspeed_o1_4gpu.yaml:2-18). A single
v5e chip cannot hold the full-res 25-frame activation set even with remat,
so this bench runs a size ladder from the largest single-chip-feasible shape
downward and records the first success; the multi-chip production config is
validated functionally by `__graft_entry__.dryrun_multichip` and projected
in SCALING.md.

Prints ONE JSON line:
  {"metric": "train_sec_per_step_<WxHxF>_bs1", "value": N, "unit": "s/step",
   "vs_baseline": null, "peak_hbm_gb": N}
(No reference wall-clock sec/step is published in BASELINE.md, so
vs_baseline is null; the number exists to be judged against the reference's
4-GPU config and to track our own regressions.)

Usage: python bench_train.py [--small] [--repeats N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from evoworld_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])


def build_step(height: int, width: int, frames: int, tiny: bool):
    from evoworld_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower
    from evoworld_tpu.models.unet import UNetConfig, UNetSpatioTemporal
    from evoworld_tpu.models.vae import AutoencoderKLTemporal, VAEConfig
    from evoworld_tpu.models.weights import host_random_params
    from evoworld_tpu.train.train_step import (
        TrainConfig,
        TrainState,
        freeze_master_cast,
        make_optimizer,
        make_sharded_train_step,
    )

    if tiny:
        unet_cfg = UNetConfig(block_out_channels=(32, 64, 128, 128),
                              num_attention_heads=(2, 4, 8, 8), remat=True)
        vae_cfg = VAEConfig(block_out_channels=(32, 64, 128, 128))
        clip_cfg = CLIPVisionConfig(hidden_size=64, num_layers=2, num_heads=4,
                                    mlp_dim=128)
    else:
        unet_cfg = UNetConfig(remat=True)  # full 1.5B architecture
        vae_cfg = VAEConfig()
        clip_cfg = CLIPVisionConfig()
    unet = UNetSpatioTemporal(unet_cfg)
    vae = AutoencoderKLTemporal(vae_cfg)
    clip_tower = CLIPVisionTower(clip_cfg)

    lh, lw = height // 8, width // 8

    def shapes_of(fn):
        return jax.eval_shape(fn, jax.random.key(0))

    # Host-side zero/random init: device-side flax init of the 1.5B tree is
    # a pathological compile over the tunnel (see make_random_pipeline).
    unet_shapes = shapes_of(lambda k: unet.init(
        k, jnp.zeros((1, 2, lh, lw, 18), jnp.bfloat16), jnp.asarray(1.0),
        jnp.zeros((1, 1, clip_cfg.projection_dim), jnp.bfloat16),
        jnp.zeros((1, 3)),
    ))
    # fp32 masters for the trainable subset only; frozen leaves stored bf16
    # (reference DeepSpeed-fp16 policy — without it, fp32 params + moments +
    # transient bf16 copies alone exceed the 16 GB chip at ANY resolution).
    # as_numpy + host-side cast: never materializes the full fp32 tree on
    # device (the transfer happens at the first step call, per-leaf, in the
    # final mixed dtypes).
    unet_params = freeze_master_cast(
        host_random_params(unet_shapes, 0, jnp.float32, as_numpy=True),
        jnp.bfloat16,
    )
    frozen = {
        "vae": jax.tree.map(
            lambda s: jnp.zeros(s.shape, jnp.bfloat16),
            shapes_of(lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3), jnp.bfloat16), 1)),
        ),
        "clip": jax.tree.map(
            lambda s: jnp.zeros(s.shape, jnp.bfloat16),
            shapes_of(lambda k: clip_tower.init(k, jnp.zeros((1, 224, 224, 3), jnp.bfloat16))),
        ),
    }

    config = TrainConfig(total_steps=100, warmup_steps=10)
    optimizer = make_optimizer(config, unet_params)
    state = TrainState(unet_params, optimizer.init(unet_params),
                       jnp.zeros((), jnp.int32))
    step = make_sharded_train_step(
        unet, vae, clip_tower, frozen, optimizer, config,
        compute_dtype=jnp.bfloat16,
    )

    batch = {
        "pixel_values": jnp.zeros((1, frames, height, width, 3), jnp.float32),
        "memory_values": jnp.zeros((1, frames, height, width, 3), jnp.float32),
        "plucker": jnp.zeros((1, frames, lh, lw, 6), jnp.float32),
    }
    return step, state, batch


def peak_hbm_gb(step=None, *example_args) -> float | None:
    try:
        stats = jax.devices()[0].memory_stats()
        return round(stats["peak_bytes_in_use"] / 2**30, 2)
    except Exception:  # noqa: BLE001 — not all backends expose memory_stats
        pass
    # Tunnel backends expose no runtime memory_stats; fall back to the
    # compiler's figure: arguments + temps (outputs alias the donated
    # state). The compile below is a persistent-cache hit — the step just
    # ran — so this costs one trace, not a recompile.
    if step is None:
        return None
    try:
        ma = step.lower(*example_args).compile().memory_analysis()
        peak = ma.argument_size_in_bytes + ma.temp_size_in_bytes
        return round(peak / 2**30, 2)
    except Exception:  # noqa: BLE001 — best-effort diagnostic only
        return None


def run_rung(height: int, width: int, frames: int, tiny: bool, repeats: int,
             small: bool):
    step, state, batch = build_step(height, width, frames, tiny)
    # Materialize the state on device before the first call: donation
    # (donate_argnums=0) only reuses buffers of device arrays — host-numpy
    # leaves transfer into fresh buffers the update can't alias, which
    # doubles the 6.5 GiB state at the largest rungs.
    state = jax.device_put(state)
    t0 = time.time()
    state, metrics = step(state, batch, jax.random.key(1))
    loss = float(metrics["loss"])  # scalar readback = sync
    print(f"# compile+first-step: {time.time()-t0:.1f}s loss={loss:.4f}",
          file=sys.stderr)
    assert jnp.isfinite(loss)
    times = []
    for i in range(repeats):
        t0 = time.time()
        state, metrics = step(state, batch, jax.random.key(i + 2))
        float(metrics["loss"])
        times.append(time.time() - t0)
    value = min(times)
    rec = {
        "metric": f"train_sec_per_step_{width}x{height}x{frames}_bs1"
                  + ("_small" if small else ""),
        "value": round(value, 3),
        "unit": "s/step",
        "vs_baseline": None,
        "peak_hbm_gb": peak_hbm_gb(step, state, batch, jax.random.key(1)),
    }
    print(json.dumps(rec))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--small", action="store_true", help="tiny smoke config")
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--rung", default=None,
                        help="run exactly one WIDTHxHEIGHTxFRAMES shape "
                             "in-process (used by the ladder's subprocesses)")
    args = parser.parse_args()

    if args.small:
        run_rung(64, 128, 3, tiny=True, repeats=args.repeats, small=True)
        return
    if args.rung:
        width, height, frames = (int(x) for x in args.rung.split("x"))
        run_rung(height, width, frames, tiny=False, repeats=args.repeats,
                 small=False)
        return

    # Ladder: largest single-chip-feasible shapes first (full model, remat).
    # H/W must be multiples of 64 (latents /8 must survive the UNet's three
    # stride-2 downsamples without odd-dim skip mismatches — 288 -> latent 36
    # -> 9 -> ceil 5 vs skip 9 breaks the up-path concat).
    #
    # Each rung runs in its OWN subprocess: a failed rung must not leak its
    # device buffers (frozen nets + batch + step closure, ~8 GiB) into the
    # next attempt — with in-process retries every post-failure rung OOMed
    # on the corpse of the previous one. Subprocesses also isolate
    # remote-compile-helper crashes (HTTP 500 at the full-res rung).
    import subprocess

    ladder = ["1024x576x25", "768x384x13", "512x256x25", "512x256x13",
              "256x128x13"]
    last = None
    for rung in ladder:
        try:
            # Bound each rung: the tunnel's known bad modes include silent
            # 10+ minute wedges, not just raised errors — an unbounded child
            # would hang the whole ladder on the first stuck compile.
            proc = subprocess.run(
                [sys.executable, __file__, "--rung", rung,
                 "--repeats", str(args.repeats)],
                stdout=subprocess.PIPE, text=True, timeout=2400,
            )
        except subprocess.TimeoutExpired:
            print(f"# train bench rung {rung} timed out (2400 s)",
                  file=sys.stderr)
            last = rung
            time.sleep(30)
            continue
        if proc.returncode == 0 and proc.stdout.strip():
            sys.stdout.write(proc.stdout.splitlines()[-1] + "\n")
            return
        last = rung
        print(f"# train bench rung {rung} failed (rc={proc.returncode})",
              file=sys.stderr)
        time.sleep(30)
    raise SystemExit(f"all train bench sizes failed (last: {last})")


if __name__ == "__main__":
    main()
