"""AOT-compile the reference-shape sharded train step and record memory.

VERDICT r4 #3: SCALING.md's "the reference shape (1024x576x25, bs 1 —
/root/reference/train.sh:5-31) fits v5e-8 with frame-sharded activations +
ZeRO-1" was hand arithmetic. This script turns it into a compiler fact:

  - 8-device virtual mesh (all "data");
  - full 1.5B UNetConfig + full VAE/CLIP, ABSTRACT params (eval_shape —
    nothing is materialized; lowering + compile only);
  - mixed-dtype master policy (freeze_master_cast dtypes), fp32 masters +
    Adam moments ZeRO-1-sharded, batch FRAME-sharded
    (make_sharded_train_step(shard_frames=True));
  - `.lower().compile()` then `compiled.memory_analysis()` — XLA's buffer
    assignment for ONE shard of the SPMD program, i.e. per-device bytes.

Caveat recorded with the result: the virtual backend is XLA:CPU, so layout
padding differs from TPU in the small (TPU pads minor dims to lane/sublane
tiles); channel dims here are 4/18/320/640/1280 — mostly lane-aligned — and
the dominant temps are activation-shaped, so the CPU number is the right
order and the claim is "compiler-verified fit with margin", not a byte-exact
TPU reservation.

Usage: python scripts/exp_train_fit.py [--devices 8] [--out TRAIN_FIT.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def provision(n: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--height", type=int, default=576)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--out", default="TRAIN_FIT.json")
    args = ap.parse_args(argv)

    provision(args.devices)

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from evoworld_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower
    from evoworld_tpu.models.unet import UNetConfig, UNetSpatioTemporal
    from evoworld_tpu.models.vae import AutoencoderKLTemporal, VAEConfig
    from evoworld_tpu.parallel.mesh import make_mesh, shard_opt_state_zero1
    from evoworld_tpu.train.train_step import (
        TrainConfig,
        TrainState,
        freeze_master_cast,
        make_optimizer,
        make_sharded_train_step,
        trainable_mask,
    )

    mesh = make_mesh(jax.devices()[: args.devices], model=1)
    repl = NamedSharding(mesh, P())

    # Full-scale architecture (reference train.sh / unet_plucker.py defaults),
    # remat on transformer blocks exactly as the production trainer and the
    # measured single-chip rung (bench_train.py) compile it.
    unet = UNetSpatioTemporal(UNetConfig(remat=True))
    vae = AutoencoderKLTemporal(VAEConfig())
    clip_tower = CLIPVisionTower(CLIPVisionConfig())

    f, height, width = args.frames, args.height, args.width
    lh, lw = height // 8, width // 8
    compute_dtype = jnp.bfloat16

    # Abstract params: shapes only, nothing materialized.
    unet_shapes = jax.eval_shape(
        lambda k: unet.init(
            k,
            jnp.zeros((1, 2, lh, lw, 18), compute_dtype),
            jnp.asarray(1.0),
            jnp.zeros((1, 1, 1024), compute_dtype),
            jnp.zeros((1, 3)),
        ),
        jax.random.key(0),
    )
    vae_shapes = jax.eval_shape(
        lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3), compute_dtype), 1),
        jax.random.key(0),
    )
    clip_shapes = jax.eval_shape(
        lambda k: clip_tower.init(k, jnp.zeros((1, 224, 224, 3), compute_dtype)),
        jax.random.key(0),
    )

    # Mixed master policy on the abstract tree (the ShapeDtypeStruct twin of
    # freeze_master_cast): frozen leaves -> bf16, trainable masters fp32.
    del freeze_master_cast  # concrete-array twin, applied by the real trainer
    mask = trainable_mask(unet_shapes)
    unet_shapes = jax.tree.map(
        lambda s, m: jax.ShapeDtypeStruct(
            s.shape, s.dtype if m else compute_dtype
        ),
        unet_shapes,
        mask,
    )

    config = TrainConfig(total_steps=30000, warmup_steps=500)
    optimizer = make_optimizer(config, unet_shapes)
    opt_shapes = jax.eval_shape(optimizer.init, unet_shapes)

    params_sds = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=repl), unet_shapes
    )
    opt_sds = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        opt_shapes,
        shard_opt_state_zero1(opt_shapes, mesh),
    )
    state_sds = TrainState(
        params_sds,
        opt_sds,
        jax.ShapeDtypeStruct((), jnp.int32, sharding=repl),
    )

    # Batch arguments REPLICATED: F=25 does not divide 8, so an explicit
    # frame-sharded input spec is rejected at lower time; the step's internal
    # with_sharding_constraint calls (edm_loss) shard the frame axis, which
    # GSPMD pads for uneven counts (ceil(25/8)=4 frames/chip). The replicated
    # arguments cost ~0.35 GiB/device and are counted in argument_gib.
    batch_sds = {
        "pixel_values": jax.ShapeDtypeStruct((1, f, height, width, 3), jnp.float32, sharding=repl),
        "memory_values": jax.ShapeDtypeStruct((1, f, height, width, 3), jnp.float32, sharding=repl),
        "plucker": jax.ShapeDtypeStruct((1, f, lh, lw, 6), jnp.float32, sharding=repl),
    }
    rng_sds = jax.ShapeDtypeStruct(
        jax.eval_shape(lambda: jax.random.key(0)).shape,
        jax.eval_shape(lambda: jax.random.key(0)).dtype,
        sharding=repl,
    )

    # Frozen nets are a jit closure in the real step (hoisted consts). They
    # must be CONCRETE to lower, and must NOT be zeros — XLA's algebraic
    # simplifier would fold conv(x, 0) subgraphs away and understate the
    # activation temps. host_random_params is cheap (1.4 GiB bf16 total).
    from evoworld_tpu.models.weights import host_random_params

    frozen = {
        "vae": host_random_params(vae_shapes, 11, compute_dtype),
        "clip": host_random_params(clip_shapes, 12, compute_dtype),
    }
    import numpy as np

    def tree_bytes(t):
        return int(sum(np.prod(s.shape) * s.dtype.itemsize for s in jax.tree.leaves(t)))

    frozen_bytes = tree_bytes(frozen)

    step = make_sharded_train_step(
        unet,
        vae,
        clip_tower,
        frozen,
        optimizer,
        config,
        mesh=mesh,
        compute_dtype=compute_dtype,
        zero_stage=1,
        shard_frames=True,
    )

    print(f"lowering train step at {width}x{height}x{f} bs1 over {args.devices} devices...", flush=True)
    t0 = time.monotonic()
    lowered = step.lower(state_sds, batch_sds, rng_sds)
    t_lower = time.monotonic() - t0
    print(f"lowered in {t_lower:.1f} s; compiling...", flush=True)
    t0 = time.monotonic()
    compiled = lowered.compile()
    t_compile = time.monotonic() - t0
    print(f"compiled in {t_compile:.1f} s", flush=True)

    ma = compiled.memory_analysis()
    cost = compiled.cost_analysis()
    gib = 1024.0**3
    # XLA:CPU field semantics (calibrated against the TPU-compiled rung in
    # TRAIN_BENCH_r4): `temp_size_in_bytes` on this backend is the SUM of
    # temp buffers with no liveness overlap, while `peak_memory_in_bytes`
    # is the liveness-aware heap peak (temps live simultaneously). The
    # per-chip HBM estimate is therefore
    #   arguments (state incl. fp32 masters/moments shards, batch, rng)
    #   + liveness-aware temp peak
    #   + frozen VAE/CLIP closure constants,
    # with outputs aliasing the donated state (alias_gib).
    result = {
        "shape": f"{width}x{height}x{f} bs1",
        "devices": args.devices,
        "sharding": "frames over data (8), ZeRO-1 opt state, params replicated, mixed bf16/fp32 masters, remat transformer blocks",
        "backend": "cpu-virtual (see script docstring caveat)",
        "per_device": {
            "argument_gib": ma.argument_size_in_bytes / gib,
            "alias_gib": ma.alias_size_in_bytes / gib,
            "temp_sum_no_reuse_gib": ma.temp_size_in_bytes / gib,
            "output_gib": ma.output_size_in_bytes / gib,
            "peak_liveness_gib": (ma.peak_memory_in_bytes / gib) if ma.peak_memory_in_bytes else None,
        },
        "frozen_nets_bf16_gib": frozen_bytes / gib,
        "flops_per_step_per_device_tflop": cost.get("flops", 0.0) / 1e12 if cost else None,
        "lower_s": round(t_lower, 1),
        "compile_s": round(t_compile, 1),
        "hbm_per_chip_gib": 16.0,
    }
    a = result["per_device"]
    if a["peak_liveness_gib"] is not None:
        result["per_chip_estimate_gib"] = (
            a["argument_gib"] + a["peak_liveness_gib"]
            + result["frozen_nets_bf16_gib"]
        )
        result["fits_16gib"] = bool(result["per_chip_estimate_gib"] < 16.0)
    print(json.dumps(result, indent=2))
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=2)
        fh.write("\n")
    print(f"wrote {args.out}")
    # Prompt exit: the virtual backend can hang in teardown (same issue the
    # dryrun watchdog guards); everything is flushed and written.
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
