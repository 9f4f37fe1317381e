"""Where do the 51.9 s/clip go? Phase-resolved timing of the staged pipeline.

Times encode / denoise / decode separately at full scale (1024x576x25,
random zero-init weights — cost is shape-driven), each with scalar-readback
sync, to locate the gap between the measured clip time and the UNet-forward
floor (~1.9 s x 25 steps = 47.5 s, scripts/README.md).

Run on the TPU tunnel: python scripts/exp_denoise_profile.py
"""

import time

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32).ravel()[:1]))


def main():
    import sys

    sys.path.insert(0, ".")
    from bench import build_pipeline

    pipeline, config = build_pipeline(small=False)
    h, w, f = config.height, config.width, config.num_frames
    image = jnp.zeros((h, w, 3), jnp.float32)
    plucker = jnp.zeros((f, 6, h // 8, w // 8), jnp.float32)
    memory = jnp.zeros((f, h, w, 3), jnp.float32)
    params = pipeline.params
    rng = jax.random.key(0)

    # Mirror __call__'s staging (diffusion/pipeline.py:118-153) but time each
    # stage separately.
    enc = pipeline._encode
    den = pipeline._denoise
    dec = pipeline._decode

    mask = jnp.asarray(0.0)
    init_noise = jax.random.normal(
        jax.random.key(1),
        (f, config.latent_height, config.latent_width, 4), jnp.float32,
    )
    out = enc(params, image, plucker, memory, mask, rng)
    context_cfg, cond_cfg = out
    sync(out)
    lat = den(params, init_noise, context_cfg, cond_cfg)
    sync(lat)
    frames = dec(params, lat)
    sync(frames)
    print("# compiled", flush=True)

    for name, fn, args in [
        ("encode", enc, (params, image, plucker, memory, mask, rng)),
        ("denoise", den, (params, init_noise, context_cfg, cond_cfg)),
        ("decode", dec, (params, lat)),
    ]:
        ts = []
        for _ in range(3):
            t0 = time.time()
            sync(fn(*args))
            ts.append(time.time() - t0)
        print(f"{name}: {min(ts)*1000:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
