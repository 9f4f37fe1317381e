"""Is the chunked VAE encode/decode leaving time on the table?

Times _encode/_decode at full scale (1024x576x25) across chunk settings:
decode_chunk 5 (current) vs 25 (one shot), encode_chunk 2 (current) vs 13.
Run on the TPU tunnel: python scripts/exp_vae_chunks.py
"""

import time

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32).ravel()[:1]))


def main():
    import sys

    sys.path.insert(0, ".")
    from evoworld_tpu.diffusion.pipeline import PipelineConfig, make_random_pipeline

    h, w, f = 576, 1024, 25
    image = jnp.zeros((h, w, 3), jnp.float32)
    plucker = jnp.zeros((f, 6, h // 8, w // 8), jnp.float32)
    memory = jnp.zeros((f, h, w, 3), jnp.float32)
    lat = jnp.zeros((f, h // 8, w // 8, 4), jnp.float32)
    mask = jnp.asarray(0.0)
    rng = jax.random.key(0)

    for ec, dc in [(2, 5), (13, 25)]:
        config = PipelineConfig(encode_chunk=ec, decode_chunk=dc)
        pipe = make_random_pipeline(config, compute_dtype=jnp.bfloat16, zero_init=True)
        p = pipe.params
        sync(pipe._encode(p, image, plucker, memory, mask, rng))
        sync(pipe._decode(p, lat))
        for name, fn, args in [
            ("encode", pipe._encode, (p, image, plucker, memory, mask, rng)),
            ("decode", pipe._decode, (p, lat)),
        ]:
            ts = []
            for _ in range(3):
                t0 = time.time()
                sync(fn(*args))
                ts.append(time.time() - t0)
            print(f"ec={ec} dc={dc} {name}: {min(ts)*1000:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
