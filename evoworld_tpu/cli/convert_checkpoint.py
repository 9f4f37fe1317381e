"""Checkpoint conversion tools.

Covers two reference utilities:
  - fp32 -> fp16/bf16 safetensors conversion
    (/root/reference/utils/convert_32_to_16bit.py);
  - torch -> JAX conversion of the SVD pipeline dir and VGGT model.pt into
    converted-parameter directories loadable by `runtime.build_pipeline`.

Usage:
  # dtype conversion of a safetensors file
  python -m evoworld_tpu.cli.convert_checkpoint halve <in.safetensors> <out.safetensors> [bf16|fp16]

  # validate an SVD pipeline dir converts cleanly against our model trees
  python -m evoworld_tpu.cli.convert_checkpoint validate <pipeline_dir>
"""

from __future__ import annotations

import sys

import numpy as np


def halve(src: str, dst: str, dtype: str = "fp16") -> None:
    from safetensors import safe_open
    from safetensors.numpy import save_file

    try:
        import ml_dtypes

        bf16 = ml_dtypes.bfloat16
    except ImportError:
        bf16 = None
    target = np.float16 if dtype == "fp16" else bf16
    if target is None:
        raise SystemExit("bf16 conversion needs ml_dtypes")
    out = {}
    with safe_open(src, framework="np") as f:
        for k in f.keys():
            t = f.get_tensor(k)
            out[k] = t.astype(target) if t.dtype in (np.float32, np.float64) else t
    save_file(out, dst)
    print(f"wrote {dst} ({len(out)} tensors as {dtype})")


def validate_pipeline_dir(pipeline_dir: str) -> list[str]:
    """Convert every sub-model of an HF-format SVD pipeline dir against our
    model trees; returns a list of problem strings (empty = clean). The
    reusable core behind both `convert_checkpoint validate` and the
    weights-day parity gate (cli/validate_parity.py)."""
    import jax
    import jax.numpy as jnp

    from evoworld_tpu.models.clip import CLIPVisionTower
    from evoworld_tpu.models.unet import UNetSpatioTemporal
    from evoworld_tpu.models.vae import AutoencoderKLTemporal
    from evoworld_tpu.models.weights import (
        convert_clip_state_dict,
        convert_unet_state_dict,
        convert_vae_state_dict,
        verify_tree_matches,
    )
    from evoworld_tpu.runtime import _load_safetensors_dir

    checks = [
        ("unet", convert_unet_state_dict, lambda: UNetSpatioTemporal().init(
            jax.random.key(0), jnp.zeros((1, 2, 8, 16, 18)), jnp.asarray(1.0),
            jnp.zeros((1, 1, 1024)), jnp.zeros((1, 3)))),
        ("vae", convert_vae_state_dict, lambda: AutoencoderKLTemporal().init(
            jax.random.key(0), jnp.zeros((1, 64, 64, 3)), 1)),
        ("image_encoder", convert_clip_state_dict, lambda: CLIPVisionTower().init(
            jax.random.key(0), jnp.zeros((1, 224, 224, 3)))),
    ]
    import os

    all_problems: list[str] = []
    for sub, converter, init in checks:
        sd = _load_safetensors_dir(os.path.join(pipeline_dir, sub))
        if sd is None:
            print(f"{sub}: MISSING safetensors")
            all_problems.append(f"{sub}: missing safetensors")
            continue
        converted = converter(sd)
        shapes = jax.eval_shape(lambda i=init: i(), )
        problems = verify_tree_matches(converted["params"], shapes["params"])
        print(f"{sub}: {'OK' if not problems else problems[:10]}")
        all_problems.extend(f"{sub}: {p}" for p in problems)
    return all_problems


def validate(pipeline_dir: str) -> None:
    sys.exit(0 if not validate_pipeline_dir(pipeline_dir) else 1)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        raise SystemExit(__doc__)
    cmd, *rest = argv
    if cmd == "halve":
        halve(*rest)
    elif cmd == "validate":
        validate(*rest)
    else:
        raise SystemExit(f"unknown command {cmd!r}\n{__doc__}")


if __name__ == "__main__":
    main()
