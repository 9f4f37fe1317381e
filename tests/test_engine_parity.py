"""Data-engine golden parity: our Unity cube->pano converter vs the
reference's torch implementation run on CPU."""

import sys

import numpy as np
import pytest
import jax.numpy as jnp

from evoworld_tpu.data.engine import FACE_ORDER, unity_cubes_to_pano

REF = "/root/reference"


class TestEngineParity:
    def test_matches_reference_converter(self):
        torch = pytest.importorskip("torch")
        sys.path.insert(0, REF + "/dataset/data_engine")
        try:
            from cube_to_pano_batched_io import cube_to_equirectangular_cuda
        except Exception as exc:
            pytest.skip(f"reference converter unimportable: {exc}")
        finally:
            sys.path.remove(REF + "/dataset/data_engine")

        rng = np.random.default_rng(0)
        size = 64
        faces_u8 = {name: rng.integers(0, 255, (1, size, size, 3), dtype=np.uint8)
                    for name in FACE_ORDER}

        batch = {k: torch.from_numpy(v).permute(0, 3, 1, 2) for k, v in faces_u8.items()}
        want = cube_to_equirectangular_cuda(batch, width=128, height=64, device="cpu")[0]

        ours_faces = jnp.stack([jnp.asarray(faces_u8[n][0], jnp.float32) for n in FACE_ORDER])
        got = np.asarray(unity_cubes_to_pano(ours_faces, 64, 128))

        # Both nearest-neighbor resamplers; require near-total agreement
        # (face-boundary ties may pick either neighbor).
        agree = (np.abs(got - want.astype(np.float32)) < 1.0).mean()
        assert agree > 0.98, agree

    def test_ue_variant_matches_reference(self):
        """UE pipeline = top/bottom faces ROTATE_180 at load, then the SAME
        converter (cube_to_pano_batched_io_UE.py:10-18 load_cube_faces,
        :45 process_batch). No longitude shift: the `_UE`-suffixed converter
        at :131 is dead code and 2*pi off the Unity formula (a no-op)."""
        torch = pytest.importorskip("torch")
        sys.path.insert(0, REF + "/dataset/data_engine")
        try:
            from cube_to_pano_batched_io_UE import cube_to_equirectangular_cuda
        except Exception as exc:
            pytest.skip(f"reference UE converter unimportable: {exc}")
        finally:
            sys.path.remove(REF + "/dataset/data_engine")

        from evoworld_tpu.data.engine import ue_cubes_to_pano

        rng = np.random.default_rng(1)
        size = 64
        faces_u8 = {name: rng.integers(0, 255, (1, size, size, 3), dtype=np.uint8)
                    for name in FACE_ORDER}

        # Reference load path: top/bottom arrive rotated 180 degrees.
        loaded = {
            k: (np.rot90(v[0], 2, axes=(0, 1))[None] if k in ("top", "bottom") else v)
            for k, v in faces_u8.items()
        }
        batch = {k: torch.from_numpy(np.ascontiguousarray(v)).permute(0, 3, 1, 2)
                 for k, v in loaded.items()}
        want = cube_to_equirectangular_cuda(batch, width=128, height=64, device="cpu")[0]

        # Ours consumes the RAW (unrotated) captures.
        ours_faces = jnp.stack([jnp.asarray(faces_u8[n][0], jnp.float32) for n in FACE_ORDER])
        got = np.asarray(ue_cubes_to_pano(ours_faces, 64, 128))

        agree = (np.abs(got - want.astype(np.float32)) < 1.0).mean()
        assert agree > 0.98, agree
