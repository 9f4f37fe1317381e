"""VGGT model + geometry tests."""

import jax
import jax.numpy as jnp
import numpy as np

from evoworld_tpu.models.vggt import (
    VGGT,
    VGGTConfig,
    pose_encoding_to_extri_intri,
    quat_to_rotmat,
    unproject_depth_map_to_point_map,
)
from evoworld_tpu.models.vggt.aggregator import AggregatorConfig

TINY = VGGTConfig(
    aggregator=AggregatorConfig(
        embed_dim=64, depth=4, num_heads=4, num_register_tokens=2,
        output_layers=(0, 1, 2, 3), patch_encoder_depth=1,
    )
)


class TestVGGT:
    def test_contract_keys_and_shapes(self):
        model = VGGT(TINY)
        imgs = jnp.zeros((1, 3, 56, 70, 3))
        params = model.init(jax.random.key(0), imgs)
        preds = model.apply(params, imgs)
        assert preds["pose_enc"].shape == (1, 3, 9)
        assert preds["depth"].shape == (1, 3, 56, 70, 1)
        assert preds["depth_conf"].shape == (1, 3, 56, 70)
        assert preds["world_points"].shape == (1, 3, 56, 70, 3)
        assert float(preds["depth"].min()) > 0  # positive depth activation
        assert float(preds["depth_conf"].min()) >= 1.0

    def test_resolution_generalization(self):
        """Pos-embed interpolation: params init at one size, apply at another."""
        model = VGGT(TINY)
        params = model.init(jax.random.key(0), jnp.zeros((1, 2, 56, 70, 3)))
        preds = model.apply(params, jnp.zeros((1, 2, 28, 42, 3)))
        assert preds["depth"].shape == (1, 2, 28, 42, 1)


    def test_chunked_head_matches_one_shot(self):
        """The reconstructor's lax.map-chunked depth head (OOM guard for the
        49-frame rebuild) must match the one-shot __call__ path, including
        when the chunk size does not divide the frame count."""
        from evoworld_tpu.models.vggt.model import (
            load_and_preprocess_images,
            make_reconstructor,
        )

        model = VGGT(TINY)
        rng = np.random.RandomState(0)
        imgs = rng.rand(5, 56, 70, 3).astype(np.float32)
        params = model.init(jax.random.key(1), jnp.asarray(imgs)[None])

        batch = load_and_preprocess_images(jnp.asarray(imgs))
        ref = model.apply(params, batch)
        for chunk in (2, 8):  # 2 pads 5 -> 6; 8 clamps to n=5
            recon = make_reconstructor(
                model, params, jnp.float32, offload_params=False, head_chunk=chunk
            )
            out = recon(imgs)
            np.testing.assert_allclose(
                np.asarray(out["conf"]), np.asarray(ref["depth_conf"][0]),
                rtol=1e-5, atol=1e-5,
            )


class TestMeshReconstructor:
    def test_sharded_matches_single_device(self):
        """make_reconstructor(mesh=...) — frame-sharded inputs + head-sharded
        global attention (shard_map) — must reproduce the single-device
        output. Heads (4) shard over a 4-device submesh; the head-shard
        routing threshold is lowered via the head_shard_min_seq parameter so
        the tiny sequences engage it."""
        from evoworld_tpu.models.vggt.model import make_reconstructor
        from evoworld_tpu.ops import attention as att
        from evoworld_tpu.parallel.mesh import make_mesh

        model = VGGT(TINY)
        rng = np.random.RandomState(0)
        imgs = rng.rand(4, 48, 64, 3).astype(np.float32)
        params = model.init(jax.random.key(1), jnp.asarray(imgs)[None])

        ref = make_reconstructor(model, params, jnp.float32, offload_params=False)(imgs)
        mesh = make_mesh(devices=jax.devices()[:4], data=4, model=1)
        got = make_reconstructor(model, params, jnp.float32, mesh=mesh,
                                 head_shard_min_seq=16)(imgs)
        for key in ("world_points", "conf", "extrinsic"):
            np.testing.assert_allclose(
                np.asarray(got[key]), np.asarray(ref[key]), rtol=1e-4, atol=1e-4,
            )
        # The head-shard context must not leak out of the reconstructor.
        assert att._HEAD_SHARD_MESH is None


class TestVGGTGeometry:
    def test_quat_identity(self):
        r = np.asarray(quat_to_rotmat(jnp.asarray([0.0, 0.0, 0.0, 1.0])))
        np.testing.assert_allclose(r, np.eye(3), atol=1e-6)

    def test_pose_encoding_roundtrip(self):
        # Identity rotation, translation t, 90-degree fovs.
        enc = jnp.asarray([[1.0, 2.0, 3.0, 0, 0, 0, 1, np.pi / 2, np.pi / 2]])
        ex, intr = pose_encoding_to_extri_intri(enc, (64, 128))
        np.testing.assert_allclose(np.asarray(ex[0, :, :3]), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(ex[0, :, 3]), [1, 2, 3], atol=1e-6)
        # fx = (W/2)/tan(45deg) = 64.
        assert abs(float(intr[0, 0, 0]) - 64.0) < 1e-3
        assert abs(float(intr[0, 1, 1]) - 32.0) < 1e-3

    def test_unprojection_identity_camera(self):
        depth = jnp.full((1, 8, 8), 2.0)
        ex = jnp.eye(4)[None, :3, :]
        intr = jnp.asarray([[[4.0, 0, 4.0], [0, 4.0, 4.0], [0, 0, 1]]])
        pts = np.asarray(unproject_depth_map_to_point_map(depth, ex, intr))
        # Center pixel (4,4) maps to (0, 0, 2).
        np.testing.assert_allclose(pts[0, 4, 4], [0, 0, 2], atol=1e-5)
        # All z == depth for identity extrinsics.
        np.testing.assert_allclose(pts[0, :, :, 2], 2.0, atol=1e-5)


class TestVGGTConverter:
    def test_report_on_empty_source(self):
        from evoworld_tpu.models.vggt.weights import convert_vggt_state_dict

        params, report = convert_vggt_state_dict({})
        assert report  # everything missing is reported, not silently dropped


class TestHostOffload:
    def test_offload_or_fallback_reconstructor_runs(self):
        """make_reconstructor must work whether or not the backend supports
        pinned_host memory kinds (the CPU test backend may not); params kept
        as client numpy exercise the single-transfer path."""
        from evoworld_tpu.models.vggt.model import _try_host_offload, make_reconstructor
        from evoworld_tpu.models.weights import host_random_params

        model = VGGT(TINY)
        imgs = jnp.zeros((1, 2, 56, 70, 3))
        shapes = jax.eval_shape(lambda k: model.init(k, imgs), jax.random.key(0))
        params = host_random_params(shapes, 0, jnp.float32, as_numpy=True)

        moved, dev_sh = _try_host_offload(params)
        leaves = jax.tree.leaves(moved)
        assert leaves, "offload dropped params"
        if dev_sh is not None:
            assert leaves[0].sharding.memory_kind == "pinned_host"

        recon = make_reconstructor(model, params, jnp.float32)
        out = recon(np.zeros((2, 48, 64, 3), np.float32))
        assert out["world_points"].shape[0] == 2
        assert np.isfinite(np.asarray(out["extrinsic"])).all()
