"""Geometry layer tests: golden parity vs. the reference formulas plus
self-consistency invariants (SURVEY.md §4a)."""

import sys

import numpy as np
import pytest
import jax.numpy as jnp

from evoworld_tpu.geometry import (
    equirect_ray_grid,
    pinhole_ray_grid,
    plucker_embedding,
    pose_to_matrix,
    unity_to_opencv,
    bilinear_sample_pano,
    equi_to_pers,
    rotate_pano_yaw,
    pano_to_cubemap,
    cubemap_to_pano,
    similarity_from_point_pairs,
)
from evoworld_tpu.geometry.alignment import kabsch_similarity, apply_similarity
from evoworld_tpu.geometry.pose import invert_pose, compose_poses

REF = "/root/reference"


def _ref_available():
    import os

    return os.path.isdir(REF)


@pytest.fixture(scope="module")
def ref_modules():
    if not _ref_available():
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, REF)
    from utils import plucker_embedding as ref_plucker  # noqa
    from utils import geometry as ref_geometry  # noqa

    yield ref_plucker, ref_geometry
    sys.path.remove(REF)


class TestRays:
    def test_golden_equirect_rays(self, ref_modules):
        ref_plucker, _ = ref_modules
        want = ref_plucker.equirectangular_to_ray(target_H=72, target_W=128)
        got = np.asarray(equirect_ray_grid(72, 128))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_unit_norm(self):
        rays = np.asarray(equirect_ray_grid(36, 64))
        np.testing.assert_allclose(np.linalg.norm(rays, axis=-1), 1.0, atol=1e-6)

    def test_center_is_forward(self):
        rays = np.asarray(equirect_ray_grid(100, 200))
        np.testing.assert_allclose(rays[50, 100], [0.0, 0.0, 1.0], atol=1e-6)

    def test_pinhole_center_and_fov(self):
        rays = np.asarray(pinhole_ray_grid(384, 512, fov_x_deg=90.0))
        # Center pixel looks along +Z (up to half-pixel offset).
        assert rays[192, 256, 2] > 0.999
        # Horizontal extremes span ~90 degrees.
        left, right = rays[192, 0], rays[192, -1]
        ang = np.degrees(np.arccos(np.clip(np.dot(left, right), -1, 1)))
        assert 88.0 < ang < 90.5


class TestPose:
    def test_golden_pose_matrix(self, ref_modules):
        import torch

        _, ref_geometry = ref_modules
        rng = np.random.default_rng(0)
        poses = rng.uniform(-50, 50, size=(25, 6)).astype(np.float32)
        for relative in (False, True):
            want = ref_geometry.xyz_euler_to_four_by_four_matrix_batch(
                torch.tensor(poses), relative=relative
            ).numpy()[:, :3, :]
            got = np.asarray(pose_to_matrix(jnp.asarray(poses), relative=relative))
            np.testing.assert_allclose(got, want, atol=1e-4)

    def test_relative_first_is_identity(self):
        rng = np.random.default_rng(1)
        poses = rng.uniform(-10, 10, size=(5, 6)).astype(np.float32)
        rel = np.asarray(pose_to_matrix(jnp.asarray(poses), relative=True))
        np.testing.assert_allclose(rel[0], np.eye(4)[:3], atol=1e-6)

    def test_unity_to_opencv_signs(self):
        pose = jnp.asarray([[1.0, 2.0, 3.0, 10.0, 20.0, 30.0]])
        out = np.asarray(unity_to_opencv(pose))
        np.testing.assert_allclose(out, [[1.0, -2.0, 3.0, -10.0, 20.0, -30.0]])

    def test_invert_compose(self):
        rng = np.random.default_rng(2)
        poses = rng.uniform(-5, 5, size=(4, 6)).astype(np.float32)
        mats = pose_to_matrix(jnp.asarray(poses))
        ident = np.asarray(compose_poses(mats, invert_pose(mats)))
        np.testing.assert_allclose(ident, np.broadcast_to(np.eye(4)[:3], ident.shape), atol=1e-5)


class TestPlucker:
    def test_golden_plucker(self, ref_modules):
        import torch

        ref_plucker, ref_geometry = ref_modules
        rng = np.random.default_rng(3)
        poses = rng.uniform(-20, 20, size=(25, 6)).astype(np.float32)
        rays = equirect_ray_grid(72, 128)
        c2w = pose_to_matrix(jnp.asarray(poses), relative=True)
        got = np.asarray(plucker_embedding(rays, c2w))

        rays_t = torch.tensor(np.asarray(rays))
        c2w_t = ref_geometry.xyz_euler_to_four_by_four_matrix_batch(
            torch.tensor(poses), relative=True
        )[:, :3, :]
        want = ref_plucker.ray_c2w_to_plucker(rays_t, c2w_t).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_channel_order_direction_first(self):
        # Identity pose at origin: moment = 0, direction = camera rays.
        rays = equirect_ray_grid(8, 16)
        c2w = jnp.eye(4)[None, :3, :]
        out = np.asarray(plucker_embedding(rays, c2w))
        np.testing.assert_allclose(out[0, :3], np.asarray(rays).transpose(2, 0, 1), atol=1e-6)
        np.testing.assert_allclose(out[0, 3:], 0.0, atol=1e-6)


class TestResample:
    def _gradient_pano(self, h=64, w=128):
        lon = (np.arange(w) / w - 0.5) * 2 * np.pi
        lat = (np.arange(h) / h - 0.5) * np.pi
        img = np.zeros((h, w, 3), np.float32)
        img[..., 0] = np.cos(lon)[None, :]
        img[..., 1] = np.sin(lon)[None, :]
        img[..., 2] = lat[:, None]
        return jnp.asarray(img)

    def test_bilinear_identity(self):
        pano = self._gradient_pano()
        rays = equirect_ray_grid(64, 128)
        lon = jnp.arctan2(rays[..., 0], rays[..., 2])
        lat = jnp.arcsin(jnp.clip(rays[..., 1], -1, 1))
        out = np.asarray(bilinear_sample_pano(pano, lon, lat))
        # Row 0 is the exact pole: longitude is undefined there (fp32 cos(pi/2)
        # flips sign), so exclude it.
        np.testing.assert_allclose(out[1:], np.asarray(pano)[1:], atol=1e-3)

    def test_equi_to_pers_looks_at_neg_yaw(self):
        pano = self._gradient_pano(128, 256)
        yaw = 0.7
        pers = np.asarray(equi_to_pers(pano, yaw=yaw, out_height=64, out_width=64))
        center = pers[32, 32]
        # View center should sample pano longitude -yaw.
        np.testing.assert_allclose(center[0], np.cos(-yaw), atol=0.05)
        np.testing.assert_allclose(center[1], np.sin(-yaw), atol=0.05)

    def test_rotate_pano_integer_shift(self):
        pano = self._gradient_pano(32, 360)
        # 90 degrees = 90 pixels on a 360-wide pano.
        out = np.asarray(rotate_pano_yaw(pano, 90.0))
        want = np.roll(np.asarray(pano), -90, axis=1)
        np.testing.assert_allclose(out, want, atol=1e-6)

    def test_cubemap_roundtrip(self):
        pano = self._gradient_pano(64, 128)
        faces = pano_to_cubemap(pano, 96)
        back = np.asarray(cubemap_to_pano(faces, 64, 128))
        # Smooth signal: roundtrip should be close except pole distortion.
        err = np.abs(back[8:-8] - np.asarray(pano)[8:-8]).mean()
        assert err < 0.02, err


class TestAlignment:
    def test_two_point_similarity_exact(self):
        rng = np.random.default_rng(4)
        a = rng.normal(size=(10, 3)).astype(np.float32)
        s_true, t_true = 2.5, np.array([1.0, -2.0, 0.5], np.float32)
        theta = 0.8
        r_true = np.array(
            [
                [np.cos(theta), -np.sin(theta), 0],
                [np.sin(theta), np.cos(theta), 0],
                [0, 0, 1],
            ],
            np.float32,
        )
        b = s_true * a @ r_true.T + t_true
        s, r, t = similarity_from_point_pairs(jnp.asarray(a), jnp.asarray(b))
        got0 = np.asarray(apply_similarity(jnp.asarray(a[0]), s, r, t))
        gotn = np.asarray(apply_similarity(jnp.asarray(a[-1]), s, r, t))
        np.testing.assert_allclose(got0, b[0], atol=1e-4)
        np.testing.assert_allclose(gotn, b[-1], atol=1e-4)

    def test_antiparallel_is_true_rotation(self):
        """u -> -u must give a det=+1 rotation mapping u to -u (the
        reference's special case at reproject_vggt_open3d_utils.py:1161 is a
        det=-1 reflection mapping u to +u — a bug we deliberately fix)."""
        from evoworld_tpu.geometry.alignment import rotation_between_vectors

        for u in ([1.0, 0.0, 0.0], [0.2, -0.7, 0.4]):
            u = np.asarray(u, np.float32)
            r = np.asarray(rotation_between_vectors(jnp.asarray(u), jnp.asarray(-u)))
            np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)
            np.testing.assert_allclose(r @ u, -u, atol=1e-5)
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)

    def test_kabsch_exact_for_scale_translation(self):
        # The reference's scale estimator theta = <gt,pred>/<pred,pred> is only
        # exact when no rotation is present; match that contract.
        rng = np.random.default_rng(5)
        a = rng.normal(size=(30, 3)).astype(np.float32)
        b = 1.7 * a
        s, r, t = kabsch_similarity(jnp.asarray(b), jnp.asarray(a))
        got = np.asarray(apply_similarity(jnp.asarray(a), s, r, t))
        np.testing.assert_allclose(got, b, atol=1e-3)
        np.testing.assert_allclose(float(s), 1.7, atol=1e-3)

    def test_kabsch_recovers_rotation(self):
        rng = np.random.default_rng(6)
        a = rng.normal(size=(30, 3)).astype(np.float32)
        theta = 0.5
        r_true = np.array(
            [
                [1, 0, 0],
                [0, np.cos(theta), -np.sin(theta)],
                [0, np.sin(theta), np.cos(theta)],
            ],
            np.float32,
        )
        b = a @ r_true.T  # pure rotation, no scale
        _, r, _ = kabsch_similarity(jnp.asarray(b), jnp.asarray(a))
        np.testing.assert_allclose(np.asarray(r), r_true, atol=1e-3)
        assert np.linalg.det(np.asarray(r)) > 0
