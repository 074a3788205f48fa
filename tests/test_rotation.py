"""Unit tests for SO(3) numerics (ops/rotation.py)."""

from __future__ import annotations

import numpy as np
import pytest

from smplfitter_tpu.ops import rotation as R


def _random_rotvecs(n, seed=0, max_angle=np.pi * 0.95):
    rng = np.random.default_rng(seed)
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(0, max_angle, size=(n, 1))
    return (axis * angle).astype(np.float32)


class TestRotvecMat:
    def test_roundtrip(self):
        # mat2rotvec may return the equivalent (angle - 2pi) representation for
        # some quaternion branches, so compare rotations, not raw vectors.
        rv = _random_rotvecs(100)
        m1 = np.asarray(R.rotvec2mat(rv))
        m2 = np.asarray(R.rotvec2mat(R.mat2rotvec(m1)))
        np.testing.assert_allclose(m2, m1, atol=2e-5)

    def test_roundtrip_small_angles(self):
        rv = _random_rotvecs(100, seed=8, max_angle=0.5)
        rv2 = np.asarray(R.mat2rotvec(R.rotvec2mat(rv)))
        np.testing.assert_allclose(rv2, rv, atol=2e-5)

    def test_zero_rotvec_is_identity(self):
        m = np.asarray(R.rotvec2mat(np.zeros((1, 3), np.float32)))
        np.testing.assert_allclose(m[0], np.eye(3), atol=1e-7)

    def test_valid_rotations(self):
        m = np.asarray(R.rotvec2mat(_random_rotvecs(50)))
        eye = np.einsum('nij,nkj->nik', m, m)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)

    def test_against_scipy(self):
        from scipy.spatial.transform import Rotation

        rv = _random_rotvecs(50, seed=3)
        ours = np.asarray(R.rotvec2mat(rv))
        theirs = Rotation.from_rotvec(rv).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

        back = np.asarray(R.mat2rotvec(theirs.astype(np.float32)))
        back_m = np.asarray(R.rotvec2mat(back))
        np.testing.assert_allclose(back_m, theirs, atol=2e-5)


class TestProjSO3:
    @pytest.mark.parametrize('proj', [R.proj_SO3_svd, R.proj_SO3_analytic])
    def test_recovers_rotation(self, proj):
        rots = np.asarray(R.rotvec2mat(_random_rotvecs(64, seed=1)))
        out = np.asarray(proj(rots))
        np.testing.assert_allclose(out, rots, atol=1e-4)

    @pytest.mark.parametrize('proj', [R.proj_SO3_svd, R.proj_SO3_analytic])
    def test_noisy_matrices(self, proj):
        rng = np.random.default_rng(2)
        rots = np.asarray(R.rotvec2mat(_random_rotvecs(64, seed=2)))
        noisy = (rots + 0.1 * rng.normal(size=rots.shape)).astype(np.float32)
        out = np.asarray(proj(noisy))
        eye = np.einsum('nij,nkj->nik', out, out)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-4)
        assert np.all(np.linalg.det(out) > 0.99)

    def test_analytic_matches_svd(self):
        rng = np.random.default_rng(4)
        A = rng.normal(size=(128, 3, 3)).astype(np.float32)
        a = np.asarray(R.proj_SO3_analytic(A))
        s = np.asarray(R.proj_SO3_svd(A))
        np.testing.assert_allclose(a, s, atol=5e-4)

    def test_reflection_correction(self):
        # A matrix whose naive UV^T would be a reflection.
        A = np.diag([1.0, 1.0, -1.0]).astype(np.float32)[None]
        for proj in (R.proj_SO3_svd, R.proj_SO3_analytic):
            out = np.asarray(proj(A))
            assert np.linalg.det(out[0]) > 0.99

    def test_scaled_input_invariance(self):
        A = np.asarray(R.rotvec2mat(_random_rotvecs(8, seed=5))) * 1e-4
        out = np.asarray(R.proj_SO3_analytic(A.astype(np.float32)))
        np.testing.assert_allclose(out, A / 1e-4, atol=1e-3)

    def test_zero_matrix_gives_identity(self):
        out = np.asarray(R.proj_SO3_analytic(np.zeros((1, 3, 3), np.float32)))
        np.testing.assert_allclose(out[0], np.eye(3), atol=1e-6)

    def test_degenerate_rank1(self):
        # Rank-1: closest rotation is non-unique but must still be a rotation.
        u = np.array([[1.0, 2.0, 3.0]], np.float32)
        v = np.array([[0.5, -1.0, 2.0]], np.float32)
        A = (u[:, :, None] * v[:, None, :]).astype(np.float32)
        out = np.asarray(R.proj_SO3_analytic(A))
        eye = out[0] @ out[0].T
        np.testing.assert_allclose(eye, np.eye(3), atol=1e-4)
        assert np.linalg.det(out[0]) > 0.99


class TestAlignUnitVectors:
    def test_maps_a_to_b(self):
        rng = np.random.default_rng(6)
        a = rng.normal(size=(32, 3)).astype(np.float32)
        b = rng.normal(size=(32, 3)).astype(np.float32)
        a /= np.linalg.norm(a, axis=-1, keepdims=True)
        b /= np.linalg.norm(b, axis=-1, keepdims=True)
        rot = np.asarray(R.align_unit_vectors(a, b))
        mapped = np.einsum('nij,nj->ni', rot, a)
        np.testing.assert_allclose(mapped, b, atol=1e-5)

    def test_parallel_gives_identity(self):
        a = np.array([[0.0, 0.0, 1.0]], np.float32)
        rot = np.asarray(R.align_unit_vectors(a, a))
        np.testing.assert_allclose(rot[0], np.eye(3), atol=1e-6)


class TestRot6d:
    def test_roundtrip(self):
        rots = np.asarray(R.rotvec2mat(_random_rotvecs(32, seed=7)))
        six = R.rotmat_to_rot6d(rots)
        back = np.asarray(R.rot6d_to_rotmat(six))
        np.testing.assert_allclose(back, rots, atol=1e-5)


class TestDivideNoNan:
    def test_zero_denominator(self):
        import jax.numpy as jnp

        out = np.asarray(
            R.divide_no_nan(jnp.array([1.0, 2.0]), jnp.array([0.0, 2.0]))
        )
        np.testing.assert_allclose(out, [0.0, 1.0])
