"""Rotation conversions: cross-checked against scipy.spatial.transform."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from mvsmplfitting_tpu.ops import rotations as rot


def random_aa(rng, n=64, scale=2.0):
    return (scale * rng.standard_normal((n, 3))).astype(np.float32)


def test_rodrigues_matches_scipy(rng):
    aa = random_aa(rng)
    ours = np.asarray(rot.rodrigues(jnp.asarray(aa)))
    ref = R.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_rodrigues_zero_rotation():
    out = np.asarray(rot.rodrigues(jnp.zeros((5, 3))))
    np.testing.assert_allclose(out, np.eye(3)[None].repeat(5, 0), atol=1e-6)


def test_rodrigues_gradient_finite_at_zero():
    import jax
    g = jax.jacfwd(lambda v: rot.rodrigues(v))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_matrix_to_axis_angle_roundtrip(rng):
    aa = random_aa(rng, scale=1.5)
    mats = rot.rodrigues(jnp.asarray(aa))
    back = np.asarray(rot.matrix_to_axis_angle(mats))
    ref = R.from_matrix(np.asarray(mats)).as_rotvec()
    # Compare rotations (axis-angle may differ by 2*pi wrapping).
    np.testing.assert_allclose(
        R.from_rotvec(back).as_matrix(), R.from_rotvec(ref).as_matrix(),
        atol=1e-4)


def test_matrix_to_quaternion_matches_scipy(rng):
    aa = random_aa(rng)
    mats = np.asarray(rot.rodrigues(jnp.asarray(aa)))
    q = np.asarray(rot.matrix_to_quaternion(jnp.asarray(mats)))
    ref = R.from_matrix(mats).as_quat()  # xyzw
    ref_wxyz = np.concatenate([ref[:, 3:], ref[:, :3]], axis=1)
    # Quaternions are sign-ambiguous.
    sign = np.sign(np.sum(q * ref_wxyz, axis=1, keepdims=True))
    np.testing.assert_allclose(q * sign, ref_wxyz, atol=1e-5)


def test_sixd_to_matrix_is_rotation(rng):
    sixd = jnp.asarray(rng.standard_normal((32, 6)).astype(np.float32))
    mats = np.asarray(rot.sixd_to_matrix(sixd))
    eye = np.einsum("nij,nkj->nik", mats, mats)
    np.testing.assert_allclose(eye, np.eye(3)[None].repeat(32, 0), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(mats), 1.0, atol=1e-5)


def test_sixd_identity():
    # 6D representation of identity, in the decoder's interleaved layout:
    # reshape(3, 2) columns are the first two basis vectors.
    sixd = jnp.asarray([1.0, 0, 0, 1, 0, 0])
    np.testing.assert_allclose(
        np.asarray(rot.sixd_to_matrix(sixd)), np.eye(3), atol=1e-6)


def test_transform_mat():
    Rm = np.asarray(rot.rodrigues(jnp.asarray([0.1, 0.2, 0.3])))
    t = np.array([1.0, 2.0, 3.0], np.float32)
    T = np.asarray(rot.transform_mat(jnp.asarray(Rm), jnp.asarray(t)))
    np.testing.assert_allclose(T[:3, :3], Rm, atol=1e-6)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-6)
    np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=1e-6)


class TestExtraConversions:
    def test_quaternion_matrix_round_trip(self, rng):
        from mvsmplfitting_tpu.ops.rotations import (
            axis_angle_to_quaternion, matrix_to_axis_angle,
            quaternion_to_matrix, rodrigues,
        )
        aa = jnp.asarray(0.7 * rng.standard_normal((8, 3)), jnp.float32)
        R1 = rodrigues(aa)
        R2 = quaternion_to_matrix(axis_angle_to_quaternion(aa))
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R1),
                                   atol=1e-5)

    def test_sixd_round_trip(self, rng):
        from mvsmplfitting_tpu.ops.rotations import (
            matrix_to_sixd, rodrigues, sixd_to_matrix,
        )
        aa = jnp.asarray(0.5 * rng.standard_normal((5, 3)), jnp.float32)
        R = rodrigues(aa)
        back = sixd_to_matrix(matrix_to_sixd(R))
        np.testing.assert_allclose(np.asarray(back), np.asarray(R),
                                   atol=1e-5)

    def test_euler_xyz(self):
        from mvsmplfitting_tpu.ops.rotations import euler_angles_to_matrix
        # 90 deg about Z only.
        R = euler_angles_to_matrix(jnp.asarray([0.0, 0.0, np.pi / 2]))
        np.testing.assert_allclose(
            np.asarray(R), [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6)
