"""Rotation conversion tests (reference rotation_test.cc): round trips,
known values, consistency between representations, differentiability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceres_tpu import rotation as rot


def random_quaternions(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q *= np.where(q[:, :1] < 0, -1.0, 1.0)
    return q


def random_angle_axis(rng, n, max_angle=np.pi * 0.9):
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    angle = rng.uniform(-max_angle, max_angle, size=(n, 1))
    return axis * angle


def test_angle_axis_quaternion_roundtrip(rng):
    aa = random_angle_axis(rng, 50)
    q = rot.angle_axis_to_quaternion(jnp.asarray(aa))
    aa2 = rot.quaternion_to_angle_axis(q)
    np.testing.assert_allclose(np.asarray(aa2), aa, atol=1e-12)


def test_small_angle_stability(rng):
    aa = np.asarray([[1e-12, -2e-13, 3e-12], [0.0, 0.0, 0.0]])
    q = rot.angle_axis_to_quaternion(jnp.asarray(aa))
    np.testing.assert_allclose(np.asarray(q[:, 0]), 1.0, atol=1e-15)
    aa2 = rot.quaternion_to_angle_axis(q)
    np.testing.assert_allclose(np.asarray(aa2), aa, atol=1e-15)
    # gradients finite at zero
    g = jax.jacfwd(rot.angle_axis_to_quaternion)(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_quaternion_rotation_matrix_roundtrip(rng):
    q = random_quaternions(rng, 50)
    R = rot.quaternion_to_rotation_matrix(jnp.asarray(q))
    # orthonormal, det +1
    RtR = jnp.einsum("nij,nik->njk", R, R)
    np.testing.assert_allclose(np.asarray(RtR),
                               np.broadcast_to(np.eye(3), (50, 3, 3)),
                               atol=1e-12)
    q2 = rot.rotation_matrix_to_quaternion(R)
    np.testing.assert_allclose(np.asarray(q2), q, atol=1e-9)


def test_angle_axis_rotation_matrix_roundtrip(rng):
    aa = random_angle_axis(rng, 50)
    R = rot.angle_axis_to_rotation_matrix(jnp.asarray(aa))
    aa2 = rot.rotation_matrix_to_angle_axis(R)
    np.testing.assert_allclose(np.asarray(aa2), aa, atol=1e-9)


def test_rotate_point_consistency(rng):
    aa = random_angle_axis(rng, 20)
    pt = rng.normal(size=(20, 3))
    R = rot.angle_axis_to_rotation_matrix(jnp.asarray(aa))
    expected = jnp.einsum("nij,nj->ni", R, jnp.asarray(pt))
    got_aa = rot.angle_axis_rotate_point(jnp.asarray(aa), jnp.asarray(pt))
    np.testing.assert_allclose(np.asarray(got_aa), np.asarray(expected),
                               atol=1e-12)
    q = rot.angle_axis_to_quaternion(jnp.asarray(aa))
    got_q = rot.unit_quaternion_rotate_point(q, jnp.asarray(pt))
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(expected),
                               atol=1e-12)
    got_qn = rot.quaternion_rotate_point(3.7 * q, jnp.asarray(pt))
    np.testing.assert_allclose(np.asarray(got_qn), np.asarray(expected),
                               atol=1e-12)


def test_quaternion_product_matches_matrix_product(rng):
    q1 = jnp.asarray(random_quaternions(rng, 10))
    q2 = jnp.asarray(random_quaternions(rng, 10))
    q12 = rot.quaternion_product(q1, q2)
    R1 = rot.quaternion_to_rotation_matrix(q1)
    R2 = rot.quaternion_to_rotation_matrix(q2)
    R12 = rot.quaternion_to_rotation_matrix(q12)
    np.testing.assert_allclose(np.asarray(R12),
                               np.asarray(jnp.einsum("nij,njk->nik", R1, R2)),
                               atol=1e-12)


def test_known_rotations():
    # 90 degrees about z rotates x to y.
    aa = jnp.asarray([0.0, 0.0, np.pi / 2])
    p = rot.angle_axis_rotate_point(aa, jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(p), [0.0, 1.0, 0.0], atol=1e-14)
    R = rot.euler_angles_to_rotation_matrix(jnp.asarray([0.0, 0.0, 90.0]))
    np.testing.assert_allclose(np.asarray(R @ jnp.asarray([1.0, 0, 0])),
                               [0.0, 1.0, 0.0], atol=1e-14)


def test_jet_compatibility_jacfwd(rng):
    """The reference templates rotations on Jet; here everything must be
    jacfwd-differentiable with finite derivatives."""
    aa = jnp.asarray(random_angle_axis(rng, 1)[0])
    pt = jnp.asarray(rng.normal(size=3))
    J = jax.jacfwd(lambda a: rot.angle_axis_rotate_point(a, pt))(aa)
    # compare against numeric diff
    eps = 1e-7
    for i in range(3):
        e = np.zeros(3)
        e[i] = eps
        fd = (np.asarray(rot.angle_axis_rotate_point(aa + e, pt))
              - np.asarray(rot.angle_axis_rotate_point(aa - e, pt))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J)[:, i], fd, atol=1e-6)


def test_euler_systems_round_trip():
    """All 24 Euler conventions (rotation.h:497-628, euler_angles.h):
    angles -> R -> angles -> R must reproduce R; canonical-range angles
    round-trip exactly."""
    import numpy as np
    from ceres_tpu import rotation as rot

    rng = np.random.default_rng(7)
    for name, system in rot.EULER_SYSTEMS.items():
        for _ in range(5):
            e = rng.uniform(-1.2, 1.2, size=3)
            if system.proper:
                e[1] = rng.uniform(0.05, 1.4)
            R = np.asarray(rot.euler_angles_to_rotation(e, system))
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
            e2 = rot.rotation_matrix_to_euler_angles(R, system)
            R2 = np.asarray(rot.euler_angles_to_rotation(e2, system))
            np.testing.assert_allclose(R, R2, atol=1e-10, err_msg=name)
            np.testing.assert_allclose(np.asarray(e2), e, atol=1e-10,
                                       err_msg=name)


def test_euler_system_gimbal_lock():
    """Degenerate configurations take the documented zero-third-angle
    branch instead of producing NaNs."""
    import numpy as np
    from ceres_tpu import rotation as rot

    s = rot.EULER_SYSTEMS["ExtrinsicXYZ"]
    e = np.array([0.3, np.pi / 2.0, 0.2])  # cy == 0 (gimbal lock)
    R = rot.euler_angles_to_rotation(e, s)
    e2 = np.asarray(rot.rotation_matrix_to_euler_angles(R, s))
    assert np.all(np.isfinite(e2))
    R2 = np.asarray(rot.euler_angles_to_rotation(e2, s))
    np.testing.assert_allclose(np.asarray(R), R2, atol=1e-9)
