"""Manifold tests (reference manifold_test.cc + sphere/line manifold tests),
via the contract kit applied at random points."""

import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from manifold_test_kit import check_manifold_invariants


def normalize(v):
    return v / np.linalg.norm(v)


CASES = []


def _add(name, manifold, make_x, tangent_scale=0.5):
    CASES.append(pytest.param(manifold, make_x, tangent_scale, id=name))


_add("euclidean3", ct.EuclideanManifold(3),
     lambda rng: rng.normal(size=3))
_add("subset4", ct.SubsetManifold(4, [1, 3]),
     lambda rng: rng.normal(size=4))
_add("subset_none_const", ct.SubsetManifold(3, []),
     lambda rng: rng.normal(size=3))
_add("quaternion", ct.QuaternionManifold(),
     lambda rng: normalize(rng.normal(size=4)))
_add("eigen_quaternion", ct.EigenQuaternionManifold(),
     lambda rng: normalize(rng.normal(size=4)))
_add("sphere3", ct.SphereManifold(3),
     lambda rng: normalize(rng.normal(size=3)) * 2.0)
_add("sphere5", ct.SphereManifold(5),
     lambda rng: normalize(rng.normal(size=5)))
_add("line3", ct.LineManifold(3),
     lambda rng: np.concatenate([rng.normal(size=3),
                                 normalize(rng.normal(size=3))]),
     tangent_scale=0.2)
_add("product", ct.ProductManifold(ct.EuclideanManifold(2),
                                   ct.QuaternionManifold(),
                                   ct.SphereManifold(3)),
     lambda rng: np.concatenate([rng.normal(size=2),
                                 normalize(rng.normal(size=4)),
                                 normalize(rng.normal(size=3))]))
_add("autodiff_quat", ct.AutoDiffManifold(
        plus_fn=ct.QuaternionManifold().plus,
        minus_fn=ct.QuaternionManifold().minus,
        ambient_size=4, tangent_size=3),
     lambda rng: normalize(rng.normal(size=4)))


@pytest.mark.parametrize("manifold,make_x,tangent_scale", CASES)
@pytest.mark.parametrize("trial", range(3))
def test_manifold_invariants(manifold, make_x, tangent_scale, trial):
    rng = np.random.default_rng(100 + trial)
    x = make_x(rng)
    delta = tangent_scale * rng.normal(size=manifold.tangent_size)
    check_manifold_invariants(manifold, x, delta)


def test_quaternion_plus_matches_rotation_composition():
    """QuaternionManifold Plus composes rotations (manifold_test.cc)."""
    from ceres_tpu import rotation as rot
    rng = np.random.default_rng(7)
    q = normalize(rng.normal(size=4))
    delta = 0.3 * rng.normal(size=3)
    m = ct.QuaternionManifold()
    y = np.asarray(m.plus(jnp.asarray(q), jnp.asarray(delta)))
    # |y| = 1
    np.testing.assert_allclose(np.linalg.norm(y), 1.0, atol=1e-12)
    # rotating a point by y == rotating by exp(delta) then by q
    pt = rng.normal(size=3)
    p1 = np.asarray(rot.unit_quaternion_rotate_point(jnp.asarray(y),
                                                     jnp.asarray(pt)))
    p_q = np.asarray(rot.unit_quaternion_rotate_point(jnp.asarray(q),
                                                      jnp.asarray(pt)))
    aa = 2.0 * delta  # Plus uses half-angle convention
    p2 = np.asarray(rot.angle_axis_rotate_point(jnp.asarray(aa),
                                                jnp.asarray(p_q)))
    np.testing.assert_allclose(p1, p2, atol=1e-12)


def test_subset_manifold_holds_constants():
    m = ct.SubsetManifold(4, [0, 2])
    x = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    d = jnp.asarray([0.5, -0.5])
    y = np.asarray(m.plus(x, d))
    np.testing.assert_allclose(y, [1.0, 2.5, 3.0, 3.5])


def test_sphere_norm_preserved():
    m = ct.SphereManifold(4)
    rng = np.random.default_rng(3)
    x = rng.normal(size=4) * 3.0
    d = rng.normal(size=3) * 0.4
    y = np.asarray(m.plus(jnp.asarray(x), jnp.asarray(d)))
    np.testing.assert_allclose(np.linalg.norm(y), np.linalg.norm(x),
                               rtol=1e-12)


def test_quaternion_minus_plus_identity_beyond_half_pi():
    """manifold.cc:105 QuaternionMinusImpl uses atan2(|u|, w) with NO
    sign flip, so Minus(Plus(x, d), x) = d holds for |d| up to pi (the
    log distinguishes the quaternion double cover). Regression: the old
    flip broke this beyond |d| = pi/2."""
    m = ct.QuaternionManifold()
    x = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    for d in ([2.0, 0.0, 0.0], [0.0, 1.9, 0.0], [1.2, 1.2, 1.2],
              [2.9, 0.4, 0.0]):
        d = jnp.asarray(d)
        y = m.plus(x, d)
        np.testing.assert_allclose(np.asarray(m.minus(y, x)),
                                   np.asarray(d), atol=1e-12)

    me = ct.EigenQuaternionManifold()
    xe = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    d = jnp.asarray([2.0, 0.3, -0.4])
    ye = me.plus(xe, d)
    np.testing.assert_allclose(np.asarray(me.minus(ye, xe)),
                               np.asarray(d), atol=1e-12)


def test_line_manifold_origin_tangent_scale():
    """line_manifold.h:212,:265: the origin displacement is H [delta_o, 0]
    with no 1/2 factor — the householder map is orthogonal, so the origin
    moves by exactly |delta_o|."""
    m = ct.LineManifold(3)
    x = jnp.asarray([1.0, 2.0, 3.0, 0.0, 0.0, 1.0])   # origin + unit dir
    delta = jnp.asarray([0.3, -0.7, 0.0, 0.0])        # origin-only move
    y = m.plus(x, delta)
    moved = float(jnp.linalg.norm(y[:3] - x[:3]))
    np.testing.assert_allclose(moved, float(jnp.linalg.norm(delta[:2])),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(m.minus(y, x)),
                               np.asarray(delta), atol=1e-12)


def test_subset_manifold_accepts_numpy():
    m = ct.SubsetManifold(4, [1, 3])
    out = m.plus(np.array([1.0, 2.0, 3.0, 4.0]), np.array([0.1, 0.2]))
    np.testing.assert_allclose(np.asarray(out), [1.1, 2.0, 3.2, 4.0])
