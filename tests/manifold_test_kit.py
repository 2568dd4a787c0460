"""Manifold contract checks (reference manifold_test_utils.h, 345 LoC):
invariants every Manifold must satisfy, applied to every stock manifold."""

import jax
import jax.numpy as jnp
import numpy as np


def check_manifold_invariants(manifold, x, delta, atol=1e-9):
    """Reference EXPECT_THAT_MANIFOLD_INVARIANTS_HOLD."""
    x = jnp.asarray(x, dtype=jnp.float64)
    delta = jnp.asarray(delta, dtype=jnp.float64)
    zero = jnp.zeros_like(delta)

    # Plus(x, 0) = x
    np.testing.assert_allclose(np.asarray(manifold.plus(x, zero)),
                               np.asarray(x), atol=atol,
                               err_msg="XPlusZeroIsXAt")

    # Minus(x, x) = 0
    np.testing.assert_allclose(np.asarray(manifold.minus(x, x)),
                               np.asarray(zero), atol=atol,
                               err_msg="XMinusXIsZeroAt")

    # Minus(Plus(x, delta), x) = delta
    y = manifold.plus(x, delta)
    d2 = manifold.minus(y, x)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(delta), atol=atol,
                               err_msg="MinusPlusIsIdentityAt")

    # Plus(x, Minus(y, x)) = y
    y2 = manifold.plus(x, manifold.minus(y, x))
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=atol,
                               err_msg="PlusMinusIsIdentityAt")

    # PlusJacobian matches numeric diff of Plus at delta = 0.
    Jp = np.asarray(manifold.plus_jacobian(x))
    assert Jp.shape == (manifold.ambient_size, manifold.tangent_size)
    eps = 1e-7
    for i in range(manifold.tangent_size):
        e = np.zeros(manifold.tangent_size)
        e[i] = eps
        fd = (np.asarray(manifold.plus(x, jnp.asarray(e)))
              - np.asarray(manifold.plus(x, jnp.asarray(-e)))) / (2 * eps)
        np.testing.assert_allclose(Jp[:, i], fd, atol=1e-6,
                                   err_msg="HasCorrectPlusJacobianAt")

    # MinusJacobian * PlusJacobian = I (tangent) —
    # reference MinusPlusJacobianIsIdentity.
    Jm = np.asarray(manifold.minus_jacobian(x))
    assert Jm.shape == (manifold.tangent_size, manifold.ambient_size)
    np.testing.assert_allclose(Jm @ Jp, np.eye(manifold.tangent_size),
                               atol=1e-7, err_msg="MinusPlusJacobianIdentity")
