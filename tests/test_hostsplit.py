"""utils/hostsplit.py: splitting a traced program at pure_callback
boundaries must be semantically identical to the callback-capable jit
(the mechanism that keeps the sparse direct solvers and the C-API shim
working on PJRT plugins without host send/recv support)."""

import jax
import jax.numpy as jnp
import numpy as np

from ceres_tpu.utils.hostsplit import backend_supports_callbacks, split_jit


def test_split_jit_matches_jit():
    def host_solve(a, b):
        return np.linalg.solve(a, b)

    def f(x, M):
        y = x * 2.0 + 1.0
        rhs = jnp.sin(y)
        sol = jax.pure_callback(
            host_solve, jax.ShapeDtypeStruct((4,), jnp.float64), M, rhs)
        z = sol @ x
        tok = jax.pure_callback(
            lambda v: np.float64(v.sum() * 3.0),
            jax.ShapeDtypeStruct((), jnp.float64), sol)
        return {"z": z + tok, "y": y}

    x = jnp.arange(4, dtype=jnp.float64) + 1.0
    M = jnp.eye(4, dtype=jnp.float64) * 2.0 + 0.1
    sp = split_jit(f, (x, M))
    assert sp is not None and sp._split_stages == 5
    ref = jax.jit(f)(x, M)
    got = sp(x, M)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-12)


def test_split_jit_rejects_nested_and_plain():
    def nested(x):
        def body(i, c):
            return c + jax.pure_callback(
                lambda v: v, jax.ShapeDtypeStruct((), jnp.float64), c)
        return jax.lax.fori_loop(0, 3, body, x)

    assert split_jit(nested, (jnp.float64(1.0),)) is None
    assert split_jit(lambda x: x + 1.0, (jnp.ones(3),)) is None


def test_split_jit_accepts_shape_structs():
    def f(x):
        s = jax.pure_callback(
            lambda v: np.asarray(v).cumsum(),
            jax.ShapeDtypeStruct((3,), jnp.float64), x * 2.0)
        return s - 1.0

    sp = split_jit(f, (jax.ShapeDtypeStruct((3,), jnp.float64),))
    assert sp is not None
    x = jnp.asarray([1.0, 2.0, 3.0])
    np.testing.assert_allclose(np.asarray(sp(x)),
                               np.asarray([1.0, 5.0, 11.0]))


def test_backend_probe_is_bool():
    assert backend_supports_callbacks() in (True, False)
