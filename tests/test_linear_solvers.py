"""Linear solver unit tests over canned least-squares systems (the role of
the reference's linear_least_squares_problems.cc + *_solver_test.cc files):
every solver must produce the same damped least-squares step, verified
against a dense numpy reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.ops.bsr import BlockJacobian, BucketJacobian, RVec
from ceres_tpu.solvers import dense as dense_solvers
from ceres_tpu.solvers.cg import conjugate_gradients, solve_cgnr
from ceres_tpu.solvers.preconditioners import (
    make_block_jacobi_preconditioner)
from ceres_tpu.program import GroupMeta


def make_random_block_jacobian(rng, n_blocks=12, r=2, t_per_slot=(3, 4),
                               n_param_blocks=(4, 5)):
    """Random bucketed Jacobian: one bucket, two variable slots."""
    cols = []
    offset = 0
    col_maps = []
    for t, k in zip(t_per_slot, n_param_blocks):
        ids = rng.integers(0, k, size=n_blocks)
        cmap = offset + ids[:, None] * t + np.arange(t)[None, :]
        col_maps.append(jnp.asarray(cmap.astype(np.int32)))
        offset += k * t
        cols.append((t, k, ids))
    num_cols = offset
    J = jnp.asarray(rng.normal(size=(n_blocks, r, sum(t_per_slot))))
    bucket = BucketJacobian(J, tuple(col_maps), 0)
    jac = BlockJacobian([bucket], n_blocks * r, num_cols)
    res = RVec([jnp.asarray(rng.normal(size=(n_blocks, r)))])

    # group metadata (program.GroupMeta shape) for the jacobi preconditioner
    groups = []
    off = 0
    for si, (t, k, ids) in enumerate(cols):
        tan_cols = off + np.arange(k)[:, None] * t + np.arange(t)[None, :]
        groups.append(GroupMeta(t, k, tan_cols.astype(np.int32),
                                [(0, si, ids.astype(np.int32))]))
        off += k * t
    return jac, res, groups


def dense_reference_step(jac, res, D):
    J = np.asarray(jac.to_dense())
    r = np.asarray(res.flatten())
    Dm = np.asarray(D)
    H = J.T @ J + np.diag(Dm * Dm)
    return np.linalg.solve(H, -J.T @ r)


def test_block_jacobian_ops(rng):
    jac, res, groups = make_random_block_jacobian(rng)
    J = np.asarray(jac.to_dense())
    v = rng.normal(size=jac.num_cols)
    w = rng.normal(size=jac.num_rows)

    np.testing.assert_allclose(
        np.asarray(jac.matvec(jnp.asarray(v)).flatten()), J @ v, rtol=1e-12)
    wr = RVec([jnp.asarray(w.reshape(jac.buckets[0].n, jac.buckets[0].r))])
    np.testing.assert_allclose(np.asarray(jac.rmatvec(wr)), J.T @ w,
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(jac.squared_column_norms()),
                               np.sum(J * J, axis=0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(jac.jtj_dense()), J.T @ J,
                               rtol=1e-12, atol=1e-12)
    s = rng.uniform(0.5, 2.0, size=jac.num_cols)
    np.testing.assert_allclose(
        np.asarray(jac.scale_columns(jnp.asarray(s)).to_dense()),
        J * s[None, :], rtol=1e-12)


def test_dense_qr_solver(rng):
    jac, res, _ = make_random_block_jacobian(rng)
    D = jnp.asarray(rng.uniform(0.5, 1.5, size=jac.num_cols))
    d, _ = dense_solvers.solve_dense_qr(jac, res, D)
    np.testing.assert_allclose(np.asarray(d),
                               dense_reference_step(jac, res, D), rtol=1e-8)


def test_dense_normal_cholesky_solver(rng):
    jac, res, _ = make_random_block_jacobian(rng)
    D = jnp.asarray(rng.uniform(0.5, 1.5, size=jac.num_cols))
    d, _ = dense_solvers.solve_dense_normal_cholesky(jac, res, D)
    np.testing.assert_allclose(np.asarray(d),
                               dense_reference_step(jac, res, D), rtol=1e-8)


def test_mixed_precision_refined_cholesky(rng):
    """f32 factorization + f64 iterative refinement recovers the f64 answer
    (reference RefinedDenseCholesky / iterative_refiner.cc)."""
    jac, res, _ = make_random_block_jacobian(rng)
    D = jnp.asarray(rng.uniform(0.5, 1.5, size=jac.num_cols))
    d, _ = dense_solvers.solve_dense_normal_cholesky(
        jac, res, D, mixed_precision=True, refinement_iterations=3)
    np.testing.assert_allclose(np.asarray(d),
                               dense_reference_step(jac, res, D), rtol=1e-6)


def test_cgnr_identity_preconditioner(rng):
    jac, res, _ = make_random_block_jacobian(rng)
    D = jnp.asarray(rng.uniform(0.5, 1.5, size=jac.num_cols))
    d, iters = solve_cgnr(jac, res, D, max_iterations=500, q_tolerance=0.0,
                          r_tolerance=1e-14)
    np.testing.assert_allclose(np.asarray(d),
                               dense_reference_step(jac, res, D), rtol=1e-6)
    assert int(iters) > 0


def test_cgnr_block_jacobi_preconditioner(rng):
    jac, res, groups = make_random_block_jacobian(rng)
    D = jnp.asarray(rng.uniform(0.5, 1.5, size=jac.num_cols))
    precond = make_block_jacobi_preconditioner(jac, D, groups)
    d, iters_pc = solve_cgnr(jac, res, D, apply_preconditioner=precond,
                             max_iterations=500, q_tolerance=0.0,
                             r_tolerance=1e-14)
    np.testing.assert_allclose(np.asarray(d),
                               dense_reference_step(jac, res, D), rtol=1e-6)
    _, iters_id = solve_cgnr(jac, res, D, max_iterations=500,
                             q_tolerance=0.0, r_tolerance=1e-14)
    # preconditioning should not be slower in iterations
    assert int(iters_pc) <= int(iters_id) + 2


def test_conjugate_gradients_spd(rng):
    n = 20
    A = rng.normal(size=(n, n))
    A = A @ A.T + n * np.eye(n)
    b = rng.normal(size=n)
    Aj = jnp.asarray(A)
    result = conjugate_gradients(lambda v: Aj @ v, jnp.asarray(b),
                                 jnp.zeros(n), max_iterations=200,
                                 r_tolerance=1e-14)
    np.testing.assert_allclose(np.asarray(result.x), np.linalg.solve(A, b),
                               rtol=1e-8)


def test_cg_warm_start_q_termination():
    """Q_{0} must be Q(x0), not 0 (conjugate_gradients_solver.h:157-159):
    a warm start at the exact solution terminates via the Q test on the
    first iteration instead of running extra operator applies."""
    from ceres_tpu.solvers.cg import conjugate_gradients
    rng = np.random.default_rng(0)
    M = rng.normal(size=(12, 12))
    A = M @ M.T + 12 * np.eye(12)
    b = rng.normal(size=12)
    x_star = np.linalg.solve(A, b)
    Aj = jnp.asarray(A)

    res = conjugate_gradients(lambda v: Aj @ v, jnp.asarray(b),
                              jnp.asarray(x_star), q_tolerance=0.1,
                              max_iterations=50)
    assert int(res.num_iterations) <= 2, int(res.num_iterations)
    np.testing.assert_allclose(np.asarray(res.x), x_star, rtol=1e-8)

    # cold start still converges to the solution
    res2 = conjugate_gradients(lambda v: Aj @ v, jnp.asarray(b),
                               jnp.zeros(12), q_tolerance=0.0,
                               r_tolerance=1e-12, max_iterations=100)
    np.testing.assert_allclose(np.asarray(res2.x), x_star, rtol=1e-6)
