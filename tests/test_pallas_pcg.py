"""Interpret-mode parity of the whole-solve dense PCG kernel
(ops/pallas_pcg.py) vs the XLA CG loop (solvers/cg.py), unit and
end-to-end. Reference semantics: conjugate_gradients_solver.h:109
(Q-based forcing-sequence termination, indefiniteness guard, residual
refresh)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.io.bal import synthetic_bal_problem, build_bal_ceres_problem
from ceres_tpu.ops.pallas_pcg import dense_pcg, dense_pcg_available
from ceres_tpu.solvers.cg import conjugate_gradients


def _spd(rng, m):
    A = rng.standard_normal((m, m))
    return (A @ A.T + m * np.eye(m)).astype(np.float32)


@pytest.mark.parametrize("m,q_tol", [(144, 0.1), (144, 0.0), (64, 0.1),
                                     (296, 0.01)])
def test_dense_pcg_matches_xla_cg(m, q_tol):
    rng = np.random.default_rng(3)
    S = _spd(rng, m)
    b = rng.standard_normal(m).astype(np.float32)
    tf = 8
    kf = m // tf
    blocks = np.stack([S[i * tf:(i + 1) * tf, i * tf:(i + 1) * tf]
                       for i in range(kf)])
    inv = np.linalg.inv(blocks)
    Minv = np.zeros((m, m), np.float32)
    for i in range(kf):
        Minv[i * tf:(i + 1) * tf, i * tf:(i + 1) * tf] = inv[i]

    Sj, bj = jnp.asarray(S), jnp.asarray(b)

    def prec(v):
        return jnp.sum(jnp.asarray(inv) * v.reshape(kf, 1, tf),
                       axis=-1).reshape(m)

    ref = conjugate_gradients(lambda v: Sj @ v, bj, jnp.zeros_like(bj),
                              apply_preconditioner=prec,
                              max_iterations=60, q_tolerance=q_tol)
    y, it = dense_pcg(Sj, bj, jnp.asarray(Minv),
                      max_iterations=60, q_tolerance=q_tol)
    assert int(it) == int(ref.num_iterations)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref.x),
                               rtol=2e-5, atol=2e-6)


def test_dense_pcg_identity_precond():
    rng = np.random.default_rng(7)
    m = 128
    S = _spd(rng, m)
    b = rng.standard_normal(m).astype(np.float32)
    Sj, bj = jnp.asarray(S), jnp.asarray(b)
    ref = conjugate_gradients(lambda v: Sj @ v, bj, jnp.zeros_like(bj),
                              max_iterations=80, q_tolerance=1e-2)
    y, it = dense_pcg(Sj, bj, jnp.eye(m, dtype=jnp.float32),
                      max_iterations=80, q_tolerance=1e-2)
    assert int(it) == int(ref.num_iterations)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref.x),
                               rtol=2e-5, atol=2e-6)


def test_dense_pcg_size_cap():
    # past the VMEM cap the kernel must decline, not fail
    assert not dense_pcg_available(2000, 100, 0, 0.1)


def test_fused_iterative_schur_with_pcg_kernel_matches():
    """End-to-end: the fused ITERATIVE_SCHUR solve with the dense PCG
    kernel active matches the XLA CG loop bit-for-trajectory (same LM
    iterations, same total CG iterations, same final cost)."""

    def build():
        bal = synthetic_bal_problem(num_cameras=6, num_points=200,
                                    num_observations=800, seed=3,
                                    pixel_noise=0.5)
        bal.perturb(rotation_sigma=0.05, translation_sigma=0.3,
                    point_sigma=0.2, seed=5)
        return build_bal_ceres_problem(bal)[0]

    def opts():
        return ct.SolverOptions(
            linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
            use_mixed_precision_solves=True, fused_iterations=True,
            max_num_iterations=30, function_tolerance=1e-6)

    os.environ["CERES_TPU_NO_PALLAS_PCG"] = "1"
    try:
        s_off = ct.solve(opts(), build())
    finally:
        del os.environ["CERES_TPU_NO_PALLAS_PCG"]
    s_on = ct.solve(opts(), build())
    assert s_on.termination_type == ct.TerminationType.CONVERGENCE
    assert s_on.num_iterations == s_off.num_iterations
    assert s_on.num_linear_solver_iterations \
        == s_off.num_linear_solver_iterations
    np.testing.assert_allclose(s_on.final_cost, s_off.final_cost,
                               rtol=1e-6)
