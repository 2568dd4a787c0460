"""Fused (single-jit lax.while_loop) trust-region solve: must match the
host-loop minimizer's results on the tutorial problems."""

import numpy as np
import pytest

import ceres_tpu as ct
from test_solver_e2e import make_curve_fitting_problem, make_powell_problem


def test_fused_powell():
    problem, xs = make_powell_problem()
    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_NORMAL_CHOLESKY,
        max_num_iterations=100, fused_iterations=True)
    summary = ct.solve(options, problem)
    assert summary.termination_type == ct.TerminationType.CONVERGENCE, \
        summary.message
    np.testing.assert_allclose(summary.initial_cost, 107.5, rtol=1e-12)
    assert summary.final_cost < 1e-12
    for x in xs:
        assert abs(x[0]) < 2e-3


def test_fused_matches_host_loop():
    problem, m, c = make_curve_fitting_problem()
    opts = dict(linear_solver_type=ct.LinearSolverType.DENSE_QR,
                max_num_iterations=50)
    s_fused = ct.solve(ct.SolverOptions(fused_iterations=True, **opts),
                       problem)
    m_f, c_f = m[0], c[0]
    m[0] = 0.0
    c[0] = 0.0
    s_host = ct.solve(ct.SolverOptions(**opts), problem)
    np.testing.assert_allclose(s_fused.final_cost, s_host.final_cost,
                               rtol=1e-10)
    np.testing.assert_allclose([m_f, c_f], [m[0], c[0]], rtol=1e-6)
    assert s_fused.num_successful_steps == s_host.num_successful_steps
    assert s_fused.num_unsuccessful_steps == s_host.num_unsuccessful_steps


def test_fused_ba_schur():
    from ceres_tpu.io.bal import synthetic_bal_problem, build_bal_ceres_problem
    bal = synthetic_bal_problem(4, 25, 60, seed=3, pixel_noise=0.5)
    bal.perturb(rotation_sigma=0.02, translation_sigma=0.1,
                point_sigma=0.05, seed=4)
    problem, cams, pts = build_bal_ceres_problem(bal)
    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
        preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
        max_num_iterations=30, fused_iterations=True)
    summary = ct.solve(options, problem)
    assert summary.is_solution_usable(), summary.message
    assert summary.final_cost < 0.05 * summary.initial_cost


def test_fused_dogleg_matches_host_loop():
    """Fused dogleg uses dogleg radius rules (grow 3x / halve), matching
    the host-loop DoglegRadiusStrategy trajectory."""
    problem, m, c = make_curve_fitting_problem()
    opts = dict(
        linear_solver_type=ct.LinearSolverType.DENSE_QR,
        trust_region_strategy_type=ct.TrustRegionStrategyType.DOGLEG,
        max_num_iterations=80)
    s_fused = ct.solve(ct.SolverOptions(fused_iterations=True, **opts),
                       problem)
    m_f, c_f = m[0], c[0]
    m[0] = 0.0
    c[0] = 0.0
    s_host = ct.solve(ct.SolverOptions(**opts), problem)
    assert s_fused.is_solution_usable() and s_host.is_solution_usable()
    np.testing.assert_allclose(s_fused.final_cost, s_host.final_cost,
                               rtol=1e-8)
    np.testing.assert_allclose([m_f, c_f], [m[0], c[0]], rtol=1e-5)
