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


def test_relin_cond_path_matches_default():
    """CERES_TPU_RELIN_COND=1 (the lax.cond that skips relinearization
    on rejected steps — the pre-round-5 default, kept as a knob for
    reject-heavy workloads) must produce the identical trajectory:
    relinearizing at an unchanged x is deterministic."""
    import os
    import numpy as np
    import ceres_tpu as ct
    from ceres_tpu.io.bal import (build_bal_ceres_problem,
                                  synthetic_bal_problem)

    def build():
        bal = synthetic_bal_problem(num_cameras=4, num_points=120,
                                    num_observations=480, seed=3,
                                    pixel_noise=0.5)
        bal.perturb(rotation_sigma=0.1, translation_sigma=0.5,
                    point_sigma=0.3, seed=5)
        return build_bal_ceres_problem(bal)[0]

    def opts():
        return ct.SolverOptions(
            linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
            use_mixed_precision_solves=True, fused_iterations=True,
            max_num_iterations=30, function_tolerance=1e-8)

    s_def = ct.solve(opts(), build())
    os.environ["CERES_TPU_RELIN_COND"] = "1"
    try:
        s_cond = ct.solve(opts(), build())
    finally:
        del os.environ["CERES_TPU_RELIN_COND"]
    assert s_cond.num_iterations == s_def.num_iterations
    assert s_cond.num_successful_steps == s_def.num_successful_steps
    np.testing.assert_allclose(s_cond.final_cost, s_def.final_cost,
                               rtol=1e-12)
