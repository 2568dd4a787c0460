"""Schur-complement solver tests: structure detection, step correctness vs
dense reference, and end-to-end BA convergence with residual matching across
solver configs (the reference's generated_bundle_adjustment_tests
methodology: compare final residuals, not parameters, since the parameter
space is gauge-ambiguous — bundle_adjustment_test_util.h:245)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.io.bal import (BALProblem, build_bal_ceres_problem,
                              synthetic_bal_problem)
from ceres_tpu.program import CompiledProgram
from ceres_tpu.solvers.schur import detect_schur_structure
from ceres_tpu.solver import make_step_fn


def small_ba(seed=3, ncam=4, npts=25, nobs=60):
    bal = synthetic_bal_problem(ncam, npts, nobs, seed=seed,
                                pixel_noise=0.5)
    bal.perturb(rotation_sigma=0.02, translation_sigma=0.1,
                point_sigma=0.05, seed=seed + 1)
    return build_bal_ceres_problem(bal)


def test_detect_schur_structure():
    problem, cams, pts = small_ba()
    prog = CompiledProgram(problem)
    meta = detect_schur_structure(prog, ct.SolverOptions())
    assert meta is not None
    # points are the e-blocks (never co-observed), cameras the f-blocks
    assert meta.ne == len([p for p in pts])
    assert meta.te == 3
    assert meta.nf == 9 * len(cams)


def test_detect_no_structure():
    """Fully-coupled problem has no independent set of size > 0 that helps;
    a single-block problem must downgrade."""
    x = np.array([1.0, 2.0])

    def f(v):
        return v - jnp.asarray([3.0, 4.0])

    problem = ct.Problem()
    problem.add_residual_block(ct.AutoDiffCostFunction(f, 2, [2]), None, x)
    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR)
    summary = ct.solve(options, problem)
    # Downgraded to CGNR (trust_region_preprocessor.cc:75-107) and solved.
    assert summary.linear_solver_type_used == ct.LinearSolverType.CGNR
    np.testing.assert_allclose(x, [3.0, 4.0], rtol=1e-6)


@pytest.mark.parametrize("solver_type,precond,exact", [
    (ct.LinearSolverType.DENSE_SCHUR, ct.PreconditionerType.JACOBI,
     "direct"),
    (ct.LinearSolverType.SPARSE_SCHUR, ct.PreconditionerType.JACOBI,
     "direct"),
    # PCG is inexact: near-machine termination (eta=1e-14) still leaves a
    # stagnation-dependent remainder, so compare at iterative tolerance.
    (ct.LinearSolverType.ITERATIVE_SCHUR,
     ct.PreconditionerType.SCHUR_JACOBI, "iterative"),
    # weak preconditioners: CG on the raw (unscaled) system cannot reach
    # direct-solver accuracy in bounded iterations; check the step quality
    # (model cost change) instead of the exact step.
    (ct.LinearSolverType.ITERATIVE_SCHUR, ct.PreconditionerType.JACOBI,
     False),
    (ct.LinearSolverType.ITERATIVE_SCHUR,
     ct.PreconditionerType.SCHUR_POWER_SERIES_EXPANSION, False),
    (ct.LinearSolverType.ITERATIVE_SCHUR, ct.PreconditionerType.IDENTITY,
     False),
])
def test_schur_step_matches_dense(solver_type, precond, exact):
    """The Schur-eliminated step equals the full normal-equations step."""
    problem, cams, pts = small_ba()
    prog = CompiledProgram(problem)
    options = ct.SolverOptions(
        linear_solver_type=solver_type, preconditioner_type=precond,
        jacobi_scaling=False, max_linear_solver_iterations=1000, eta=1e-14)
    x = prog.initial_state()
    radius = jnp.asarray(1e4)
    step = make_step_fn(prog, options)(x, radius)

    ref_options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_NORMAL_CHOLESKY,
        jacobi_scaling=False)
    ref = make_step_fn(prog, ref_options)(x, radius)
    if exact == "direct":
        np.testing.assert_allclose(np.asarray(step["delta"]),
                                   np.asarray(ref["delta"]), rtol=1e-5,
                                   atol=1e-10)
        np.testing.assert_allclose(float(step["model_cost_change"]),
                                   float(ref["model_cost_change"]),
                                   rtol=1e-6)
    elif exact == "iterative":
        np.testing.assert_allclose(np.asarray(step["delta"]),
                                   np.asarray(ref["delta"]), rtol=1e-2,
                                   atol=1e-6)
        np.testing.assert_allclose(float(step["model_cost_change"]),
                                   float(ref["model_cost_change"]),
                                   rtol=1e-5)
    else:
        assert float(step["model_cost_change"]) > 0
        np.testing.assert_allclose(float(step["model_cost_change"]),
                                   float(ref["model_cost_change"]),
                                   rtol=0.05)


def residuals_at_solution(solver_type,
                          precond=ct.PreconditionerType.SCHUR_JACOBI, **kw):
    problem, cams, pts = small_ba()
    # Fix the gauge (global similarity ambiguity) so the minimizer is
    # well-posed and all configs converge to one point: hold the first
    # camera and the first point constant.
    problem.set_parameter_block_constant(cams[0])
    problem.set_parameter_block_constant(pts[0])
    options = ct.SolverOptions(
        linear_solver_type=solver_type, preconditioner_type=precond,
        max_num_iterations=100, function_tolerance=1e-12,
        gradient_tolerance=1e-12, parameter_tolerance=1e-12,
        eta=1e-8, max_linear_solver_iterations=1000, **kw)
    summary = ct.solve(options, problem)
    assert summary.is_solution_usable(), summary.message
    cost, residuals, _, _ = problem.evaluate(want_residuals=True)
    return summary, residuals


def test_ba_end_to_end_config_matrix():
    """All solver configs reach the same final residual vector to 1e-4
    (test_util.h:97-114 methodology)."""
    ref_summary, ref_res = residuals_at_solution(
        ct.LinearSolverType.DENSE_QR)
    assert ref_summary.final_cost < ref_summary.initial_cost
    for solver_type in (ct.LinearSolverType.DENSE_SCHUR,
                        ct.LinearSolverType.ITERATIVE_SCHUR,
                        ct.LinearSolverType.CGNR):
        s, res = residuals_at_solution(solver_type)
        np.testing.assert_allclose(
            res, ref_res, atol=1e-4,
            err_msg=f"{solver_type} residuals diverge from DENSE_QR")
        np.testing.assert_allclose(s.final_cost, ref_summary.final_cost,
                                   rtol=1e-5)


def test_ba_with_loss_and_quaternions():
    bal = synthetic_bal_problem(3, 15, 40, seed=9, pixel_noise=0.5)
    bal.perturb(rotation_sigma=0.02, translation_sigma=0.05,
                point_sigma=0.05, seed=11)
    problem, cams, pts = build_bal_ceres_problem(
        bal, loss=ct.HuberLoss(1.0), use_quaternions=True)
    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
        max_num_iterations=40)
    summary = ct.solve(options, problem)
    assert summary.is_solution_usable(), summary.message
    assert summary.final_cost < 0.5 * summary.initial_cost
    for c in cams:
        np.testing.assert_allclose(np.linalg.norm(c[:4]), 1.0, rtol=1e-10)


@pytest.mark.parametrize("precond", [
    ct.PreconditionerType.CLUSTER_JACOBI,
    ct.PreconditionerType.CLUSTER_TRIDIAGONAL,
])
def test_cluster_preconditioners(precond):
    """Visibility-clustered preconditioners (reference
    visibility_based_preconditioner.cc): strong enough that PCG converges
    to the direct-solver step."""
    problem, cams, pts = small_ba()
    prog = CompiledProgram(problem)
    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
        preconditioner_type=precond,
        jacobi_scaling=False, max_linear_solver_iterations=1000, eta=1e-14)
    x = prog.initial_state()
    radius = jnp.asarray(1e4)
    step = make_step_fn(prog, options)(x, radius)
    ref = make_step_fn(prog, ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_NORMAL_CHOLESKY,
        jacobi_scaling=False))(x, radius)
    np.testing.assert_allclose(float(step["model_cost_change"]),
                               float(ref["model_cost_change"]), rtol=1e-4)


def test_clustering_algorithms():
    from ceres_tpu.solvers.clustering import (
        compute_visibility, covisibility_graph, canonical_views_clustering,
        single_linkage_clustering, degree2_maximum_spanning_forest)
    problem, cams, pts = small_ba()
    prog = CompiledProgram(problem)
    meta = detect_schur_structure(prog, ct.SolverOptions())
    vis = compute_visibility(prog, meta)
    assert len(vis) == len(cams)
    assert all(len(v) > 0 for v in vis)
    graph = covisibility_graph(vis)
    assert graph and all(0 < w <= 1.0 + 1e-9 for w in graph.values())
    m1 = canonical_views_clustering(vis, graph)
    assert m1.shape == (len(cams),)
    m2 = single_linkage_clustering(len(vis), graph, min_similarity=0.5)
    assert m2.shape == (len(cams),)
    forest = degree2_maximum_spanning_forest(
        int(m2.max()) + 1, {(0, int(m2.max())): 1.0}
        if m2.max() > 0 else {})
    assert isinstance(forest, list)


def test_mixed_precision_refinement_recovers_f64_step():
    """solver.h:572-589 + iterative_refiner.h: f32 Schur solve + f64
    normal-equation residual refinement reproduces the f64 step."""
    problem, cams, pts = small_ba(seed=11, ncam=4, npts=40, nobs=120)
    prog = CompiledProgram(problem)
    x = prog.initial_state()
    radius = jnp.asarray(1e4)

    def delta(mixed, refine):
        options = ct.SolverOptions(
            linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
            use_mixed_precision_solves=mixed,
            max_num_refinement_iterations=refine)
        return np.asarray(make_step_fn(prog, options)(x, radius)["delta"])

    d64 = delta(False, 0)
    d32 = delta(True, 0)
    d32r = delta(True, 2)
    err32 = np.abs(d32 - d64).max()
    err32r = np.abs(d32r - d64).max()
    assert err32r < max(err32 * 1e-2, 1e-12), (err32, err32r)


def test_user_elimination_ordering():
    """A user-supplied ParameterBlockOrdering (ordered_groups.h) drives the
    Schur partition: group 0 = e-blocks (points), higher groups = f-blocks
    (trust_region_preprocessor.cc SetupLinearSolver ordering handling)."""
    problem, cams, pts = small_ba()
    ordering = ct.ParameterBlockOrdering()
    for p in pts:
        ordering.add_element_to_group(p, 0)
    for c in cams:
        ordering.add_element_to_group(c, 1)
    prog = CompiledProgram(problem)
    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
        linear_solver_ordering=ordering)
    meta = detect_schur_structure(prog, options)
    assert meta is not None
    assert meta.ne == len(pts) and meta.te == 3
    assert meta.nf == 9 * len(cams)

    summary = ct.solve(options, problem)
    assert summary.is_solution_usable()
    assert summary.final_cost < summary.initial_cost


@pytest.mark.parametrize("solver_type,precond,mixed", [
    (ct.LinearSolverType.SPARSE_SCHUR,
     ct.PreconditionerType.SCHUR_JACOBI, False),
    (ct.LinearSolverType.DENSE_NORMAL_CHOLESKY,
     ct.PreconditionerType.SCHUR_JACOBI, False),
    (ct.LinearSolverType.SPARSE_NORMAL_CHOLESKY,
     ct.PreconditionerType.SCHUR_JACOBI, False),
    (ct.LinearSolverType.DENSE_SCHUR,
     ct.PreconditionerType.SCHUR_JACOBI, True),
    (ct.LinearSolverType.ITERATIVE_SCHUR,
     ct.PreconditionerType.JACOBI, False),
    (ct.LinearSolverType.ITERATIVE_SCHUR,
     ct.PreconditionerType.SCHUR_JACOBI, True),
    (ct.LinearSolverType.ITERATIVE_SCHUR,
     ct.PreconditionerType.SCHUR_POWER_SERIES_EXPANSION, False),
    (ct.LinearSolverType.CGNR,
     ct.PreconditionerType.JACOBI, True),
], ids=lambda v: getattr(v, "name", str(v)))
def test_ba_config_matrix_extended(solver_type, precond, mixed):
    """Extended solver x preconditioner x precision matrix: every config
    reaches the DENSE_QR reference residual vector to 1e-4 (the
    generated_bundle_adjustment_tests role,
    bundle_adjustment_test_util.h:245 — residuals, not parameters, since
    parameter space is gauge-ambiguous)."""
    ref_summary, ref_res = residuals_at_solution(
        ct.LinearSolverType.DENSE_QR)
    s, res = residuals_at_solution(solver_type, precond,
                                   use_mixed_precision_solves=mixed)
    np.testing.assert_allclose(
        res, ref_res, atol=2e-4,
        err_msg=f"{solver_type}/{precond}/mixed={mixed} residuals "
                f"diverge from DENSE_QR")
    np.testing.assert_allclose(s.final_cost, ref_summary.final_cost,
                               rtol=1e-4)


def test_schur_meta_invalidated_on_ordering_change():
    """The compiled program is shared across Solve calls; changing
    options.linear_solver_ordering between solves must re-run structure
    detection, not reuse the stale e/f partition."""
    problem, cams, pts = small_ba()
    prog = CompiledProgram.get_cached(problem, ct.SolverOptions())
    meta_auto = detect_schur_structure(prog, ct.SolverOptions())
    assert meta_auto is not None
    ne_auto = meta_auto.ne

    # user ordering: eliminate CAMERAS instead of points
    ordering = ct.ParameterBlockOrdering()
    for c in cams:
        ordering.add_element_to_group(c, 0)
    for p in pts:
        ordering.add_element_to_group(p, 1)
    opts2 = ct.SolverOptions(linear_solver_ordering=ordering)
    prog2 = CompiledProgram.get_cached(problem, opts2)
    meta_user = detect_schur_structure(prog2, opts2)
    assert meta_user is not None
    assert meta_user.ne == len(cams) != ne_auto

    # back to automatic: the original partition again (not the stale one)
    prog3 = CompiledProgram.get_cached(problem, ct.SolverOptions())
    meta_again = detect_schur_structure(prog3, ct.SolverOptions())
    assert meta_again is not None and meta_again.ne == ne_auto
