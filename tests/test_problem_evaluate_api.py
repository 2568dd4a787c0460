"""Problem evaluation API parity: EvaluateOptions subsets (problem.h:405),
EvaluateResidualBlock (problem.h:515), accessors (HasParameterBlock,
GetCostFunction/GetLossFunctionForResidualBlock), and
Problem::Options::evaluation_callback (problem.h:179)."""

import numpy as np

import ceres_tpu as ct


def _quad_problem():
    """Three residual blocks over three parameter blocks:
    r0 = a - 1        (on a, loss: Huber(0.1) -> active, |r0| large)
    r1 = [b0*2, b1]   (on b, no loss)
    r2 = a + b0 + c   (on a, b, c)
    """
    a = np.array([3.0])
    b = np.array([0.5, -2.0])
    c = np.array([4.0])
    problem = ct.Problem()
    rb0 = problem.add_residual_block(
        ct.AutoDiffCostFunction(lambda a_: a_ - 1.0, 1, [1]),
        ct.HuberLoss(0.1), a)
    rb1 = problem.add_residual_block(
        ct.AutoDiffCostFunction(
            lambda b_: np.asarray([2.0, 1.0]) * b_, 2, [2]), None, b)
    rb2 = problem.add_residual_block(
        ct.AutoDiffCostFunction(
            lambda a_, b_, c_: a_ + b_[:1] + c_, 1, [1, 2, 1]),
        None, a, b, c)
    return problem, (a, b, c), (rb0, rb1, rb2)


def test_accessors():
    problem, (a, b, c), (rb0, rb1, rb2) = _quad_problem()
    assert problem.has_parameter_block(a)
    assert not problem.has_parameter_block(np.array([1.0]))
    assert not problem.has_parameter_block("not an array")
    assert problem.get_cost_function_for_residual_block(rb1) is rb1.cost
    assert problem.get_loss_function_for_residual_block(rb0) is rb0.loss
    assert problem.get_loss_function_for_residual_block(rb1) is None


def test_residuals_are_loss_corrected_in_both_branches():
    """Problem::Evaluate returns robustified residuals (the Corrector is
    applied by ResidualBlock::Evaluate); the residual-only and jacobian
    branches must agree."""
    problem, _, _ = _quad_problem()
    _, res_only, _, _ = problem.evaluate(want_residuals=True)
    _, res_with_jac, _, _ = problem.evaluate(want_residuals=True,
                                             want_jacobian=True)
    np.testing.assert_allclose(res_only, res_with_jac, rtol=1e-12)
    # r0 = 2.0 under Huber(0.1): corrected magnitude sqrt(rho') * r < r
    assert abs(res_only[0]) < 2.0 - 1e-6
    # without the loss the raw residual comes back
    _, res_raw, _, _ = problem.evaluate(apply_loss_function=False)
    np.testing.assert_allclose(res_raw[0], 2.0, rtol=1e-12)


def test_evaluate_residual_block_subset_rows():
    problem, _, (rb0, rb1, rb2) = _quad_problem()
    cost_all, res_all, _, jac_all = problem.evaluate(want_jacobian=True)
    # rows of rb1 occupy res_all[1:3]; selecting [rb2, rb1] reorders rows
    cost_sub, res_sub, _, jac_sub = problem.evaluate(
        residual_blocks=[rb2, rb1], want_jacobian=True)
    np.testing.assert_allclose(res_sub,
                               np.concatenate([res_all[3:4],
                                               res_all[1:3]]), rtol=1e-12)
    np.testing.assert_allclose(jac_sub,
                               np.vstack([jac_all[3:4], jac_all[1:3]]),
                               rtol=1e-12)
    # cost over the selected blocks only: full = sum of disjoint parts
    cost_rb0, _, _, _ = problem.evaluate(residual_blocks=[rb0])
    assert abs(cost_all - (cost_sub + cost_rb0)) < 1e-10


def test_evaluate_parameter_block_subset_columns():
    problem, (a, b, c), _ = _quad_problem()
    _, _, grad_all, jac_all = problem.evaluate(want_gradient=True,
                                               want_jacobian=True)
    # full column order: a (1 col), b (2), c (1)
    # request [c, a]: b held constant; columns reordered
    _, _, grad_sub, jac_sub = problem.evaluate(
        parameter_blocks=[c, a], want_gradient=True, want_jacobian=True)
    assert jac_sub.shape == (jac_all.shape[0], 2)
    np.testing.assert_allclose(jac_sub[:, 0], jac_all[:, 3], rtol=1e-12)
    np.testing.assert_allclose(jac_sub[:, 1], jac_all[:, 0], rtol=1e-12)
    np.testing.assert_allclose(grad_sub, [grad_all[3], grad_all[0]],
                               rtol=1e-12)


def test_evaluate_listed_block_untouched_by_selected_residuals():
    """A listed parameter block not referenced by the selected residual
    blocks still contributes (zero) columns, per the reference contract."""
    problem, (a, b, c), (rb0, rb1, rb2) = _quad_problem()
    _, res, grad, jac = problem.evaluate(
        residual_blocks=[rb0], parameter_blocks=[b, a],
        want_gradient=True, want_jacobian=True)
    assert jac.shape == (1, 3)       # b: 2 zero cols, a: 1 col
    np.testing.assert_allclose(jac[0, :2], 0.0)
    assert abs(jac[0, 2]) > 0
    np.testing.assert_allclose(grad[:2], 0.0)


def test_evaluate_residual_block():
    problem, (a, b, c), (rb0, rb1, rb2) = _quad_problem()
    cost, res, jacs = problem.evaluate_residual_block(rb2)
    np.testing.assert_allclose(res, [a[0] + b[0] + c[0]], rtol=1e-12)
    np.testing.assert_allclose(cost, 0.5 * res[0] ** 2, rtol=1e-12)
    assert len(jacs) == 3
    np.testing.assert_allclose(jacs[0], [[1.0]], rtol=1e-12)
    np.testing.assert_allclose(jacs[1], [[1.0, 0.0]], rtol=1e-12)
    np.testing.assert_allclose(jacs[2], [[1.0]], rtol=1e-12)
    # constant block -> None jacobian
    problem.set_parameter_block_constant(b)
    _, _, jacs = problem.evaluate_residual_block(rb2)
    assert jacs[1] is None
    np.testing.assert_allclose(jacs[0], [[1.0]], rtol=1e-12)
    # no-jacobian variant + the assuming-unchanged alias
    cost2, res2, j2 = problem.evaluate_residual_block(rb2,
                                                      want_jacobians=False)
    assert j2 is None and abs(cost2 - cost) < 1e-12
    cost3, _, _ = (problem.
                   evaluate_residual_block_assuming_parameters_unchanged(
                       rb2, want_jacobians=False))
    assert abs(cost3 - cost) < 1e-12


def test_evaluate_residual_block_manifold_columns():
    """Manifold applied: a quaternion block gives tangent_size columns."""
    q = np.array([1.0, 0.0, 0.0, 0.0])
    problem = ct.Problem()
    rb = problem.add_residual_block(
        ct.AutoDiffCostFunction(lambda qq: qq - 0.5, 4, [4]), None, q)
    problem.set_manifold(q, ct.QuaternionManifold())
    _, res, jacs = problem.evaluate_residual_block(rb)
    assert jacs[0].shape == (4, 3)
    np.testing.assert_allclose(res, q - 0.5, rtol=1e-12)


def test_problem_options_evaluation_callback():
    calls = []

    class CB(ct.EvaluationCallback):
        def prepare_for_evaluation(self, evaluate_jacobians,
                                   new_evaluation_point):
            calls.append((evaluate_jacobians, new_evaluation_point))

    a = np.array([3.0])
    problem = ct.Problem(ct.ProblemOptions(evaluation_callback=CB()))
    rb = problem.add_residual_block(
        ct.AutoDiffCostFunction(lambda a_: a_ - 1.0, 1, [1]), None, a)
    problem.evaluate(want_jacobian=True)
    assert calls[-1] == (True, True)
    problem.evaluate_residual_block_assuming_parameters_unchanged(
        rb, want_jacobians=False)
    assert calls[-1] == (False, False)
    # solve(): the problem-attached callback is honored (forces the host
    # loop; called with new_point at each re-linearization)
    n_before = len(calls)
    s = ct.solve(ct.SolverOptions(max_num_iterations=5), problem)
    assert s.is_solution_usable()
    assert len(calls) > n_before
    np.testing.assert_allclose(a, [1.0], atol=1e-10)


def test_evaluate_csr_jacobian():
    """jacobian_format='csr': the reference returns a CRSMatrix; the CSR
    must match the dense jacobian exactly, full and subset."""
    problem, (a, b, c), (rb0, rb1, rb2) = _quad_problem()
    _, _, _, jd = problem.evaluate(want_jacobian=True)
    _, _, _, js = problem.evaluate(want_jacobian=True,
                                   jacobian_format="csr")
    import scipy.sparse as sp
    assert sp.issparse(js)
    np.testing.assert_allclose(js.toarray(), jd, rtol=1e-12)
    # subset (incl. zero columns for an untouched listed block)
    _, _, _, jd2 = problem.evaluate(residual_blocks=[rb0],
                                    parameter_blocks=[b, a],
                                    want_jacobian=True)
    _, _, _, js2 = problem.evaluate(residual_blocks=[rb0],
                                    parameter_blocks=[b, a],
                                    want_jacobian=True,
                                    jacobian_format="csr")
    np.testing.assert_allclose(js2.toarray(), jd2, rtol=1e-12)
    # structure: rows of rb1 touch only b's columns
    _, _, _, js3 = problem.evaluate(want_jacobian=True,
                                    jacobian_format="csr")
    row = js3.getrow(1).toarray().ravel()   # first rb1 row
    assert row[0] == 0.0 and row[3] == 0.0 and abs(row[1]) > 0


def test_summary_diagnostic_fields():
    """Solver::Summary parity fields: evaluator call counts, thread echo,
    is_constrained, mixed precision flag, schur structure string
    (solver.h:975-1033)."""
    problem, (a, b, c), _ = _quad_problem()
    problem.set_parameter_lower_bound(a, 0, -10.0)
    s = ct.solve(ct.SolverOptions(num_threads=4, max_num_iterations=20),
                 problem)
    assert s.is_solution_usable()
    assert s.is_constrained
    assert s.num_threads_given == 4 and s.num_threads_used == 1
    assert s.num_residual_evaluations > 0
    assert s.num_jacobian_evaluations > 0
    assert not s.mixed_precision_solves_used

    # line-search summary fields
    params = np.array([-1.2, 1.0])
    f = ct.AutoDiffFirstOrderFunction(
        lambda x: (1.0 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2, 2)
    s2 = ct.solve_gradient_problem(
        ct.SolverOptions(minimizer_type=ct.MinimizerType.LINE_SEARCH,
                         max_num_iterations=300),
        ct.GradientProblem(f), params)
    assert s2.is_solution_usable()
    assert s2.num_jacobian_evaluations >= s2.num_iterations
    assert s2.line_search_total_time_in_seconds > 0.0

    # schur structure string on a BA-shaped problem
    from ceres_tpu.io.bal import (build_bal_ceres_problem,
                                  synthetic_bal_problem)
    bal = synthetic_bal_problem(num_cameras=3, num_points=40,
                                num_observations=120, seed=0,
                                pixel_noise=0.5)
    bal.perturb(rotation_sigma=0.05, translation_sigma=0.2,
                point_sigma=0.1, seed=1)
    prob3, _, _ = build_bal_ceres_problem(bal)
    s3 = ct.solve(ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
        max_num_iterations=30), prob3)
    assert s3.is_solution_usable()
    assert s3.schur_structure_given == "2,3,9"
    assert s3.schur_structure_used == "2,3,9"
