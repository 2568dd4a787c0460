"""Cost-function adapters and priors (reference normal_prior.h:60,
conditioned_cost_function.h:74, cost_function_to_functor.h:104) and the
SPSE warm start (iterative_schur_complement_solver.cc:99-111)."""

import jax.numpy as jnp
import numpy as np

import ceres_tpu as ct
from ceres_tpu.cost import (AutoDiffCostFunction, ConditionedCostFunction,
                            CostFunctionToFunctor, NormalPrior,
                            SizedCostFunction)


def test_normal_prior_pulls_to_mean():
    """r = A (x - b): quadratic prior recovered exactly."""
    A = np.array([[2.0, 0.0], [0.0, 3.0]])
    b = np.array([1.0, -2.0])
    x = np.array([5.0, 5.0])
    problem = ct.Problem()
    problem.add_residual_block(NormalPrior(A, b), None, x)
    s = ct.solve(ct.SolverOptions(), problem)
    assert s.is_solution_usable()
    np.testing.assert_allclose(x, b, atol=1e-10)


def test_normal_prior_combines_with_data_term():
    A = np.eye(1) * 10.0   # strong prior toward 0
    b = np.zeros(1)
    x = np.array([4.0])

    def data_term(xv):
        return xv - 2.0    # weak pull toward 2

    problem = ct.Problem()
    problem.add_residual_block(NormalPrior(A, b), None, x)
    problem.add_residual_block(AutoDiffCostFunction(data_term, 1, [1]),
                               None, x)
    ct.solve(ct.SolverOptions(), problem)
    expected = 2.0 / (1.0 + 100.0)   # (A^T A + I)^-1 * 2
    np.testing.assert_allclose(x[0], expected, rtol=1e-8)


def test_conditioned_cost_function():
    """Per-residual conditioners g_i(r_i) wrap another cost
    (conditioned_cost_function.h semantics)."""
    def base(xv):
        return jnp.stack([xv[0] - 1.0, xv[0] - 3.0])

    # conditioners scale residual 0 by 2 and add 1 to residual 1
    conditioners = [lambda r: 2.0 * r, lambda r: r + 1.0]
    wrapped = ConditionedCostFunction(
        AutoDiffCostFunction(base, 2, [1]), conditioners)
    x = np.array([0.0])
    problem = ct.Problem()
    problem.add_residual_block(wrapped, None, x)
    s = ct.solve(ct.SolverOptions(), problem)
    assert s.is_solution_usable()
    # minimize (2(x-1))^2 + (x-3+1)^2 -> 4(x-1) + (x-2) = 0 -> x = 6/5
    np.testing.assert_allclose(x[0], 1.2, rtol=1e-8)


def test_cost_function_to_functor_mixes_with_ad():
    """An analytic CostFunction re-enters a traced functor
    (cost_function_to_functor.h: mix analytic and autodiff)."""
    class Analytic(SizedCostFunction):
        def __init__(self):
            super().__init__(1, [1])

        def residuals(self, xv):
            return 3.0 * xv - 6.0

        def jacobians(self, xv):
            return [jnp.full((1, 1), 3.0)]

    inner = CostFunctionToFunctor(Analytic())

    def outer(xv):
        r = inner(xv)
        return r * r + xv - 2.0   # compose through AD

    x = np.array([0.0])
    problem = ct.Problem()
    problem.add_residual_block(AutoDiffCostFunction(outer, 1, [1]), None, x)
    s = ct.solve(ct.SolverOptions(max_num_iterations=200), problem)
    assert s.is_solution_usable()
    r = (3.0 * x[0] - 6.0) ** 2 + x[0] - 2.0
    assert abs(r) < 1e-6


def test_spse_warm_start_converges():
    """ITERATIVE_SCHUR with use_spse_initialization reaches the same
    optimum (and typically fewer CG iterations)."""
    from ceres_tpu.io.bal import (build_bal_ceres_problem,
                                  synthetic_bal_problem)
    bal = synthetic_bal_problem(3, 30, 90, seed=9, pixel_noise=0.5)
    bal.perturb(rotation_sigma=0.02, translation_sigma=0.05,
                point_sigma=0.05, seed=10)
    results = {}
    for spse in (False, True):
        problem, _, _ = build_bal_ceres_problem(bal)
        options = ct.SolverOptions(
            linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
            use_spse_initialization=spse,
            max_num_iterations=30)
        s = ct.solve(options, problem)
        assert s.is_solution_usable()
        results[spse] = s
    np.testing.assert_allclose(results[True].final_cost,
                               results[False].final_cost, rtol=1e-5)


def test_dynamic_cost_function_to_functor():
    """reference dynamic_cost_function_to_functor.h: a dynamically-sized
    CostFunction composed inside a dynamic AD functor."""
    inner = ct.DynamicAutoDiffCostFunction(
        lambda params: params[0] * 2.0 - params[1])
    inner.add_parameter_block(2)
    inner.add_parameter_block(2)
    inner.set_num_residuals(2)
    wrapped = ct.DynamicCostFunctionToFunctor(inner)

    def outer(params):
        # shift the first block, then apply the wrapped cost
        shifted = [params[0] + 1.0, params[1]]
        return wrapped(shifted)

    a = np.array([0.0, 0.0])
    b = np.array([0.5, -0.5])
    cost = ct.DynamicAutoDiffCostFunction(outer)
    cost.add_parameter_block(2)
    cost.add_parameter_block(2)
    cost.set_num_residuals(2)
    problem = ct.Problem()
    problem.add_residual_block(cost, None, a, b)
    problem.set_parameter_block_constant(b)
    s = ct.solve(ct.SolverOptions(), problem)
    assert s.is_solution_usable()
    # residual 2*(a+1) - b = 0  ->  a = b/2 - 1
    np.testing.assert_allclose(a, b / 2.0 - 1.0, atol=1e-10)


def test_autodiff_first_order_function():
    """autodiff_first_order_function.h: plain functor -> FirstOrderFunction."""
    f = ct.AutoDiffFirstOrderFunction(
        lambda x: (1.0 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2, 2)
    params = np.array([-1.2, 1.0])
    s = ct.solve_gradient_problem(
        ct.SolverOptions(minimizer_type=ct.MinimizerType.LINE_SEARCH,
                         max_num_iterations=500),
        ct.GradientProblem(f), params)
    assert s.is_solution_usable(), s.message
    np.testing.assert_allclose(params, [1.0, 1.0], atol=1e-6)


def test_numeric_diff_first_order_function():
    """numeric_diff_first_order_function.h: finite-difference gradient."""
    f = ct.NumericDiffFirstOrderFunction(
        lambda x: jnp.sum((x - jnp.asarray([3.0, -1.0])) ** 2), 2)
    c, g = f.cost_and_gradient(jnp.asarray([0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(g), [-6.0, 2.0], rtol=1e-5)
    params = np.array([0.0, 0.0])
    s = ct.solve_gradient_problem(
        ct.SolverOptions(minimizer_type=ct.MinimizerType.LINE_SEARCH,
                         max_num_iterations=100),
        ct.GradientProblem(f), params)
    assert s.is_solution_usable(), s.message
    np.testing.assert_allclose(params, [3.0, -1.0], atol=1e-5)


def test_numeric_diff_first_order_ridders():
    """numeric_diff_first_order_function.h supports RIDDERS; the gradient
    must come from Ridders extrapolation accuracy, not a plain central
    stencil. Regression: RIDDERS silently fell into CENTRAL."""
    from ceres_tpu.gradient_problem import NumericDiffFirstOrderFunction
    from ceres_tpu.types import NumericDiffMethodType

    def f(x):
        return jnp.exp(x[0]) + jnp.sin(3.0 * x[1]) * x[0]

    fn = NumericDiffFirstOrderFunction(
        f, 2, method=NumericDiffMethodType.RIDDERS)
    import jax as _jax
    x = jnp.asarray([0.4, -0.8])
    c, g = fn.cost_and_gradient(x)
    g_true = _jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_true),
                               rtol=1e-9)


def test_invalid_inner_iteration_ordering_rejected():
    """coordinate_descent_minimizer.h:76 IsOrderingValid: two blocks of
    one group sharing a residual block must fail the Solve up front."""
    x = np.array([1.0])
    y = np.array([2.0])

    def f(a, b):
        return jnp.stack([a[0] * b[0] - 1.0])

    problem = ct.Problem()
    problem.add_residual_block(
        ct.AutoDiffCostFunction(f, 1, [1, 1]), None, x, y)
    bad = ct.ParameterBlockOrdering()
    bad.add_element_to_group(x, 0)
    bad.add_element_to_group(y, 0)       # same group, shared residual
    s = ct.solve(ct.SolverOptions(
        use_inner_iterations=True, inner_iteration_ordering=bad,
        max_num_iterations=5), problem)
    assert s.termination_type == ct.TerminationType.FAILURE
    assert "independent set" in s.message
