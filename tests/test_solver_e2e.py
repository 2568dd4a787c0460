"""End-to-end solves reproducing the reference tutorial numbers
(BASELINE.md: helloworld, Powell, curve_fitting, robust_curve_fitting)."""

import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct


def test_helloworld():
    """f(x) = 10 - x; expect cost 4.5125e+01 -> ~5e-16 in a few iterations
    (nnls_tutorial.rst:141-145)."""
    x = np.array([0.5])

    def f(xx):
        return 10.0 - xx

    problem = ct.Problem()
    problem.add_residual_block(
        ct.AutoDiffCostFunction(f, 1, [1]), None, x)
    options = ct.SolverOptions(linear_solver_type=ct.LinearSolverType.DENSE_QR)
    summary = ct.solve(options, problem)
    assert summary.termination_type == ct.TerminationType.CONVERGENCE
    np.testing.assert_allclose(summary.initial_cost, 45.125, rtol=1e-12)
    assert summary.final_cost < 1e-12
    np.testing.assert_allclose(x[0], 10.0, rtol=1e-6)


class PowellF1:
    def __call__(self, x1, x2):
        return x1 + 10.0 * x2


class PowellF2:
    def __call__(self, x3, x4):
        return jnp.sqrt(5.0) * (x3 - x4)


class PowellF3:
    def __call__(self, x2, x3):
        return (x2 - 2.0 * x3) ** 2


class PowellF4:
    def __call__(self, x1, x4):
        return jnp.sqrt(10.0) * (x1 - x4) ** 2


def make_powell_problem():
    x1 = np.array([3.0])
    x2 = np.array([-1.0])
    x3 = np.array([0.0])
    x4 = np.array([1.0])
    problem = ct.Problem()
    problem.add_residual_block(
        ct.AutoDiffCostFunction(PowellF1(), 1, [1, 1]), None, x1, x2)
    problem.add_residual_block(
        ct.AutoDiffCostFunction(PowellF2(), 1, [1, 1]), None, x3, x4)
    problem.add_residual_block(
        ct.AutoDiffCostFunction(PowellF3(), 1, [1, 1]), None, x2, x3)
    problem.add_residual_block(
        ct.AutoDiffCostFunction(PowellF4(), 1, [1, 1]), None, x1, x4)
    return problem, (x1, x2, x3, x4)


@pytest.mark.parametrize("solver_type", [
    ct.LinearSolverType.DENSE_QR,
    ct.LinearSolverType.DENSE_NORMAL_CHOLESKY,
    ct.LinearSolverType.CGNR,
])
def test_powell(solver_type):
    """Powell's function: cost 1.075e+02 -> ~1e-15, x -> 0
    (nnls_tutorial.rst:380-434; reference: 15 iterations, DENSE_QR)."""
    problem, xs = make_powell_problem()
    options = ct.SolverOptions(linear_solver_type=solver_type,
                               gradient_tolerance=1e-10,
                               max_num_iterations=100)
    summary = ct.solve(options, problem)
    assert summary.is_solution_usable()
    np.testing.assert_allclose(summary.initial_cost, 107.5, rtol=1e-12)
    assert summary.final_cost < 1e-12
    for x in xs:
        assert abs(x[0]) < 2e-3


def test_powell_dogleg():
    problem, xs = make_powell_problem()
    options = ct.SolverOptions(
        trust_region_strategy_type=ct.TrustRegionStrategyType.DOGLEG,
        linear_solver_type=ct.LinearSolverType.DENSE_NORMAL_CHOLESKY,
        max_num_iterations=100)
    summary = ct.solve(options, problem)
    assert summary.final_cost < 1e-10


# Curve fitting data (examples/curve_fitting.cc:25-92): y = exp(0.3 x + 0.1)
# + gaussian noise, 67 points.
CURVE_DATA = np.array([
    0.000000e+00, 1.133898e+00, 7.500000e-02, 1.334902e+00,
    1.500000e-01, 1.213546e+00, 2.250000e-01, 1.252016e+00,
    3.000000e-01, 1.392265e+00, 3.750000e-01, 1.314458e+00,
    4.500000e-01, 1.472541e+00, 5.250000e-01, 1.536218e+00,
    6.000000e-01, 1.355679e+00, 6.750000e-01, 1.463566e+00,
    7.500000e-01, 1.490201e+00, 8.250000e-01, 1.658699e+00,
    9.000000e-01, 1.067574e+00, 9.750000e-01, 1.464629e+00,
    1.050000e+00, 1.402653e+00, 1.125000e+00, 1.713141e+00,
    1.200000e+00, 1.527021e+00, 1.275000e+00, 1.702632e+00,
    1.350000e+00, 1.423899e+00, 1.425000e+00, 1.543078e+00,
    1.500000e+00, 1.664015e+00, 1.575000e+00, 1.732484e+00,
    1.650000e+00, 1.543296e+00, 1.725000e+00, 1.959523e+00,
    1.800000e+00, 1.685132e+00, 1.875000e+00, 1.951791e+00,
    1.950000e+00, 2.095346e+00, 2.025000e+00, 2.361460e+00,
    2.100000e+00, 2.169119e+00, 2.175000e+00, 2.061745e+00,
    2.250000e+00, 2.178641e+00, 2.325000e+00, 2.104346e+00,
    2.400000e+00, 2.584470e+00, 2.475000e+00, 1.914158e+00,
    2.550000e+00, 2.368375e+00, 2.625000e+00, 2.686125e+00,
    2.700000e+00, 2.712395e+00, 2.775000e+00, 2.499511e+00,
    2.850000e+00, 2.558897e+00, 2.925000e+00, 2.309154e+00,
    3.000000e+00, 2.869503e+00, 3.075000e+00, 3.116645e+00,
    3.150000e+00, 3.094907e+00, 3.225000e+00, 2.471759e+00,
    3.300000e+00, 3.017131e+00, 3.375000e+00, 3.232381e+00,
    3.450000e+00, 2.944596e+00, 3.525000e+00, 3.385343e+00,
    3.600000e+00, 3.199826e+00, 3.675000e+00, 3.423039e+00,
    3.750000e+00, 3.621552e+00, 3.825000e+00, 3.559255e+00,
    3.900000e+00, 3.530713e+00, 3.975000e+00, 3.561766e+00,
    4.050000e+00, 3.544574e+00, 4.125000e+00, 3.867945e+00,
    4.200000e+00, 4.049776e+00, 4.275000e+00, 3.885601e+00,
    4.350000e+00, 4.110505e+00, 4.425000e+00, 4.345320e+00,
    4.500000e+00, 4.161241e+00, 4.575000e+00, 4.363407e+00,
    4.650000e+00, 4.161576e+00, 4.725000e+00, 4.619728e+00,
    4.800000e+00, 4.737410e+00, 4.875000e+00, 4.727863e+00,
    4.950000e+00, 4.669206e+00]).reshape(-1, 2)


class ExponentialResidual:
    def __init__(self, x, y):
        self.x = x
        self.y = y

    def __call__(self, m, c):
        return self.y - jnp.exp(m[0] * self.x + c[0])


def make_curve_fitting_problem(loss=None):
    m = np.array([0.0])
    c = np.array([0.0])
    problem = ct.Problem()
    for x, y in CURVE_DATA:
        problem.add_residual_block(
            ct.AutoDiffCostFunction(ExponentialResidual(x, y), 1, [1, 1]),
            loss, m, c)
    return problem, m, c


def test_curve_fitting():
    """Reference: 1.211734e+02 -> 1.056751e+00 in 13 iterations
    (nnls_tutorial.rst:512-527), m ~ 0.2917, c ~ 0.1314."""
    problem, m, c = make_curve_fitting_problem()
    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_QR,
        max_num_iterations=50)
    summary = ct.solve(options, problem)
    assert summary.is_solution_usable()
    np.testing.assert_allclose(summary.initial_cost, 1.211734e+02, rtol=1e-5)
    np.testing.assert_allclose(summary.final_cost, 1.056751e+00, rtol=1e-4)
    np.testing.assert_allclose(m[0], 0.2917, atol=2e-3)
    np.testing.assert_allclose(c[0], 0.1314, atol=2e-2)


def test_robust_curve_fitting():
    """CauchyLoss variant (examples/robust_curve_fitting.cc): final cost must
    drop and stay in the vicinity of the non-robust optimum."""
    problem, m, c = make_curve_fitting_problem(loss=ct.CauchyLoss(0.5))
    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_QR,
        max_num_iterations=50)
    summary = ct.solve(options, problem)
    assert summary.is_solution_usable()
    assert summary.final_cost < 1.0  # robustified cost at the optimum
    np.testing.assert_allclose(m[0], 0.2917, atol=0.02)


def test_bucketing_is_effective():
    """All 67 curve-fitting residual blocks share one functor class ->
    exactly one bucket, one vmapped evaluation."""
    from ceres_tpu.program import CompiledProgram
    problem, m, c = make_curve_fitting_problem()
    prog = CompiledProgram(problem)
    assert len(prog.buckets) == 1
    assert prog.buckets[0].n == 67


def test_problem_evaluate():
    problem, m, c = make_curve_fitting_problem()
    cost, residuals, gradient, jacobian = problem.evaluate(
        want_residuals=True, want_gradient=True, want_jacobian=True)
    np.testing.assert_allclose(cost, 1.211734e+02, rtol=1e-5)
    assert residuals.shape == (67,)
    np.testing.assert_allclose(residuals[0], CURVE_DATA[0, 1] - 1.0,
                               rtol=1e-12)
    assert gradient.shape == (2,)
    assert jacobian.shape == (67, 2)
    # gradient = J^T r
    np.testing.assert_allclose(gradient, jacobian.T @ residuals, rtol=1e-10)


def test_bounds_projection():
    """Bounds-constrained Rosenbrock-style: solution clamps at bounds."""
    x = np.array([3.0, -2.0])

    def f(v):
        return jnp.stack([v[0] - 10.0, v[1] + 10.0])

    problem = ct.Problem()
    problem.add_residual_block(ct.AutoDiffCostFunction(f, 2, [2]), None, x)
    problem.set_parameter_upper_bound(x, 0, 5.0)
    problem.set_parameter_lower_bound(x, 1, -4.0)
    options = ct.SolverOptions(max_num_iterations=100)
    summary = ct.solve(options, problem)
    assert summary.is_solution_usable()
    np.testing.assert_allclose(x[0], 5.0, atol=1e-6)
    np.testing.assert_allclose(x[1], -4.0, atol=1e-6)


def test_constant_blocks_and_fixed_cost():
    x = np.array([1.0])
    y = np.array([2.0])

    def f(a, b):
        return a + b

    def g(a):
        return a - 5.0

    problem = ct.Problem()
    problem.add_residual_block(
        ct.AutoDiffCostFunction(f, 1, [1, 1]), None, x, y)
    problem.add_residual_block(
        ct.AutoDiffCostFunction(g, 1, [1]), None, y)
    problem.set_parameter_block_constant(y)
    summary = ct.solve(ct.SolverOptions(), problem)
    # only x varies: minimizes (x+2)^2 -> x = -2; fixed residual (2-5).
    np.testing.assert_allclose(x[0], -2.0, atol=1e-6)
    np.testing.assert_allclose(y[0], 2.0)
    np.testing.assert_allclose(summary.final_cost, 0.5 * 9.0, atol=1e-6)


def test_numeric_diff_cost():
    x = np.array([0.5])

    def f(xx):
        return 10.0 - xx

    for method in (ct.NumericDiffMethodType.FORWARD,
                   ct.NumericDiffMethodType.CENTRAL,
                   ct.NumericDiffMethodType.RIDDERS):
        xx = np.array([0.5])
        problem = ct.Problem()
        problem.add_residual_block(
            ct.NumericDiffCostFunction(f, method, 1, [1]), None, xx)
        summary = ct.solve(ct.SolverOptions(), problem)
        np.testing.assert_allclose(xx[0], 10.0, rtol=1e-5)


def test_manifold_in_solve():
    """Optimize a quaternion to rotate [1,0,0] onto [0,1,0]."""
    from ceres_tpu import rotation as rot
    q = np.array([1.0, 0.0, 0.0, 0.0])

    def f(qq):
        p = rot.unit_quaternion_rotate_point(qq, jnp.asarray([1.0, 0.0, 0.0]))
        return p - jnp.asarray([0.0, 1.0, 0.0])

    problem = ct.Problem()
    problem.add_residual_block(ct.AutoDiffCostFunction(f, 3, [4]), None, q)
    problem.set_manifold(q, ct.QuaternionManifold())
    summary = ct.solve(ct.SolverOptions(max_num_iterations=100), problem)
    assert summary.final_cost < 1e-15
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, rtol=1e-12)
    p = np.asarray(rot.unit_quaternion_rotate_point(
        jnp.asarray(q), jnp.asarray([1.0, 0.0, 0.0])))
    np.testing.assert_allclose(p, [0.0, 1.0, 0.0], atol=1e-8)


def test_parameter_tolerance_norm_excludes_constant_blocks():
    """The reference's x_norm_ is the REDUCED program's state norm
    (constant blocks removed, trust_region_preprocessor.cc); a huge
    constant block must not inflate the parameter_tolerance threshold
    step_norm <= ptol * (x_norm + ptol)."""
    from ceres_tpu.program import CompiledProgram

    big = np.array([1e8, 1e8])          # constant calibration block
    x = np.array([3.0, 4.0])

    def f(v, b):
        return jnp.stack([v[0] - 1.0 + 0.0 * b[0], v[1] - 2.0])

    problem = ct.Problem()
    problem.add_residual_block(
        ct.AutoDiffCostFunction(f, 2, [2, 2]), None, x, big)
    problem.set_parameter_block_constant(big)
    prog = CompiledProgram(problem)
    sn = float(prog.state_norm(prog.initial_state()))
    assert abs(sn - 5.0) < 1e-9, sn     # ||x|| only, not ~1.4e8

    # end-to-end: both loop styles still converge correctly
    for fused in (True, False):
        x2 = x.copy()
        p2 = ct.Problem()
        p2.add_residual_block(
            ct.AutoDiffCostFunction(f, 2, [2, 2]), None, x2, big)
        p2.set_parameter_block_constant(big)
        s = ct.solve(ct.SolverOptions(max_num_iterations=20,
                                      fused_iterations=fused), p2)
        assert s.termination_type == ct.TerminationType.CONVERGENCE
        np.testing.assert_allclose(x2, [1.0, 2.0], atol=1e-8)
