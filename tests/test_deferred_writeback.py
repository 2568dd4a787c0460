"""defer_parameter_writeback + device-resident initial-state cache."""

import numpy as np

import ceres_tpu as ct
from ceres_tpu.cost import AutoDiffCostFunction
from ceres_tpu.program import CompiledProgram


def _build(x0=5.0, y0=3.0):
    problem = ct.Problem()
    x = np.array([x0])
    y = np.array([y0])

    def f(x, y):
        return [x[0] + 10.0 * y[0]]

    def g(x, y):
        return [x[0] - y[0] - 2.0]

    problem.add_residual_block(AutoDiffCostFunction(f, 1, [1, 1]), None, x, y)
    problem.add_residual_block(AutoDiffCostFunction(g, 1, [1, 1]), None, x, y)
    return problem, x, y


def test_deferred_writeback_leaves_params_until_write_back():
    problem, x, y = _build()
    opts = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_QR,
        fused_iterations=True, defer_parameter_writeback=True)
    s = ct.solve(opts, problem)
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    # user arrays untouched until write_back()
    assert x[0] == 5.0 and y[0] == 3.0
    s.write_back()
    # solution of the 2x2 linear system: x = 20/11, y = -2/11... solved to
    # the LSQ minimum; just check the residuals are (near) zero now.
    assert abs(x[0] + 10.0 * y[0]) < 1e-6
    assert abs(x[0] - y[0] - 2.0) < 1e-6
    # second write_back is a no-op
    x_after = x.copy()
    s.write_back()
    np.testing.assert_array_equal(x, x_after)


def test_default_solve_still_writes_back():
    problem, x, y = _build()
    opts = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_QR,
        fused_iterations=True)
    s = ct.solve(opts, problem)
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    assert abs(x[0] + 10.0 * y[0]) < 1e-6
    s.write_back()  # no-op on a non-deferred summary


def test_initial_state_device_cache_hits_on_same_content():
    problem, x, y = _build()
    prog = CompiledProgram(problem)
    x1 = prog.initial_state()
    x2 = prog.initial_state()
    assert x1 is x2          # content unchanged -> same device buffer
    x[0] = 7.0
    x3 = prog.initial_state()
    assert x3 is not x1
    assert float(np.asarray(x3)[prog.amb_offset[id(x)]]) == 7.0
    x[0] = 5.0
    x4 = prog.initial_state()
    np.testing.assert_array_equal(np.asarray(x4), np.asarray(x1))
