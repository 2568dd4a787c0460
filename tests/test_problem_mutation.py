"""Problem graph mutation (reference problem.h: RemoveResidualBlock,
RemoveParameterBlock, enable_fast_removal, re-solve after structural
edits)."""

import jax.numpy as jnp
import numpy as np

import ceres_tpu as ct


def _make(n=6, fast=False):
    xs = np.linspace(0.0, 2.0, n)
    ys = 2.0 * xs + 1.0

    class R:
        def __init__(self, x, y):
            self.x = x
            self.y = y

        def __call__(self, m, c):
            return self.y - (m[0] * self.x + c[0])

    m = np.array([0.0])
    c = np.array([0.0])
    problem = ct.Problem(ct.ProblemOptions(enable_fast_removal=fast))
    rbs = []
    for x, y in zip(xs, ys):
        rbs.append(problem.add_residual_block(
            ct.AutoDiffCostFunction(R(float(x), float(y)), 1, [1, 1]),
            None, m, c))
    return problem, m, c, rbs


def test_remove_residual_block_and_resolve():
    problem, m, c, rbs = _make()
    n0 = problem.num_residual_blocks()
    problem.remove_residual_block(rbs[2])
    problem.remove_residual_block(rbs[4])
    assert problem.num_residual_blocks() == n0 - 2
    s = ct.solve(ct.SolverOptions(), problem)
    assert s.is_solution_usable()
    # still an exact linear fit
    np.testing.assert_allclose([m[0], c[0]], [2.0, 1.0], atol=1e-10)
    assert s.num_residuals == n0 - 2


def test_remove_parameter_block_drops_dependent_residuals():
    problem, m, c, rbs = _make()
    extra = np.array([5.0])

    def g(e, mm):
        return e - mm

    rb_extra = problem.add_residual_block(
        ct.AutoDiffCostFunction(g, 1, [1, 1]), None, extra, m)
    n0 = problem.num_residual_blocks()
    problem.remove_parameter_block(extra)
    assert problem.num_residual_blocks() == n0 - 1
    s = ct.solve(ct.SolverOptions(), problem)
    assert s.is_solution_usable()
    np.testing.assert_allclose([m[0], c[0]], [2.0, 1.0], atol=1e-10)


def test_fast_removal_introspection():
    problem, m, c, rbs = _make(fast=True)
    assocs = problem.get_residual_blocks_for_parameter_block(m)
    assert len(assocs) == len(rbs)
    got = problem.get_parameter_blocks_for_residual_block(rbs[0])
    assert len(got) == 2


def test_structure_edit_invalidates_compiled_program():
    """Re-solving after a structural edit must recompile, not reuse the
    stale executable (problem revision tracking)."""
    problem, m, c, rbs = _make()
    s1 = ct.solve(ct.SolverOptions(), problem)
    cost1 = s1.final_cost
    problem.remove_residual_block(rbs[0])
    m[0] = 0.0
    c[0] = 0.0
    s2 = ct.solve(ct.SolverOptions(), problem)
    assert s2.num_residuals == s1.num_residuals - 1
    np.testing.assert_allclose([m[0], c[0]], [2.0, 1.0], atol=1e-10)
