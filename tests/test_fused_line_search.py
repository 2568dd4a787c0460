"""Fused device-loop line-search minimizer (minimizers/line_search_fused)
vs the host loop: same problems, same options, matching minima.

The fused loop mirrors line_search_minimizer.cc's control flow in traced
arithmetic; these tests pin the equivalence across every direction type,
both line searches, and all three NLCG betas, plus the GradientProblem
entry path and the host-loop-feature fallback."""

import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct


class _Rosenbrock(ct.FirstOrderFunction):
    def cost(self, x):
        return (1.0 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2


def _solve_rosenbrock(fused, **kw):
    params = np.array([-1.2, 1.0])
    gp = ct.GradientProblem(_Rosenbrock(2))
    kw = {"max_num_iterations": 200, **kw}
    opts = ct.SolverOptions(minimizer_type=ct.MinimizerType.LINE_SEARCH,
                            fused_iterations=fused, **kw)
    summary = ct.solve_gradient_problem(opts, gp, params)
    return params, summary


def test_fused_rosenbrock_lbfgs_wolfe():
    params, summary = _solve_rosenbrock(True)
    assert summary.is_solution_usable(), summary.message
    np.testing.assert_allclose(params, [1.0, 1.0], atol=1e-5)
    ph, sh = _solve_rosenbrock(False)
    # same minimum as the host loop, comparable effort
    np.testing.assert_allclose(params, ph, atol=1e-5)
    assert summary.num_successful_steps > 5


@pytest.mark.parametrize("direction,search", [
    (ct.LineSearchDirectionType.STEEPEST_DESCENT,
     ct.LineSearchType.ARMIJO),
    (ct.LineSearchDirectionType.STEEPEST_DESCENT,
     ct.LineSearchType.WOLFE),
    (ct.LineSearchDirectionType.NONLINEAR_CONJUGATE_GRADIENT,
     ct.LineSearchType.WOLFE),
    (ct.LineSearchDirectionType.BFGS, ct.LineSearchType.WOLFE),
    (ct.LineSearchDirectionType.LBFGS, ct.LineSearchType.ARMIJO),
    (ct.LineSearchDirectionType.LBFGS, ct.LineSearchType.WOLFE),
])
def test_fused_directions_on_quadratic(direction, search):
    class Quad(ct.FirstOrderFunction):
        def cost(self, x):
            return jnp.sum((x - jnp.asarray([1.0, -2.0, 3.0])) ** 2
                           * jnp.asarray([1.0, 10.0, 100.0]))

    params = np.zeros(3)
    gp = ct.GradientProblem(Quad(3))
    opts = ct.SolverOptions(
        minimizer_type=ct.MinimizerType.LINE_SEARCH,
        line_search_direction_type=direction,
        line_search_type=search,
        max_num_iterations=500, function_tolerance=1e-14,
        gradient_tolerance=1e-12, fused_iterations=True)
    summary = ct.solve_gradient_problem(opts, gp, params)
    assert summary.is_solution_usable(), summary.message
    np.testing.assert_allclose(params, [1.0, -2.0, 3.0], atol=1e-4)


@pytest.mark.parametrize("beta", [
    ct.NonlinearConjugateGradientType.FLETCHER_REEVES,
    ct.NonlinearConjugateGradientType.POLAK_RIBIERE,
    ct.NonlinearConjugateGradientType.HESTENES_STIEFEL,
])
def test_fused_nlcg_betas(beta):
    kw = dict(
        line_search_direction_type=(
            ct.LineSearchDirectionType.NONLINEAR_CONJUGATE_GRADIENT),
        nonlinear_conjugate_gradient_type=beta,
        max_num_line_search_direction_restarts=20)
    params, summary = _solve_rosenbrock(True, **kw)
    assert summary.is_solution_usable(), summary.message
    np.testing.assert_allclose(params, [1.0, 1.0], atol=5e-3)
    # and the fused trajectory lands where the host loop lands (not
    # bit-exact: traced guards reorder a few last-bit operations, which
    # NLCG on Rosenbrock amplifies — both are valid minimizers)
    params_h, _ = _solve_rosenbrock(False, **kw)
    np.testing.assert_allclose(params, params_h, atol=1e-4)


def test_fused_lbfgs_eigenvalue_scaling():
    params, summary = _solve_rosenbrock(
        True, use_approximate_eigenvalue_bfgs_scaling=True)
    assert summary.is_solution_usable(), summary.message
    np.testing.assert_allclose(params, [1.0, 1.0], atol=1e-5)


def test_fused_ls_on_nlls_problem():
    """LINE_SEARCH minimizer over a residual Problem through ct.solve."""
    def build():
        rng = np.random.default_rng(11)
        xd = np.linspace(0, 5, 40)
        yd = np.exp(0.3 * xd + 0.1) + 0.01 * rng.standard_normal(40)
        prob = ct.Problem()
        mc = np.zeros(2)

        class R:
            def __init__(self, x, y):
                self.x, self.y = x, y

            def __call__(self, mc):
                return self.y - jnp.exp(mc[0] * self.x + mc[1])

        for x, y in zip(xd, yd):
            prob.add_residual_block(
                ct.AutoDiffCostFunction(R(x, y), 1, [2]), None, mc)
        return prob, mc

    prob_f, mc_f = build()
    s_f = ct.solve(ct.SolverOptions(
        minimizer_type=ct.MinimizerType.LINE_SEARCH,
        max_num_iterations=300, fused_iterations=True), prob_f)
    prob_h, mc_h = build()
    s_h = ct.solve(ct.SolverOptions(
        minimizer_type=ct.MinimizerType.LINE_SEARCH,
        max_num_iterations=300), prob_h)
    assert s_f.is_solution_usable(), s_f.message
    np.testing.assert_allclose(mc_f, mc_h, atol=1e-5)
    assert abs(s_f.final_cost - s_h.final_cost) <= 1e-8 * (
        1 + abs(s_h.final_cost))


def test_fused_ls_host_loop_fallback():
    """Host-loop-only features (callbacks) must keep per-iteration
    records even with fused_iterations=True."""
    seen = []

    def cb(it):
        seen.append(it.iteration)
        return ct.CallbackReturnType.SOLVER_CONTINUE

    params, summary = _solve_rosenbrock(True, callbacks=[cb])
    assert summary.is_solution_usable(), summary.message
    assert len(seen) > 5          # host loop ran, callbacks fired
    np.testing.assert_allclose(params, [1.0, 1.0], atol=1e-5)


def test_fused_ls_max_iterations():
    params, summary = _solve_rosenbrock(True, max_num_iterations=3)
    assert summary.termination_type == ct.TerminationType.NO_CONVERGENCE
    assert "Maximum number of iterations" in summary.message
