"""General unconstrained minimization: GradientProblem + solver.

Capability parity with the reference's GradientProblem
(include/ceres/gradient_problem.h:92), FirstOrderFunction
(first_order_function.h:40), GradientProblemSolver
(gradient_problem_solver.cc:103-167) and GradientProblemEvaluator
(gradient_problem_evaluator.h:48). The reference's autodiff/numeric-diff
first-order wrappers collapse into jax.value_and_grad.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import config
from .manifolds import Manifold
from .minimizers.line_search import minimize_line_search
from .types import (MinimizerType, SolverOptions, SolverSummary,
                    TerminationType)


class FirstOrderFunction:
    """User cost: either subclass with a traceable `cost(x)->scalar`, or
    supply explicit `cost_and_gradient` (the analytic path)."""

    def __init__(self, num_parameters: int):
        self._num_parameters = int(num_parameters)

    @property
    def num_parameters(self) -> int:
        return self._num_parameters

    def cost(self, x):
        raise NotImplementedError

    def cost_and_gradient(self, x):
        c, g = jax.value_and_grad(self.cost)(x)
        return c, g


class AutoDiffFirstOrderFunction(FirstOrderFunction):
    """Build a FirstOrderFunction from a plain scalar functor; the gradient
    comes from JAX AD (the Jet role — reference
    autodiff_first_order_function.h:105)."""

    def __init__(self, functor, num_parameters: int):
        super().__init__(num_parameters)
        self._functor = functor

    def cost(self, x):
        return jnp.reshape(jnp.asarray(self._functor(x)), ())


class NumericDiffFirstOrderFunction(FirstOrderFunction):
    """FirstOrderFunction with a finite-difference gradient (reference
    numeric_diff_first_order_function.h). For functors whose gradient JAX
    AD cannot produce (non-differentiable primitives, lookups); the
    stencil itself is traceable and runs as one batched evaluation, like
    NumericDiffCostFunction (cost.py)."""

    def __init__(self, functor, num_parameters: int,
                 method=None, options=None):
        from .types import NumericDiffMethodType
        from .cost import NumericDiffOptions
        super().__init__(num_parameters)
        self._functor = functor
        self._method = method or NumericDiffMethodType.CENTRAL
        self._options = options or NumericDiffOptions()

    def cost(self, x):
        return jnp.reshape(jnp.asarray(self._functor(x)), ())

    def cost_and_gradient(self, x):
        from .types import NumericDiffMethodType
        c = self.cost(x)
        if self._method == NumericDiffMethodType.RIDDERS:
            # Ridders extrapolation, reusing the vectorized stencil from
            # cost.py (numeric_diff.h EvaluateRiddersJacobianColumn) on
            # the cost viewed as a 1-residual functor.
            if not hasattr(self, "_ridders_jfn"):
                from .cost import NumericDiffCostFunction
                fn = self._functor
                nd = NumericDiffCostFunction(
                    lambda xx: jnp.reshape(jnp.asarray(fn(xx)), (1,)),
                    method=NumericDiffMethodType.RIDDERS,
                    num_residuals=1,
                    parameter_block_sizes=[self.num_parameters],
                    options=self._options)
                rfn = nd.make_residual_fn()
                jfn = nd.jacobian_of(rfn, 0)
                self._ridders_jfn = (nd.block_data(), jfn)
            data, jfn = self._ridders_jfn
            return c, jfn(data, (x,))[0]
        step = self._options.relative_step_size * jnp.maximum(
            jnp.abs(x), 1.0)
        eye = jnp.eye(x.shape[0], dtype=x.dtype)
        if self._method == NumericDiffMethodType.FORWARD:
            probes = jax.vmap(
                lambda e, h: self.cost(x + h * e))(eye, step)
            return c, (probes - c) / step
        fp = jax.vmap(lambda e, h: self.cost(x + h * e))(eye, step)
        fm = jax.vmap(lambda e, h: self.cost(x - h * e))(eye, step)
        return c, (fp - fm) / (2.0 * step)


class GradientProblem:
    """gradient_problem.h:92. Optionally carries a Manifold."""

    def __init__(self, function: FirstOrderFunction,
                 manifold: Optional[Manifold] = None):
        self.function = function
        self.manifold = manifold
        if manifold is not None and \
                manifold.ambient_size != function.num_parameters:
            raise ValueError("manifold ambient size mismatch")

    @property
    def num_parameters(self):
        return self.function.num_parameters

    @property
    def num_tangent_parameters(self):
        return (self.manifold.tangent_size if self.manifold
                else self.function.num_parameters)


class _GradientProgram:
    """Adapter presenting GradientProblem with the CompiledProgram surface
    the line-search minimizer consumes (gradient_problem_evaluator.h:48:
    tangent-space gradient via MinusJacobian^T ... here PlusJacobian^T)."""

    def __init__(self, gp: GradientProblem, x0: np.ndarray, dtype):
        self.gp = gp
        self.dtype = dtype
        self._x0 = np.asarray(x0, dtype=np.float64)
        self.num_effective = gp.num_tangent_parameters
        self.has_bounds = False
        self._out = None

    def initial_state(self):
        return jnp.asarray(self._x0, dtype=self.dtype)

    def plus(self, x, delta):
        if self.gp.manifold is None:
            return x + delta
        return self.gp.manifold.plus(x, delta)

    def cost_and_gradient_fn(self, x):
        c, g_ambient = self.gp.function.cost_and_gradient(x)
        if self.gp.manifold is None:
            return c, g_ambient
        # tangent gradient = PlusJacobian(x)^T g_ambient
        Jp = self.gp.manifold.plus_jacobian(x)
        return c, Jp.T @ g_ambient

    def write_back(self, x):
        self._out = np.asarray(x)


def solve_gradient_problem(options: SolverOptions, problem: GradientProblem,
                           parameters: np.ndarray,
                           summary: Optional[SolverSummary] = None
                           ) -> SolverSummary:
    """GradientProblemSolver::Solve (gradient_problem_solver.cc:103).
    `parameters` is updated in place."""
    if summary is None:
        summary = SolverSummary()
    t0 = time.time()
    err = options.validate()
    if err is not None:
        summary.termination_type = TerminationType.FAILURE
        summary.message = f"Invalid options: {err}"
        return summary

    summary.minimizer_type = MinimizerType.LINE_SEARCH
    summary.line_search_direction_type = options.line_search_direction_type
    summary.num_parameters = problem.num_parameters
    summary.num_effective_parameters = problem.num_tangent_parameters

    prog = _GradientProgram(problem, parameters, config.default_dtype())
    x = minimize_line_search(prog, options, summary)
    if summary.is_solution_usable():
        parameters[:] = np.asarray(x)
    summary.total_time_in_seconds = time.time() - t0
    return summary


class GradientProblemSolver:
    Options = SolverOptions
    Summary = SolverSummary

    def solve(self, options, problem, parameters, summary=None):
        return solve_gradient_problem(options, problem, parameters, summary)
