"""Gradient checking: user Jacobians vs numeric differentiation.

Capability parity with the reference's GradientChecker
(include/ceres/gradient_checker.h:68, internal/ceres/gradient_checker.cc)
and the gradient-checking solve mode (solver.h check_gradients ->
GradientCheckingCostFunction wrappers, gradient_checking_cost_function.cc).

Comparison happens in tangent space via the manifolds' PlusJacobian
(gradient_checker.cc:176), matching the reference.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .cost import NumericDiffCostFunction, NumericDiffOptions
from .manifolds import Manifold
from .types import NumericDiffMethodType


class ProbeResults(NamedTuple):
    return_value: bool
    residuals: np.ndarray
    jacobians: List[np.ndarray]           # tangent-space, user-provided
    numeric_jacobians: List[np.ndarray]   # tangent-space, numeric
    local_jacobians: List[np.ndarray]     # alias of jacobians (ref naming)
    maximum_relative_error: float
    error_log: str


class GradientChecker:
    """gradient_checker.h:68."""

    def __init__(self, cost_function,
                 manifolds: Optional[List[Optional[Manifold]]] = None,
                 numeric_diff_options: Optional[NumericDiffOptions] = None):
        self.cost = cost_function
        self.manifolds = manifolds or [None] * len(
            cost_function.parameter_block_sizes)
        self.options = numeric_diff_options or NumericDiffOptions()

    def probe(self, parameters, relative_precision: float) -> ProbeResults:
        cost = self.cost
        sizes = cost.parameter_block_sizes
        params = [jnp.asarray(np.asarray(p, dtype=np.float64))
                  for p in parameters]
        data = cost.block_data()
        rfn = cost.make_residual_fn()

        residuals = np.asarray(rfn(_to_jnp(data), *params))

        # user-side Jacobians: analytic if provided, else jacfwd (which is
        # what the solver uses).
        user_jacs = []
        if hasattr(cost, "jacobians") and type(cost).jacobians.__qualname__ \
                .split(".")[0] != "SizedCostFunction":
            Jambs = cost.jacobians(*params)
        else:
            def f(*ps):
                return rfn(_to_jnp(data), *ps)
            Jambs = jax.jacfwd(f, argnums=tuple(range(len(params))))(*params)
        for i, (J, m) in enumerate(zip(Jambs, self.manifolds)):
            J = jnp.asarray(J).reshape(cost.num_residuals, sizes[i])
            if m is not None:
                J = J @ m.plus_jacobian(params[i])
            user_jacs.append(np.asarray(J))

        # numeric Jacobians via central differences (gradient_checker.cc
        # uses CENTRAL / RIDDERS through NumericDiffCostFunction).
        nd = NumericDiffCostFunction(
            lambda *ps: rfn(_to_jnp(data), *ps),
            NumericDiffMethodType.CENTRAL, cost.num_residuals, sizes,
            options=self.options)
        num_jacs = []
        for i, m in enumerate(self.manifolds):
            jfn = nd.jacobian_of(lambda d, *ps: rfn(_to_jnp(data), *ps), i)
            J = jnp.asarray(jfn((), params))
            if m is not None:
                J = J @ m.plus_jacobian(params[i])
            num_jacs.append(np.asarray(J))

        max_rel = 0.0
        log = []
        for i, (Ju, Jn) in enumerate(zip(user_jacs, num_jacs)):
            denom = np.maximum(np.abs(Ju) + np.abs(Jn), 1e-12)
            rel = np.abs(Ju - Jn) / denom
            worst = float(rel.max()) if rel.size else 0.0
            max_rel = max(max_rel, worst)
            if worst > relative_precision:
                log.append(
                    f"Jacobian for parameter block {i} disagrees: max "
                    f"relative error {worst:e} > {relative_precision:e}")
        ok = not log
        return ProbeResults(ok, residuals, user_jacs, num_jacs, user_jacs,
                            max_rel, "\n".join(log))


def _to_jnp(data):
    if data == () or data == {}:
        return data
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if isinstance(a, (np.ndarray, float, int))
        else a, data)


def check_problem_gradients(problem, relative_precision: float = 1e-8
                            ) -> Optional[str]:
    """Solver gradient-checking mode (options.check_gradients): probe every
    residual block's Jacobian at the current values; returns an error string
    on the first failure, else None. The reference wraps every evaluation
    (gradient_checking_cost_function.cc) and aborts mid-solve; here the
    check runs once at the initial point before the solve starts — the
    Jacobian code is iteration-independent under jit, so one probe covers
    the program."""
    for rb in problem._residual_records():
        manifolds = [problem._blocks[k].manifold for k in rb.param_keys]
        checker = GradientChecker(rb.cost, manifolds)
        params = [problem._blocks[k].array for k in rb.param_keys]
        results = checker.probe(params, relative_precision)
        if not results.return_value:
            return (f"Gradient check failed for residual block "
                    f"{rb.index}:\n{results.error_log}")
    return None
