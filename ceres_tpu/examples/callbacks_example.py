"""Callback demos (reference examples/iteration_callback_example.cc and
examples/evaluation_callback_example.cc).

1. IterationCallback: per-iteration trace records + early termination.
2. EvaluationCallback: shared-state caching — prepare_for_evaluation() is
   invoked before every device evaluation, letting user code precompute
   quantities shared by many residual blocks exactly once per point
   (evaluation_callback.h:63 contract).

CLI: python -m ceres_tpu.examples.callbacks_example {iteration,evaluation}
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np


def iteration_callback_demo():
    import ceres_tpu as ct

    xs = np.linspace(0.0, 5.0, 40)
    ys = np.exp(0.3 * xs + 0.1)

    class Residual:
        def __init__(self, x, y):
            self.x = x
            self.y = y

        def __call__(self, m, c):
            return self.y - jnp.exp(m[0] * self.x + c[0])

    m = np.array([0.0])
    c = np.array([0.0])
    problem = ct.Problem()
    for x, y in zip(xs, ys):
        problem.add_residual_block(
            ct.AutoDiffCostFunction(Residual(float(x), float(y)), 1, [1, 1]),
            None, m, c)

    trace = []

    def record(it):
        trace.append((it.iteration, it.cost, it.trust_region_radius))
        # Stop once the cost is tiny (SOLVER_TERMINATE_SUCCESSFULLY).
        if it.cost < 1e-12:
            return ct.CallbackReturnType.SOLVER_TERMINATE_SUCCESSFULLY
        return ct.CallbackReturnType.SOLVER_CONTINUE

    options = ct.SolverOptions(callbacks=[record], max_num_iterations=100)
    summary = ct.solve(options, problem)
    print(summary.brief_report())
    for (i, cost, radius) in trace:
        print(f"iter {i:3d}  cost {cost:.6e}  radius {radius:.1e}")
    return trace, summary


def evaluation_callback_demo():
    import ceres_tpu as ct

    calls = {"new_point": 0, "same_point": 0}

    class MyEvaluationCallback:
        """Counts evaluation-point changes — a stand-in for recomputing
        shared quantities (evaluation_callback_example.cc caches a common
        subexpression here)."""

        def prepare_for_evaluation(self, evaluate_jacobians,
                                   new_evaluation_point):
            if new_evaluation_point:
                calls["new_point"] += 1
            else:
                calls["same_point"] += 1

    def f(x):
        return jnp.stack([x[0] - 3.0, 10.0 * (x[1] - x[0] * x[0])])

    x = np.array([0.0, 0.0])
    problem = ct.Problem()
    problem.add_residual_block(ct.AutoDiffCostFunction(f, 2, [2]), None, x)
    options = ct.SolverOptions(
        evaluation_callback=MyEvaluationCallback(), max_num_iterations=100)
    summary = ct.solve(options, problem)
    print(summary.brief_report())
    print(f"prepare_for_evaluation: {calls['new_point']} new-point, "
          f"{calls['same_point']} same-point calls")
    return calls, summary


def main(argv=None):
    which = (sys.argv[1:] if argv is None else argv) or ["iteration"]
    if which[0] == "evaluation":
        evaluation_callback_demo()
    else:
        iteration_callback_demo()


if __name__ == "__main__":
    main()
