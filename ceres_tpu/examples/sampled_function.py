"""Sampled-function and bicubic-interpolation cost examples
(reference examples/sampled_function.cc and
examples/bicubic_interpolation.cc).

1D: minimize a CubicInterpolator over samples of f(x) = (x - 4.5)^2 —
the interpolator is JAX-traceable so it sits directly inside an autodiff
cost. 2D: recover a translation that aligns noisy samples of a smooth
surface via BiCubicInterpolator.

CLI: python -m ceres_tpu.examples.sampled_function [1d|2d]
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sampled_function_1d():
    import ceres_tpu as ct
    from ceres_tpu.cost import AutoDiffCostFunction
    from ceres_tpu.interpolation import CubicInterpolator, Grid1D

    values = np.array([(i - 4.5) ** 2 for i in range(10)])
    interpolator = CubicInterpolator(Grid1D(values))

    class InterpolatedCost:
        def __call__(self, x):
            return jnp.reshape(interpolator(x[0]), (1,))

    x = np.array([1.0])
    problem = ct.Problem()
    problem.add_residual_block(
        AutoDiffCostFunction(InterpolatedCost(), 1, [1]), None, x)
    summary = ct.solve(ct.SolverOptions(max_num_iterations=100), problem)
    print(summary.brief_report())
    print(f"x: 1.0 -> {x[0]:.6g} (expected 4.5)")
    return float(x[0]), summary


def bicubic_2d():
    """Recover a 2D shift from 4 sampled values of f(x, y) = x^2 - yx + y^2
    interpolated bicubically on a grid with negative index offsets
    (examples/bicubic_interpolation.cc)."""
    import ceres_tpu as ct
    from ceres_tpu.cost import AutoDiffCostFunction
    from ceres_tpu.interpolation import BiCubicInterpolator, Grid2D

    def f(x, y):
        return x * x - y * x + y * y

    rows_half, cols_half = 9, 11
    yy, xx = np.meshgrid(np.arange(-rows_half, rows_half + 1),
                         np.arange(-cols_half, cols_half + 1), indexing="ij")
    data = f(xx.astype(float), yy.astype(float))
    interp = BiCubicInterpolator(Grid2D(
        data, row_begin=-rows_half, row_end=rows_half + 1,
        col_begin=-cols_half, col_end=cols_half + 1))

    true_shift = np.array([1.234, 2.345])
    points = np.array([[-2.0, -3.0], [-2.0, 3.0], [2.0, 3.0], [2.0, -3.0]])

    class BiCubicCost:
        def __init__(self, px, py, value):
            self.px = px
            self.py = py
            self.value = value

        def __call__(self, s):
            v = interp(self.py + s[1], self.px + s[0])
            return jnp.reshape(v - self.value, (1,))

    shift = np.array([3.1415, 1.337])
    problem = ct.Problem()
    for p in points:
        sx, sy = p + true_shift
        problem.add_residual_block(
            AutoDiffCostFunction(
                BiCubicCost(float(p[0]), float(p[1]), float(f(sx, sy))),
                1, [2]),
            None, shift)
    summary = ct.solve(ct.SolverOptions(max_num_iterations=100), problem)
    print(summary.brief_report())
    print(f"shift found: ({shift[0]:.4g}, {shift[1]:.4g}) "
          f"(expected {tuple(true_shift)})")
    return shift, summary


def main(argv=None):
    import sys
    which = (argv or sys.argv[1:] or ["1d"])[0]
    if which == "2d":
        bicubic_2d()
    else:
        sampled_function_1d()


if __name__ == "__main__":
    main()
