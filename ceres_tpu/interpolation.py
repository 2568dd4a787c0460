"""Cubic Hermite interpolation of sampled functions, AD-differentiable.

Capability parity with the reference's cubic_interpolation.h:
CubicInterpolator (:124) over Grid1D (:184), BiCubicInterpolator (:252)
over Grid2D (:381). The reference evaluates value+derivative explicitly so
Jets flow through; here the interpolant is a traceable jnp function, so
jax.jacfwd differentiates it exactly (the interpolant's analytic
derivative), including inside cost functors.

Interpolation kernel (cubic_interpolation.h:63 CubicHermiteSpline):
Catmull-Rom with clamped out-of-range indexing.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _hermite(p0, p1, p2, p3, x):
    """Catmull-Rom cubic on [0,1] given 4 control points (leading axes =
    value dimensions broadcast; x scalar in [0,1])."""
    a = 0.5 * (-p0 + 3.0 * p1 - 3.0 * p2 + p3)
    b = 0.5 * (2.0 * p0 - 5.0 * p1 + 4.0 * p2 - p3)
    c = 0.5 * (-p0 + p2)
    d = p1
    return d + x * (c + x * (b + x * a))


class Grid1D:
    """cubic_interpolation.h:184: values indexed on [begin, end), clamped
    outside. data: [n] or [n, dim]."""

    def __init__(self, data, begin: int = 0, end: int = None):
        self.data = jnp.asarray(np.asarray(data, dtype=np.float64))
        if self.data.ndim == 1:
            self.data = self.data[:, None]
        self.begin = begin
        self.end = end if end is not None else begin + self.data.shape[0]

    def __call__(self, n):
        # clamp to the DECLARED range [begin, end) first
        # (cubic_interpolation.h Grid1D: n is clamped to [begin_, end_-1]
        # — end may be tighter than the backing array), then to the array
        n = jnp.clip(n, self.begin, self.end - 1)
        idx = jnp.clip(n - self.begin, 0, self.data.shape[0] - 1)
        return self.data[idx]


class CubicInterpolator:
    """cubic_interpolation.h:124. evaluate(x) -> [dim] (or scalar when the
    grid is 1-D); traceable and AD-differentiable."""

    def __init__(self, grid: Grid1D):
        if not isinstance(grid, Grid1D):
            grid = Grid1D(grid)
        self.grid = grid
        self._scalar = False

    def evaluate(self, x):
        xc = jnp.clip(x, self.grid.begin, self.grid.end - 1)
        n = jnp.floor(xc).astype(jnp.int32)
        n = jnp.clip(n, self.grid.begin, self.grid.end - 2)
        t = xc - n
        p0 = self.grid(n - 1)
        p1 = self.grid(n)
        p2 = self.grid(n + 1)
        p3 = self.grid(n + 2)
        out = _hermite(p0, p1, p2, p3, t)
        return out[0] if out.shape == (1,) else out

    def __call__(self, x):
        return self.evaluate(x)


class Grid2D:
    """cubic_interpolation.h:381. data: [rows, cols] or [rows, cols, dim],
    clamped indexing."""

    def __init__(self, data, row_begin: int = 0, row_end: int = None,
                 col_begin: int = 0, col_end: int = None):
        self.data = jnp.asarray(np.asarray(data, dtype=np.float64))
        if self.data.ndim == 2:
            self.data = self.data[:, :, None]
        self.row_begin = row_begin
        self.row_end = (row_end if row_end is not None
                        else row_begin + self.data.shape[0])
        self.col_begin = col_begin
        self.col_end = (col_end if col_end is not None
                        else col_begin + self.data.shape[1])

    def __call__(self, r, c):
        # declared [row_begin, row_end) x [col_begin, col_end) first,
        # then the backing array extent (cubic_interpolation.h Grid2D)
        r = jnp.clip(r, self.row_begin, self.row_end - 1)
        c = jnp.clip(c, self.col_begin, self.col_end - 1)
        ri = jnp.clip(r - self.row_begin, 0, self.data.shape[0] - 1)
        ci = jnp.clip(c - self.col_begin, 0, self.data.shape[1] - 1)
        return self.data[ri, ci]


class BiCubicInterpolator:
    """cubic_interpolation.h:252: separable bicubic (rows then columns)."""

    def __init__(self, grid: Grid2D):
        if not isinstance(grid, Grid2D):
            grid = Grid2D(grid)
        self.grid = grid

    def evaluate(self, r, c):
        rc = jnp.clip(r, self.grid.row_begin, self.grid.row_end - 1)
        cc = jnp.clip(c, self.grid.col_begin, self.grid.col_end - 1)
        rn = jnp.clip(jnp.floor(rc).astype(jnp.int32), self.grid.row_begin,
                      self.grid.row_end - 2)
        cn = jnp.clip(jnp.floor(cc).astype(jnp.int32), self.grid.col_begin,
                      self.grid.col_end - 2)
        tr = rc - rn
        tc = cc - cn
        rows = []
        for dr in (-1, 0, 1, 2):
            p = [self.grid(rn + dr, cn + dc) for dc in (-1, 0, 1, 2)]
            rows.append(_hermite(p[0], p[1], p[2], p[3], tc))
        out = _hermite(rows[0], rows[1], rows[2], rows[3], tr)
        return out[0] if out.shape == (1,) else out

    def __call__(self, r, c):
        return self.evaluate(r, c)
