"""Dense linear solver benchmark (reference
internal/ceres/dense_linear_solver_benchmark.cc): QR vs normal-Cholesky
solve times over problem sizes, plus mixed-precision Cholesky.

Usage: python -m benchmarks.dense_linear_solver_benchmark [--cpu]
"""

from __future__ import annotations

import sys

from .common import bench, block, setup_platform


def main(argv=None):
    jax = setup_platform()
    import jax.numpy as jnp
    import numpy as np

    dname = jax.devices()[0].platform
    rng = np.random.default_rng(0)
    for (rows, cols) in [(512, 128), (2048, 512), (8192, 1024)]:
        A = jnp.asarray(rng.normal(size=(rows, cols)))
        b = jnp.asarray(rng.normal(size=(rows,)))

        qr = jax.jit(lambda A, b: jnp.linalg.lstsq(A, b)[0])
        block(qr(A, b))
        bench(f"DenseQR_{rows}x{cols}", lambda: block(qr(A, b)),
              device=dname)

        def nc(A, b):
            H = A.T @ A + jnp.eye(cols, dtype=A.dtype)
            L = jnp.linalg.cholesky(H)
            y = jax.scipy.linalg.solve_triangular(L, A.T @ b, lower=True)
            return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

        ncj = jax.jit(nc)
        block(ncj(A, b))
        bench(f"DenseNormalCholesky_{rows}x{cols}",
              lambda: block(ncj(A, b)), device=dname)

        def nc_mixed(A, b):
            Af = A.astype(jnp.float32)
            H = (Af.T @ Af).astype(jnp.float32) \
                + jnp.eye(cols, dtype=jnp.float32)
            L = jnp.linalg.cholesky(H)
            y = jax.scipy.linalg.solve_triangular(
                L, (Af.T @ b.astype(jnp.float32)), lower=True)
            return jax.scipy.linalg.solve_triangular(
                L.T, y, lower=False).astype(A.dtype)

        ncm = jax.jit(nc_mixed)
        block(ncm(A, b))
        bench(f"DenseNormalCholeskyMixed_{rows}x{cols}",
              lambda: block(ncm(A, b)), device=dname)
    return 0


if __name__ == "__main__":
    sys.exit(main())
