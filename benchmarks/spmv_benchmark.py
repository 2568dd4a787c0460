"""Block-sparse SpMV benchmark (reference internal/ceres/spmv_benchmark.cc:
RightMultiplyAndAccumulate / LeftMultiplyAndAccumulate on BAL-structured
block Jacobians).

Usage: python -m benchmarks.spmv_benchmark [--cpu]
"""

from __future__ import annotations

import sys

from .common import bench, block, setup_platform


def main(argv=None):
    jax = setup_platform()
    import jax.numpy as jnp
    from ceres_tpu.io.bal import synthetic_bal_problem, \
        build_bal_ceres_problem
    from ceres_tpu.program import CompiledProgram

    dname = jax.devices()[0].platform
    for (ncam, npts, nobs) in [(16, 5000, 20000), (49, 15000, 60000)]:
        bal = synthetic_bal_problem(ncam, npts, nobs, seed=3,
                                    pixel_noise=1.0)
        problem, _, _ = build_bal_ceres_problem(bal)
        prog = CompiledProgram(problem)
        x = prog.initial_state()
        lin = prog.cached_jit(
            "spmv_lin", lambda: prog.jit_with_consts(
                lambda xx: prog.linearize_fn(xx)[2:4], (x,)))
        jac, res = block(lin(x))

        v = jnp.ones((prog.num_effective,), dtype=prog.dtype)
        mv = prog.jit_with_consts(lambda jc, vv: jc.matvec(vv), (jac, v))
        block(mv(jac, v))
        bench(f"SpMV_Jv_{ncam}x{npts}", lambda: block(mv(jac, v)),
              device=dname, nnz_blocks=nobs)

        rmv = prog.jit_with_consts(lambda jc, w: jc.rmatvec(w), (jac, res))
        block(rmv(jac, res))
        bench(f"SpMV_Jtw_{ncam}x{npts}", lambda: block(rmv(jac, res)),
              device=dname, nnz_blocks=nobs)

        sq = prog.jit_with_consts(
            lambda jc: jc.squared_column_norms(), (jac,))
        block(sq(jac))
        bench(f"SquaredColumnNorms_{ncam}x{npts}", lambda: block(sq(jac)),
              device=dname)
    return 0


if __name__ == "__main__":
    sys.exit(main())
