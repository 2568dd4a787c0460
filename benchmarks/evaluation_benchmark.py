"""Evaluation benchmark (reference internal/ceres/evaluation_benchmark.cc:
Residuals, ResidualsAndJacobian, Plus, implicit-Schur multiplies, power-
series preconditioner, JtJ block diagonal — on a BAL workload).

Usage: python -m benchmarks.evaluation_benchmark [--cpu]
       [--cameras N --points N --observations N]
"""

from __future__ import annotations

import sys

from .common import bench, block, setup_platform


def main(argv=None):
    jax = setup_platform()
    import jax.numpy as jnp
    import numpy as np
    import ceres_tpu as ct
    from ceres_tpu.io.bal import synthetic_bal_problem, \
        build_bal_ceres_problem
    from ceres_tpu.program import CompiledProgram
    from ceres_tpu.ops.bsr import block_diag_jtj
    from ceres_tpu.solvers.schur import SchurOps, detect_schur_structure

    args = sys.argv[1:] if argv is None else argv

    def intarg(name, default):
        return int(args[args.index(name) + 1]) if name in args else default

    ncam = intarg("--cameras", 16)
    npts = intarg("--points", 5000)
    nobs = intarg("--observations", 20000)

    bal = synthetic_bal_problem(ncam, npts, nobs, seed=7, pixel_noise=1.0)
    problem, cams, pts = build_bal_ceres_problem(bal)
    prog = CompiledProgram(problem)
    print(f"# BAL {ncam} cams / {npts} pts / {nobs} obs; "
          f"params={prog.num_effective} residuals={prog.num_rows} "
          f"device={jax.devices()[0].platform}", flush=True)

    x = prog.initial_state()
    dname = jax.devices()[0].platform

    cost = prog.cached_jit("b_cost",
                           lambda: prog.jit_with_consts(prog.cost_fn, (x,)))
    block(cost(x))
    bench("Residuals", lambda: block(cost(x)), device=dname)

    lin = prog.cached_jit(
        "b_lin", lambda: prog.jit_with_consts(prog.linearize_fn, (x,)))
    block(lin(x))
    bench("ResidualsAndJacobian", lambda: block(lin(x)), device=dname)

    delta = jnp.zeros((prog.num_effective,), dtype=prog.dtype)
    plus = prog.cached_jit(
        "b_plus",
        lambda: prog.jit_with_consts(prog.plus, (x, prog.example_delta())))
    block(plus(x, delta))
    bench("Plus", lambda: block(plus(x, delta)), device=dname)

    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR)
    meta = detect_schur_structure(prog, options)
    if meta is not None:
        # Linearize once on device; pass jac to the timed kernels as a
        # pytree argument so XLA cannot constant-fold the work away.
        lin_jit = prog.cached_jit(
            "b_lin2", lambda: prog.jit_with_consts(
                lambda xx: prog.linearize_fn(xx)[2], (x,)))
        jac = block(lin_jit(x))

        jtj_bd_j = prog.jit_with_consts(
            lambda jc: block_diag_jtj(jc, prog.traced_groups()), (jac,))
        block(jtj_bd_j(jac))
        bench("JtJBlockDiagonal", lambda: block(jtj_bd_j(jac)),
              device=dname)

        D = jnp.ones((prog.num_effective,), dtype=prog.dtype)
        w0 = jnp.ones((meta.nf,), dtype=prog.dtype)
        apply_S = prog.jit_with_consts(
            lambda jc, w: SchurOps(meta, jc, D).apply_S(w), (jac, w0))
        block(apply_S(jac, w0))
        bench("ImplicitSchurMultiply", lambda: block(apply_S(jac, w0)),
              device=dname, reduced_dim=int(meta.nf))

    return 0


if __name__ == "__main__":
    sys.exit(main())
