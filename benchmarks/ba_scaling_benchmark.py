"""Bundle-adjustment scaling benchmark: LM wall time vs problem size
across solver configurations (the reference's evaluation_benchmark.cc role
at the whole-solve level).

Usage: python -m benchmarks.ba_scaling_benchmark [--cpu] [--quick]

Measured 2026-08-20 (round 5) on one TPU v5e chip (warm full solve from
the perturbed start, mixed precision, fused eliminator + round-5
kernels; capture benchmarks/hw_r5/ba_scaling_mid2.log):
  4 cams/2k pts/8k obs    DENSE_SCHUR      0.029 s (3 LM iters)
  16/22k/84k              DENSE_SCHUR      0.061 s (3)   [round 3: 0.36]
  64/30k/150k             ITERATIVE_SCHUR  0.132 s (8)   [round 3: 0.81]
  256/50k/300k            ITERATIVE_SCHUR  0.964 s (7)   [round 3: 3.1]
  1024/200k/1M (--large)  ITERATIVE_SCHUR  26.1 s (25, implicit)
                                           [round 3: 27.9 s / 33 iters]
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
    if "--large" in sys.argv:
        # nf = 9216 > the explicit-S cap: exercises the matrix-free
        # implicit fused ITERATIVE_SCHUR at production scale (1M
        # observations; J alone is ~100 MB f32, A/S would be ~2.2 GB).
        cases = [(1024, 200000, 1000000, "ITERATIVE_SCHUR")]

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
            # --large: 45 caps the single fused dispatch below the
            # remote worker's execution watchdog (a 150-iteration
            # dispatch at ~1.3 s/iteration crashed the worker twice in
            # round 5); the problem converges in ~33-34 iterations.
            max_num_iterations=45 if "--large" in sys.argv else 50,
            function_tolerance=1e-6,
            max_linear_solver_iterations=100,
            fused_iterations=True)
        if solver == "ITERATIVE_SCHUR":
            # report which implicit-apply implementation is active
            from ceres_tpu.program import CompiledProgram
            from ceres_tpu.solvers.schur import detect_schur_structure
            from ceres_tpu.solvers.schur_fused import (
                fused_schur_supported, make_fused_schur_lm_step)
            prog_probe = CompiledProgram.get_cached(problem, options)
            meta_probe = detect_schur_structure(prog_probe, options)
            if meta_probe is not None and fused_schur_supported(
                    prog_probe, options, meta_probe):
                step_probe = make_fused_schur_lm_step(
                    prog_probe, options, meta_probe)
                print(f"# fused={True} pallas_implicit="
                      f"{getattr(step_probe, 'pallas_implicit', False)} "
                      f"pallas_pcg="
                      f"{getattr(step_probe, 'pallas_pcg', False)}",
                      flush=True)
        cam0 = [c.copy() for c in cams]
        pt0 = [pp.copy() for pp in pts]
        s = ct.solve(options, problem)          # warmup (compile)
        for c, c0 in zip(cams, cam0):
            c[:] = c0
        for pp, p0 in zip(pts, pt0):
            pp[:] = p0
        t0 = time.time()
        s = ct.solve(options, problem)          # timed full solve, warm
        wall = time.time() - t0
        print(json.dumps({
            "name": f"ba_{ncam}x{npts}x{nobs}_{solver.lower()}",
            "wall_to_convergence_s": round(wall, 3),
            "iterations": s.num_iterations,
            "s_per_lm_iteration": round(wall / max(s.num_iterations, 1), 4),
            "pcg_iterations": int(s.num_linear_solver_iterations or 0),
            "final_cost": s.final_cost,
            "termination": str(s.termination_type),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
