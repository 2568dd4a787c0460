"""Where does fused-solve warmup time go? trace / lower / compile split.

Usage: python -m scripts.profile_compile [--full] [--iterative]

Runs on whatever backend is attached (force CPU with JAX_PLATFORMS=cpu).
The Python trace + jaxpr-build time is backend-independent; XLA compile
time is backend-specific but correlates (big jaxpr -> slow everywhere).
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    import jax
    import ceres_tpu as ct
    from ceres_tpu import program as program_mod
    from ceres_tpu.io.bal import (synthetic_bal_problem,
                                  build_bal_ceres_problem)
    from ceres_tpu.program import CompiledProgram
    from ceres_tpu.minimizers.fused import make_fused_tr_solve

    full = "--full" in sys.argv
    shape = (dict(num_cameras=16, num_points=22106, num_observations=83718)
             if full else
             dict(num_cameras=4, num_points=2000, num_observations=8000))
    t0 = time.time()
    bal = synthetic_bal_problem(**shape, seed=7, pixel_noise=1.0)
    bal.perturb(rotation_sigma=0.1, translation_sigma=1.0, point_sigma=0.5,
                seed=8)
    problem, cams, pts = build_bal_ceres_problem(bal)
    print(f"build problem: {time.time()-t0:.1f}s", flush=True)

    solver = ("ITERATIVE_SCHUR" if "--iterative" in sys.argv
              else "DENSE_SCHUR")
    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType[solver],
        preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
        max_num_iterations=50, function_tolerance=1e-6,
        max_linear_solver_iterations=100,
        use_mixed_precision_solves=True)

    t0 = time.time()
    program = CompiledProgram.get_cached(problem, options)
    print(f"CompiledProgram build: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    fn = make_fused_tr_solve(program, options)
    print(f"make_fused_tr_solve (py): {time.time()-t0:.1f}s", flush=True)

    # Re-create jit_with_consts' phases with per-phase timing.
    x0_spec = program.example_x()
    t0 = time.time()
    used = set()
    tok = program_mod._CONST_CTX.set(("record", used))
    try:
        jax.eval_shape(fn, x0_spec)
    finally:
        program_mod._CONST_CTX.reset(tok)
    names = sorted(used)
    print(f"recording trace (eval_shape): {time.time()-t0:.1f}s "
          f"({len(names)} consts)", flush=True)

    def bound(consts_tuple, *args):
        tok = program_mod._CONST_CTX.set(
            ("bind", dict(zip(names, consts_tuple))))
        try:
            return fn(*args)
        finally:
            program_mod._CONST_CTX.reset(tok)

    consts = tuple(program._device_const(n) for n in names)
    x0 = program.initial_state()

    t0 = time.time()
    lowered = jax.jit(bound).lower(consts, x0)
    print(f"trace+lower: {time.time()-t0:.1f}s", flush=True)
    try:
        hlo = lowered.as_text()
        print(f"  StableHLO size: {len(hlo)/1e6:.1f} MB, "
              f"{hlo.count(chr(10))} lines", flush=True)
    except Exception:
        pass

    t0 = time.time()
    compiled = lowered.compile()
    print(f"XLA compile: {time.time()-t0:.1f}s", flush=True)
    try:
        mem = compiled.memory_analysis()
        print(f"  temp {mem.temp_size_in_bytes/1e6:.0f} MB, "
              f"args {mem.argument_size_in_bytes/1e6:.0f} MB", flush=True)
    except Exception:
        pass

    t0 = time.time()
    out = compiled(consts, x0)
    jax.block_until_ready(out)
    print(f"first run: {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
