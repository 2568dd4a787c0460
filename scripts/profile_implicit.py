"""On-device cost structure of the fused IMPLICIT (matrix-free)
ITERATIVE_SCHUR LM step — the large-camera-count regime where the cross
tensor A and dense S are unaffordable.

Isolates:
  - lin_phase (linearize + grams)
  - solve_phase at CG=1 vs CG=51 -> marginal cost PER CG ITERATION
    (eta=0 disables the Q-based early exit so CG runs exactly max_iters)
  - SCHUR_JACOBI vs IDENTITY preconditioner -> assembly + apply cost

Usage:
  python scripts/profile_implicit.py           # 64 cams / 30k pts / 150k obs
  python scripts/profile_implicit.py mid       # 256 / 50k / 300k
  python scripts/profile_implicit.py large     # 512 / 100k / 500k (nf>cap)
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("CERES_TPU_FORCE_IMPLICIT", "1")


def main():
    import jax
    import jax.numpy as jnp
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import ceres_tpu as ct
    from ceres_tpu.io.bal import synthetic_bal_problem, build_bal_ceres_problem
    from ceres_tpu.program import CompiledProgram
    from ceres_tpu.solvers.schur import detect_schur_structure
    from ceres_tpu.solvers import schur_fused as sf

    print(f"devices: {jax.devices()}", flush=True)

    shape = dict(num_cameras=64, num_points=30000, num_observations=150000)
    if "mid" in sys.argv:
        shape = dict(num_cameras=256, num_points=50000,
                     num_observations=300000)
    if "large" in sys.argv:
        shape = dict(num_cameras=512, num_points=100000,
                     num_observations=500000)
    t0 = time.time()
    bal = synthetic_bal_problem(**shape, seed=7, pixel_noise=1.0)
    bal.perturb(rotation_sigma=0.01, translation_sigma=0.1,
                point_sigma=0.05, seed=8)
    problem, cams, pts = build_bal_ceres_problem(bal)
    print(f"problem build: {time.time()-t0:.1f} s", flush=True)

    base = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
        preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
        use_mixed_precision_solves=True,
        fused_iterations=True,
        eta=0.0,                       # CG runs exactly max_iterations
        max_linear_solver_iterations=1)
    program = CompiledProgram.get_cached(problem, base)
    meta = detect_schur_structure(program, base)
    print(f"ne={meta.ne} te={meta.te} nf={meta.nf} "
          f"buckets={len(meta.buckets)}", flush=True)
    x0 = program.initial_state()
    scale0 = jnp.ones((program.num_effective,), program.dtype)
    radius = jnp.asarray(1e4, program.dtype)

    N = 8

    def timeit(name, step_fn):
        def make(reps):
            def run(x):
                def body(i, c):
                    out = step_fn(c)
                    return c + 1e-30 * out.astype(c.dtype)
                return jax.lax.fori_loop(0, reps, body, x)
            return program.jit_with_consts(run, (x0,))

        f1, fN = make(1), make(N)
        f1(x0).block_until_ready()
        fN(x0).block_until_ready()
        ts1, tsN = [], []
        for _ in range(7):
            t0 = time.perf_counter()
            f1(x0).block_until_ready()
            ts1.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            fN(x0).block_until_ready()
            tsN.append(time.perf_counter() - t0)
        t1 = sorted(ts1)[len(ts1) // 2]
        tN = sorted(tsN)[len(tsN) // 2]
        per = (tN - t1) / (N - 1)
        print(f"{name:52s} {per*1e3:9.3f} ms/iter   "
              f"(T1 {t1*1e3:7.1f} ms, T{N} {tN*1e3:7.1f} ms)", flush=True)
        return per

    def step_of(opts):
        lm = sf.make_fused_schur_lm_step(program, opts, meta)

        def f(x):
            out = lm(x, radius, scale0)
            return (jnp.sum(out["delta"]) + out["cost"]
                    + out["model_cost_change"]).astype(jnp.float32)
        return f, lm

    def lin_of(lm):
        def f(x):
            art = lm.linearize(x, scale0)
            return (jnp.sum(art["EtE_s"]) + jnp.sum(art["g_sf"])
                    ).astype(jnp.float32)
        return f

    opt_cg1 = base
    opt_cg51 = dataclasses.replace(base, max_linear_solver_iterations=51)
    opt_id1 = dataclasses.replace(
        base, preconditioner_type=ct.PreconditionerType.IDENTITY)
    opt_id51 = dataclasses.replace(
        opt_id1, max_linear_solver_iterations=51)

    f_cg1, lm1 = step_of(opt_cg1)
    f_cg51, _ = step_of(opt_cg51)
    f_id1, _ = step_of(opt_id1)
    f_id51, _ = step_of(opt_id51)

    t_lin = timeit("lin_phase only", lin_of(lm1))
    t1 = timeit("full step, SCHUR_JACOBI, CG=1", f_cg1)
    t51 = timeit("full step, SCHUR_JACOBI, CG=51", f_cg51)
    ti1 = timeit("full step, IDENTITY, CG=1", f_id1)
    ti51 = timeit("full step, IDENTITY, CG=51", f_id51)

    print(f"\nper-CG-iteration (SCHUR_JACOBI): {(t51-t1)/50*1e3:.3f} ms")
    print(f"per-CG-iteration (IDENTITY):     {(ti51-ti1)/50*1e3:.3f} ms")
    print(f"precond assembly+1 apply (CG=1 SJ - ID): {(t1-ti1)*1e3:.3f} ms")
    print(f"solve_phase overhead at CG=1 (SJ step - lin): "
          f"{(t1-t_lin)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
