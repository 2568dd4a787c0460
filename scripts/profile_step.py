"""Phase-level on-device profiling of the BAL LM step.

The tunneled TPU has a ~28 ms dispatch floor per synchronous call, so naive
wall timing measures the tunnel, not the solver. Each phase is timed as a
jitted lax.fori_loop of N repetitions with a data dependency chaining
iterations; per-iteration device time = (T(N) - T(1)) / (N - 1).

Usage:  python scripts/profile_step.py [small]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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
    from ceres_tpu.solver import make_step_impl
    from ceres_tpu.solvers.schur import detect_schur_structure, SchurOps
    from ceres_tpu.ops.bsr import BlockJacobian, BucketJacobian, RVec
    import jax.scipy.linalg as jsl

    print(f"devices: {jax.devices()}", flush=True)

    shape = dict(num_cameras=16, num_points=22106, num_observations=83718)
    if len(sys.argv) > 1 and sys.argv[1] == "small":
        shape = dict(num_cameras=4, num_points=500, num_observations=2000)
    bal = synthetic_bal_problem(**shape, seed=7, pixel_noise=1.0)
    bal.perturb(rotation_sigma=0.01, translation_sigma=0.1,
                point_sigma=0.05, seed=8)
    problem, cams, pts = build_bal_ceres_problem(bal)

    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
        preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
        use_mixed_precision_solves=True,
        fused_iterations=True,
    )
    program = CompiledProgram.get_cached(problem, options)
    meta = detect_schur_structure(program, options)
    x0 = program.initial_state()

    N = 8

    def timeit(name, fn_builder):
        """fn_builder() -> f(x)->x (same shape), chained in fori_loop."""
        import jax

        def make(reps):
            f = fn_builder()

            def run(x):
                return jax.lax.fori_loop(0, reps, lambda i, c: f(c), x)
            return program.jit_with_consts(run, (x0,))

        f1, fN = make(1), make(N)
        # compile + warm
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
        print(f"{name:42s} {per*1e3:9.3f} ms/iter   "
              f"(T1 {t1*1e3:7.1f} ms, T{N} {tN*1e3:7.1f} ms)", flush=True)
        return per

    radius = jnp.asarray(1e4, jnp.float64)

    def dep(x, *vals):
        acc = 0.0
        for v in vals:
            acc = acc + jnp.sum(jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b.astype(jnp.float32)), v, 0.0))
        return x + 1e-30 * acc.astype(x.dtype)

    import jax

    # ---- phases ----
    def b_cost():
        def f(x):
            return dep(x, program.cost_fn(x))
        return f

    def b_linearize():
        def f(x):
            cost, grad, jac, res = program.linearize_fn(x)
            return dep(x, cost, grad)
        return f

    def cast32(jac, res):
        jac32 = BlockJacobian(
            [BucketJacobian(b.J.astype(jnp.float32), b.cols, b.row_offset,
                            b.onehots, b.gcols, b.sorted_slot, b.tlocals,
                            b.tslabs) for b in jac.buckets],
            jac.num_rows, jac.num_cols)
        res32 = RVec([p.astype(jnp.float32) for p in res.parts])
        return jac32, res32

    def prep(x):
        """linearize -> f32 jac/res/grad/scale/D (shared prefix)."""
        cost, g64, jac, res = program.linearize_fn(x)
        jac, res = cast32(jac, res)
        grad = jac.rmatvec(res)
        scale = 1.0 / (1.0 + jnp.sqrt(jac.squared_column_norms()))
        jac_s = jac.scale_columns(scale)
        diag = jnp.clip(jac_s.squared_column_norms(), options.min_lm_diagonal,
                        options.max_lm_diagonal)
        D = jnp.sqrt(diag / radius.astype(jnp.float32))
        return cost, grad, jac_s, res, scale, D

    def b_prep():
        def f(x):
            cost, grad, jac_s, res, scale, D = prep(x)
            return dep(x, cost, grad, D)
        return f

    def b_schur_ctor():
        def f(x):
            cost, grad, jac_s, res, scale, D = prep(x)
            ops = SchurOps(meta, jac_s, D)
            return dep(x, cost, ops.inv_ete, ops.D_f)
        return f

    def b_explicit_S():
        def f(x):
            cost, grad, jac_s, res, scale, D = prep(x)
            ops = SchurOps(meta, jac_s, D)
            b = -grad
            b_e = b[meta.c("e_cols", meta.e_cols)]
            b_f = b[meta.c("f_global", meta.f_global_cols)]
            S, rhs = ops.explicit_S_and_rhs(b_e, b_f)
            return dep(x, cost, S, rhs)
        return f

    def b_full_linsolve():
        def f(x):
            cost, grad, jac_s, res, scale, D = prep(x)
            ops = SchurOps(meta, jac_s, D)
            b = -grad
            b_e = b[meta.c("e_cols", meta.e_cols)]
            b_f = b[meta.c("f_global", meta.f_global_cols)]
            S, rhs = ops.explicit_S_and_rhs(b_e, b_f)
            c, lower = jsl.cho_factor(S)
            y = jsl.cho_solve((c, lower), rhs)
            d_e = ops.back_substitute(b_e, y)
            d = jnp.zeros((program.num_effective,), dtype=y.dtype)
            d = d.at[meta.c("f_global", meta.f_global_cols)].set(y)
            d = d.at[meta.c("e_cols", meta.e_cols)].set(d_e)
            return dep(x, cost, d)
        return f

    step_impl = make_step_impl(program, options)
    scale0 = jnp.ones((program.num_effective,), dtype=program.dtype)

    def b_step():
        def f(x):
            out = step_impl(x, radius, scale0)
            return dep(x, out["cost"], out["delta"], out["model_cost_change"])
        return f

    def b_body():
        def f(x):
            out = step_impl(x, radius, scale0)
            x_new = program.plus(x, out["delta"])
            new_cost = program.cost_fn(x_new)
            return dep(x_new, out["cost"], new_cost)
        return f

    timeit("cost_fn", b_cost)
    timeit("linearize (f64 cost+grad)", b_linearize)
    timeit("prep (lin+cast+grad+scale+D)", b_prep)
    timeit("prep + SchurOps ctor (EtE chol/inv)", b_schur_ctor)
    timeit("prep + ctor + explicit S+rhs", b_explicit_S)
    timeit("prep + full linear solve", b_full_linsolve)
    timeit("step_impl (full LM step)", b_step)
    timeit("step + plus + cost (fused body)", b_body)


if __name__ == "__main__":
    main()
