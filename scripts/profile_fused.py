"""Phase-level on-device profiling of the FUSED Schur LM step internals.

Breaks make_fused_schur_lm_step's pipeline into cumulative prefixes so each
stage's marginal cost is visible. Same chained-fori-loop methodology as
profile_step.py (tunnel dispatch floor amortized away).

Usage:  python scripts/profile_fused.py [small]
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
    from ceres_tpu.solvers.schur import detect_schur_structure
    from ceres_tpu.solvers import schur_fused as sf
    from ceres_tpu.loss import correct_residuals_and_jacobian

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
    lm = sf.make_fused_schur_lm_step(program, options, meta)
    scale0 = jnp.ones((program.num_effective,), jnp.float64)
    radius = jnp.asarray(1e4, jnp.float64)

    N = 8

    def timeit(name, fn_builder):
        def make(reps):
            f = fn_builder()

            def run(x):
                return jax.lax.fori_loop(0, reps, lambda i, c: f(c), x)
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
        print(f"{name:46s} {per*1e3:9.3f} ms/iter   "
              f"(T1 {t1*1e3:7.1f} ms, T{N} {tN*1e3:7.1f} ms)", flush=True)
        return per

    def dep(x, *vals):
        acc = jnp.asarray(0.0, jnp.float32)
        for v in vals:
            acc = acc + jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b).astype(jnp.float32), v,
                jnp.asarray(0.0, jnp.float32))
        return x + 1e-30 * acc.astype(x.dtype)

    # ---- stage prefixes inside _lin_phase ----
    def b_r64():
        """f64 residual-only passes (cost accounting)."""
        def f(x):
            acc = []
            for bk in program.buckets:
                r64 = program._bucket_residuals(bk, x)
                acc.append(jnp.sum(r64 * r64))
            return dep(x, *acc)
        return f

    def b_lin32():
        """+ f32 linearize (native-f32 jacfwd chains)."""
        def f(x):
            acc = []
            for bk in program.buckets:
                _, J32 = program._bucket_linearize(bk, x,
                                                   cast_dtype=jnp.float32)
                acc.append(jnp.sum(J32))
            return dep(x, *acc)
        return f

    def b_gather_grams():
        """+ chunk gather + EtE/Gf/Ge/A/gradient assembly (no solve)."""
        def f(x):
            art = lm.linearize(x, scale0)
            # plane-mode art (elim2) carries etes_t/gse_t instead of the
            # [ne, te, te] tensors
            e = art.get("EtE_s", art.get("etes_t"))
            g = art.get("g_se", art.get("gse_t"))
            return dep(x, e, g, art["g_sf"])
        return f

    def b_full_step():
        def f(x):
            out = lm(x, radius, scale0)
            return dep(x, out["cost"], out["delta"],
                       out["model_cost_change"])
        return f

    def b_solve_only():
        """solve phase alone: linearize once OUTSIDE the loop."""
        art0 = program.jit_with_consts(
            lambda x: lm.linearize(x, scale0), (x0,))(x0)
        jax.block_until_ready(art0)

        def f(x):
            out = lm.solve_from(art0, radius)
            return dep(x, out["delta"], out["model_cost_change"])
        return f

    timeit("f64 residual passes", b_r64)
    timeit("+ f32 linearize (jacfwd)", b_lin32)
    timeit("lin_phase total (gather+grams+A+grad)", b_gather_grams)
    timeit("solve_phase only (damp+S+chol+backsub)", b_solve_only)
    timeit("full fused LM step", b_full_step)


if __name__ == "__main__":
    main()
