"""A/B of the Pallas lin-phase megakernel (ops/pallas_lin.py) vs the
generic fused lin phase, on the bench BAL-16-22106 shape.

Methodology (PERF.md / chained-fori): the tunneled TPU has a ~29 ms
dispatch floor, so each variant is timed as a jitted lax.fori_loop of
N=64 data-dependency-chained full LM steps; per-iteration device time
= (T(64) - T(1)) / 63, median of 7 runs. N=8 measurably under-resolves
(noise gave negative marginals).

Usage:  python scripts/ab_pallas_lin.py [small]
Writes the two numbers to stdout — record them in PERF.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import ceres_tpu as ct
    from ceres_tpu.io.bal import (synthetic_bal_problem,
                                  build_bal_ceres_problem)
    from ceres_tpu.program import CompiledProgram
    from ceres_tpu.solvers.schur import detect_schur_structure
    from ceres_tpu.solvers import schur_fused as sf

    print(f"devices: {jax.devices()}", flush=True)

    shape = dict(num_cameras=16, num_points=22106, num_observations=83718)
    if len(sys.argv) > 1 and sys.argv[1] == "small":
        shape = dict(num_cameras=4, num_points=500, num_observations=2000)
    bal = synthetic_bal_problem(**shape, seed=7, pixel_noise=1.0)
    bal.perturb(rotation_sigma=0.1, translation_sigma=1.0, point_sigma=0.5,
                seed=8)
    problem, _, _ = build_bal_ceres_problem(bal)

    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
        use_mixed_precision_solves=True,
        fused_iterations=True,
    )
    program = CompiledProgram.get_cached(problem, options)
    meta = detect_schur_structure(program, options)
    x0 = program.initial_state()
    radius = jnp.asarray(1e4, jnp.float64)
    scale0 = jnp.ones((program.num_effective,), jnp.float64)

    N = 64

    def dep(x, *vals):
        acc = jnp.asarray(0.0, jnp.float32)
        for v in vals:
            acc = acc + jnp.sum(v).astype(jnp.float32)
        return x + 1e-30 * acc.astype(x.dtype)

    def time_variant(name, lm):
        def make(reps):
            def run(x):
                def body(i, c):
                    out = lm(c, radius, scale0)
                    return dep(c, out["cost"], out["delta"],
                               out["model_cost_change"])
                return jax.lax.fori_loop(0, reps, body, x)
            return program.jit_with_consts(run, (x0,))

        t_build = time.perf_counter()
        f1, fN = make(1), make(N)
        f1(x0).block_until_ready()
        fN(x0).block_until_ready()
        compile_s = time.perf_counter() - t_build
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
        print(f"{name:28s} {per*1e3:9.3f} ms/step   "
              f"(T1 {t1*1e3:7.1f} ms, T{N} {tN*1e3:7.1f} ms, "
              f"compile {compile_s:.0f}s)", flush=True)
        return per

    # A: pallas lin-phase (default on TPU when supported)
    lm_a = sf.make_fused_schur_lm_step(program, options, meta)
    print(f"pallas_lin active: {lm_a.pallas_lin}", flush=True)

    # B: generic fused lin phase
    os.environ["CERES_TPU_NO_PALLAS_LIN"] = "1"
    try:
        lm_b = sf.make_fused_schur_lm_step(program, options, meta)
    finally:
        del os.environ["CERES_TPU_NO_PALLAS_LIN"]
    assert not lm_b.pallas_lin

    per_b = time_variant("generic lin phase", lm_b)
    if lm_a.pallas_lin:
        per_a = time_variant("pallas lin phase", lm_a)
        print(f"speedup (full step): {per_b/per_a:.2f}x   "
              f"({per_b*1e3:.2f} -> {per_a*1e3:.2f} ms)", flush=True)
    else:
        print("pallas lin phase NOT active (gate rejected / not on TPU); "
              "only the generic number was measured", flush=True)


if __name__ == "__main__":
    main()
