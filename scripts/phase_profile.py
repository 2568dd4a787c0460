"""Phase breakdown of the flagship fused LM step on real hardware.

Times each phase of the DENSE_SCHUR fused step (pallas lin kernel, full
lin phase, solve phase, f64 candidate-cost pass, full lm_step) by running
K chained iterations inside one jitted fori_loop (steady-state device
rate, no per-iteration dispatch) and differencing two K values so the
dispatch + single D2H pull cancel. Distinct carry seeds defeat the axon
runtime's dispatch dedupe.

Usage: python scripts/phase_profile.py [--d2h]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d2h", action="store_true",
                    help="also measure D2H transfer costs")
    ap.add_argument("--skip-phases", action="store_true")
    args = ap.parse_args()

    import os
    import jax
    import jax.numpy as jnp
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import ceres_tpu as ct
    from ceres_tpu.io.bal import (synthetic_bal_problem,
                                  build_bal_ceres_problem)
    from ceres_tpu.program import CompiledProgram
    from ceres_tpu.solvers.schur import detect_schur_structure
    from ceres_tpu.solvers.schur_fused import make_fused_schur_lm_step

    log(f"devices: {jax.devices()}")

    if args.d2h:
        measure_d2h(jax, jnp)
        if args.skip_phases:
            return

    bal = synthetic_bal_problem(num_cameras=16, num_points=22106,
                                num_observations=83718, seed=7,
                                pixel_noise=1.0)
    bal.perturb(rotation_sigma=0.1, translation_sigma=1.0,
                point_sigma=0.5, seed=8)
    problem, cams, pts = build_bal_ceres_problem(bal)
    opts = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
        preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
        max_num_iterations=50, function_tolerance=1e-6,
        max_linear_solver_iterations=100,
        use_mixed_precision_solves=True, fused_iterations=True)
    program = CompiledProgram.get_cached(problem, opts)
    meta = detect_schur_structure(program, opts)
    lm = make_fused_schur_lm_step(program, opts, meta)
    log(f"pallas lin active: {lm.pallas_lin}")

    dtype = program.dtype
    x0 = jnp.asarray(program.initial_state())
    nscale = program.num_effective
    ones = jnp.ones((nscale,), dtype)
    radius0 = jnp.asarray(1e4, dtype)

    # one art for the solve-phase piece
    art_fn = program.jit_with_consts(
        lambda x: lm.linearize(x, ones), (program.example_x(),))
    art = art_fn(x0)
    jax.block_until_ready(art)
    # a delta for the candidate piece
    out_fn = program.jit_with_consts(
        lambda x: lm.solve_from(lm.linearize(x, ones), radius0),
        (program.example_x(),))
    out0 = out_fn(x0)
    delta0 = out0["delta"]
    jax.block_until_ready(delta0)

    def timed(fn, argsets, pulls=3):
        """median wall of fn(*args) + device_get over distinct argsets."""
        walls = []
        for a in argsets[:pulls]:
            t0 = time.time()
            r = fn(*a)
            leaf = jax.tree_util.tree_leaves(r)[0]
            jax.device_get(leaf)
            walls.append(time.time() - t0)
        return sorted(walls)[len(walls) // 2]

    def piece_rate(name, piece, extra_args=()):
        """piece: (c, *extra) -> scalar carry. Times K-chained loops."""
        def runner(K):
            def f(c, *extra):
                def body(i, cc):
                    return piece(cc + 1e-30 * i, *extra)
                return jax.lax.fori_loop(0, K, body, c)
            ex = (jax.ShapeDtypeStruct((), dtype),) + tuple(
                jax.tree_util.tree_map(
                    lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), e)
                for e in extra_args)
            return program.jit_with_consts(f, ex)
        k_lo, k_hi = 4, 36
        r_lo, r_hi = runner(k_lo), runner(k_hi)
        seeds = [jnp.asarray(1.0 + 1e-9 * i, dtype) for i in range(8)]
        # warm both compiles
        jax.device_get(r_lo(seeds[7], *extra_args))
        jax.device_get(r_hi(seeds[6], *extra_args))
        t_lo = timed(r_lo, [(s,) + tuple(extra_args) for s in seeds[:3]])
        t_hi = timed(r_hi, [(s,) + tuple(extra_args) for s in seeds[3:6]])
        per = (t_hi - t_lo) / (k_hi - k_lo)
        log(f"{name:34s} {per*1e3:8.3f} ms/iter   "
            f"(K{k_lo}: {t_lo*1e3:.1f} ms, K{k_hi}: {t_hi*1e3:.1f} ms)")
        return per

    # ---- pieces ----
    def p_full_step(c):
        out = lm.solve_from(lm.linearize(x0 * (1.0 + 1e-30 * c), ones),
                            radius0)
        return c + 1e-30 * out["step_norm"].astype(dtype)

    def p_lin(c):
        art2 = lm.linearize(x0 * (1.0 + 1e-30 * c), ones)
        return c + 1e-40 * art2["cost"].astype(dtype)

    def p_solve(c, art_in):
        out = lm.solve_from(art_in, radius0 * (1.0 + 1e-30 * c))
        return c + 1e-30 * out["step_norm"].astype(dtype)

    def p_cost(c):
        cost = program.cost_fn(x0 * (1.0 + 1e-30 * c))
        return c + 1e-40 * cost.astype(dtype)

    def p_candidate(c):
        x_new = program.plus(x0, delta0 * (1e-30 * c))
        cost = program.cost_fn(x_new)
        return c + 1e-40 * cost.astype(dtype)

    pieces = [("full lm_step (lin+solve)", p_full_step, ()),
              ("lin phase", p_lin, ()),
              ("solve phase", p_solve, (art,)),
              ("f64 cost pass (cost_fn)", p_cost, ()),
              ("candidate plus+cost", p_candidate, ())]

    if getattr(lm, "cost_fn", None) is not None:
        def p_ds_cost(c):
            cost = lm.cost_fn(x0 * (1.0 + 1e-30 * c))
            return c + 1e-40 * cost.astype(dtype)

        def p_candidate_ds(c):
            x_new = program.plus(x0, delta0 * (1e-30 * c))
            cost = lm.cost_fn(x_new)
            return c + 1e-40 * cost.astype(dtype)

        pieces.append(("ds cost kernel (pallas)", p_ds_cost, ()))
        pieces.append(("candidate plus+ds-cost", p_candidate_ds, ()))

    if lm.pallas_lin:
        from ceres_tpu.ops.pallas_lin import make_pallas_lin
        plin = make_pallas_lin(program, opts, meta)
        te = meta.te
        ones_se = jnp.ones((plin.ne_pad, te), jnp.float32)

        def p_plin(c):
            o = plin.lin(x0 * (1.0 + 1e-30 * c), ones_se, None)
            return c + 1e-40 * jnp.sum(o["g_e"][0]).astype(dtype)

        pieces.insert(2, ("pallas lin kernel only", p_plin, ()))

        if plin.elim is not None:
            o0 = program.jit_with_consts(
                lambda x: plin.lin(x, ones_se, None),
                (program.example_x(),))(x0)
            a_e = o0["A_eT"]
            jax.block_until_ready(a_e)
            npad = plin.ne_pad
            inv0 = jnp.tile(jnp.eye(te, dtype=jnp.float32).reshape(
                1, te * te), (npad, 1)).T
            z0 = jnp.ones((te, npad), jnp.float32)

            def p_elim(c, a_in):
                sc, rh = plin.elim(a_in * (1.0 + 1e-30 * c.astype(
                    jnp.float32)), inv0, z0)
                return c + 1e-40 * (sc[0, 0] + rh[0]).astype(dtype)

            pieces.insert(3, ("pallas elim kernel only", p_elim, (a_e,)))

    results = {}
    for name, piece, extra in pieces:
        try:
            results[name] = piece_rate(name, piece, extra)
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {e}")

    log("\nsummary:")
    for name, per in results.items():
        log(f"  {name:34s} {per*1e3:8.3f} ms")


def measure_d2h(jax, jnp):
    import jax.numpy as _j
    log("\n---- D2H transfer costs ----")
    key = 0
    for nbytes in (64, 65536, 262144, 524288, 1048576, 2097152):
        n = nbytes // 8
        mk = jax.jit(lambda s: _j.arange(n, dtype=_j.float64) * s)
        walls = []
        for i in range(5):
            a = mk(jnp.asarray(1.0 + i + key, _j.float64))
            jax.block_until_ready(a)
            t0 = time.time()
            jax.device_get(a)
            walls.append(time.time() - t0)
        key += 10
        med = sorted(walls)[2]
        log(f"  D2H {nbytes/1024:8.1f} KB: {med*1e3:7.1f} ms "
            f"({nbytes/med/1e6:.1f} MB/s)  all={['%.1f' % (w*1e3) for w in walls]}")
    # two concurrent async pulls vs sequential
    n = 262144 // 8
    mk2 = jax.jit(lambda s: (_j.arange(n, dtype=_j.float64) * s,
                             _j.arange(n, dtype=_j.float64) + s))
    for mode in ("sequential", "async-overlap"):
        walls = []
        for i in range(5):
            a, b = mk2(jnp.asarray(100.0 + i + key, _j.float64))
            jax.block_until_ready((a, b))
            t0 = time.time()
            if mode == "sequential":
                jax.device_get(a)
                jax.device_get(b)
            else:
                try:
                    a.copy_to_host_async()
                    b.copy_to_host_async()
                except Exception:
                    pass
                jax.device_get((a, b))
            walls.append(time.time() - t0)
        key += 10
        med = sorted(walls)[2]
        log(f"  two 256KB pulls ({mode}): {med*1e3:.1f} ms")


if __name__ == "__main__":
    main()
