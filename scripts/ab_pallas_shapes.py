"""A/B the shape-driven Pallas specializations beyond Snavely:

  1. SE3 pose-graph bucket linearize (ops/pallas_linearize.py) vs the
     vmap(jacfwd) path — chained-fori timing of linearize_fn_mixed.
  2. FoE-grid CGNR J^T(Jv) (ops/pallas_kernels.bucket_jtjv, read-J-once)
     vs the two-einsum path — full denoising CGNR solve timing.

Run on the TPU: python scripts/ab_pallas_shapes.py [--poses N] [--img N]
Record the numbers in PERF.md (VERDICT r2 item 5).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _time_chained(fn, x, reps=64, repeats=5, min_window=0.05):
    """Hardened chained-fori timing of a jitted x->scalar fn (VERDICT r3
    item 7 protocol): median over >=5 measurements, each covering a
    MINIMUM-WORK window (>= min_window seconds of dispatched work, so a
    sub-microsecond artifact like the round-3 0.001 ms/call reading is
    impossible), distinct eps per dispatch (the axon runtime dedupes
    identical in-flight calls; block_until_ready on DISTINCT dispatches
    forces real executions with no D2H inside the timed window), and a
    contention check: when the spread across repeats exceeds 50% of the
    median the whole measurement re-runs once and is FLAGGED in the log
    if still unstable."""
    import math
    import jax
    import jax.numpy as jnp

    def chain(x0, eps):
        def body(_, c):
            return c + fn(x0 * (1.0 + eps) + c * 1e-30)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    run = jax.jit(chain)
    jax.device_get(run(x, 0.0))                    # warm/compile

    seq = [0]

    def window():
        # pilot one dispatch to size the window
        seq[0] += 1
        t0 = time.perf_counter()
        jax.block_until_ready(run(x, 1e-13 * seq[0]))
        pilot = time.perf_counter() - t0
        M = max(1, int(math.ceil(min_window / max(pilot, 1e-4))))
        es = []
        for _ in range(M):
            seq[0] += 1
            es.append(1e-13 * seq[0])
        t0 = time.perf_counter()
        rs = [run(x, e) for e in es]
        jax.block_until_ready(rs)
        return (time.perf_counter() - t0) / (M * reps)

    def measure():
        ts = sorted(window() for _ in range(repeats))
        med = ts[repeats // 2]
        spread = (ts[-1] - ts[0]) / max(med, 1e-12)
        return med, spread, ts

    med, spread, ts = measure()
    if spread > 0.5:
        print(f"  (unstable timings {['%.4f' % (t*1e3) for t in ts]} ms "
              f"— re-running)", flush=True)
        med, spread, ts = measure()
    flag = " [CONTENDED/UNSTABLE]" if spread > 0.5 else ""
    if med < 2e-6:
        flag += " [ARTIFACT? <2us/call]"
    print(f"  samples(ms): {['%.4f' % (t*1e3) for t in ts]}{flag}",
          flush=True)
    return med


def ab_pose3d(num_poses=20000):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ceres_tpu.examples.slam import build_pose_graph_3d_problem
    from ceres_tpu.io.g2o import synthetic_pose_graph_3d
    from ceres_tpu.program import CompiledProgram

    poses, constraints, _ = synthetic_pose_graph_3d(
        num_poses=num_poses, seed=4, loop_every=7)
    print(f"pose-graph 3d: {num_poses} poses, {len(constraints)} "
          f"constraints", flush=True)

    results = {}
    for label, env in (("jacfwd", {"CERES_TPU_NO_PALLAS_LINEARIZE": "1"}),
                       ("pallas", {})):
        for k, v in env.items():
            os.environ[k] = v
        try:
            problem, _, _ = build_pose_graph_3d_problem(poses, constraints)
            prog = CompiledProgram(problem)
            x = prog.initial_state()
            # the bucket the kernel covers (the all-variable one; the
            # gauge-fixed pose's constant-slot bucket keeps jacfwd)
            bk = max(prog.buckets, key=lambda b: b.n)

            def lin_cost(xx, _p=prog, _bk=bk):
                r, J = _p._bucket_linearize(_bk, xx,
                                            cast_dtype=jnp.float32)
                return (jnp.sum(J) + jnp.sum(r)).astype(jnp.float32)

            bound = prog.jit_with_consts(lin_cost, (x,))
            dt = _time_chained(lambda xx: bound(xx), x)
            # verify the kernel actually engaged (build cache populated)
            active = bool(getattr(prog, "_plinz_cache", None)) and \
                any(v is not None
                    for v in getattr(prog, "_plinz_cache", {}).values())
            results[label] = dt
            print(f"  {label:8s} linearize: {1e3*dt:.3f} ms/call "
                  f"(kernel active: {active})", flush=True)
        finally:
            for k in env:
                del os.environ[k]
    if "jacfwd" in results and "pallas" in results:
        print(f"  pose3d linearize speedup: "
              f"{results['jacfwd']/results['pallas']:.2f}x", flush=True)
    return results


def ab_pose2d(num_poses=20000):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ceres_tpu.examples.slam import build_pose_graph_2d_problem
    from ceres_tpu.io.g2o import synthetic_pose_graph_2d
    from ceres_tpu.program import CompiledProgram

    poses, constraints, _ = synthetic_pose_graph_2d(
        num_poses=num_poses, seed=4, loop_every=7)
    print(f"pose-graph 2d: {num_poses} poses, {len(constraints)} "
          f"constraints", flush=True)

    results = {}
    for label, env in (("jacfwd", {"CERES_TPU_NO_PALLAS_LINEARIZE": "1"}),
                       ("pallas", {})):
        for k, v in env.items():
            os.environ[k] = v
        try:
            problem = build_pose_graph_2d_problem(poses, constraints)[0]
            prog = CompiledProgram(problem)
            x = prog.initial_state()
            bk = max(prog.buckets, key=lambda b: b.n)

            def lin_cost(xx, _p=prog, _bk=bk):
                r, J = _p._bucket_linearize(_bk, xx,
                                            cast_dtype=jnp.float32)
                return (jnp.sum(J) + jnp.sum(r)).astype(jnp.float32)

            bound = prog.jit_with_consts(lin_cost, (x,))
            dt = _time_chained(lambda xx: bound(xx), x)
            active = bool(getattr(prog, "_plinz_cache", None)) and \
                any(v is not None
                    for v in getattr(prog, "_plinz_cache", {}).values())
            results[label] = dt
            print(f"  {label:8s} linearize: {1e3*dt:.3f} ms/call "
                  f"(kernel active: {active})", flush=True)
        finally:
            for k in env:
                del os.environ[k]
    if "jacfwd" in results and "pallas" in results:
        print(f"  pose2d linearize speedup: "
              f"{results['jacfwd']/results['pallas']:.2f}x", flush=True)
    return results


def ab_foe(size=96):
    import jax
    import numpy as np
    import ceres_tpu as ct
    from ceres_tpu.examples.denoising import build_denoising_problem
    from ceres_tpu.io.pgm import read_pgm

    from ceres_tpu.examples.denoising import FieldsOfExperts
    DATA = "/root/reference/data"
    if not os.path.exists(os.path.join(DATA, "ceres_noisy.pgm")):
        print("  (reference data unavailable; skipping FoE A/B)")
        return {}
    foe = FieldsOfExperts(os.path.join(DATA, "2x2.foe"))
    img = read_pgm(os.path.join(DATA, "ceres_noisy.pgm"))[:size, :size]
    print(f"FoE denoising: {img.shape[0]}x{img.shape[1]} crop", flush=True)

    results = {}
    for label, env in (("einsum2", {"CERES_TPU_NO_PALLAS": "1"}),
                       ("pallas", {})):
        for k, v in env.items():
            os.environ[k] = v
        try:
            problem, pixels = build_denoising_problem(img, foe)
            opts = ct.SolverOptions(
                linear_solver_type=ct.LinearSolverType.CGNR,
                preconditioner_type=ct.PreconditionerType.JACOBI,
                use_mixed_precision_solves=True,
                max_num_iterations=10, fused_iterations=True,
                defer_parameter_writeback=True)
            ct.solve(opts, problem)                  # warm/compile
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                s = ct.solve(opts, problem)
                ts.append(time.perf_counter() - t0)
            dt = sorted(ts)[1]
            results[label] = dt
            print(f"  {label:8s} CGNR solve: {dt:.3f} s "
                  f"({s.num_iterations} LM its, cost {s.final_cost:.4e})",
                  flush=True)
        finally:
            for k in env:
                del os.environ[k]
    if "einsum2" in results and "pallas" in results:
        print(f"  FoE CGNR speedup: "
              f"{results['einsum2']/results['pallas']:.2f}x", flush=True)
    return results


def _ab_bucket_linearize(tag, build_prog, off_env):
    """Shared two-arm bucket-linearize A/B (hardened _time_chained)."""
    import jax.numpy as jnp

    results = {}
    for label, env in (("jacfwd", off_env), ("pallas", {})):
        for k, v in env.items():
            os.environ[k] = v
        try:
            prog = build_prog()
            x = prog.initial_state()
            bk = max(prog.buckets, key=lambda b: b.n)

            def lin_cost(xx, _p=prog, _bk=bk):
                r, J = _p._bucket_linearize(_bk, xx,
                                            cast_dtype=jnp.float32)
                return (jnp.sum(J) + jnp.sum(r)).astype(jnp.float32)

            bound = prog.jit_with_consts(lin_cost, (x,))
            dt = _time_chained(lambda xx: bound(xx), x)
            active = bool(getattr(prog, "_plinz_cache", None)) and \
                any(v is not None
                    for v in getattr(prog, "_plinz_cache", {}).values())
            results[label] = dt
            print(f"  {label:8s} linearize: {1e3*dt:.3f} ms/call "
                  f"(kernel active: {active})", flush=True)
        finally:
            for k in env:
                del os.environ[k]
    if "jacfwd" in results and "pallas" in results:
        print(f"  {tag} linearize speedup: "
              f"{results['jacfwd']/results['pallas']:.2f}x", flush=True)
    return results


def ab_auto_snavely(nobs=83718):
    """The AUTO-compiled (jaxpr->jetlib) Snavely bucket kernel vs jacfwd —
    no hand registry entry exists for this shape, so arm B is purely the
    generic compiler (ops/jet_compile.py)."""
    from ceres_tpu.io.bal import (synthetic_bal_problem,
                                  build_bal_ceres_problem)
    from ceres_tpu.program import CompiledProgram
    ncam = max(4, nobs // 5232)
    npts = max(16, nobs // 4)
    bal = synthetic_bal_problem(ncam, npts, nobs, seed=7, pixel_noise=1.0)
    print(f"auto-snavely: {ncam} cams / {npts} pts / {nobs} obs",
          flush=True)

    def build():
        problem, _, _ = build_bal_ceres_problem(bal)
        return CompiledProgram(problem)

    return _ab_bucket_linearize(
        "auto-snavely", build, {"CERES_TPU_NO_PALLAS_LINEARIZE": "1"})


def ab_auto_circle(npoints=100000):
    """Generic-compiler A/B on a tiny-row functor (circle fit: r=1,
    nt=3) at serving scale."""
    import numpy as np
    import ceres_tpu as ct
    from ceres_tpu.cost import AutoDiffCostFunction
    from ceres_tpu.examples.circle_fit import (DistanceFromCircleCost,
                                               synthesize)
    from ceres_tpu.program import CompiledProgram
    pts = synthesize(num_points=npoints)
    print(f"auto-circle: {npoints} points", flush=True)

    def build():
        x, y, m = np.array([0.1]), np.array([-0.2]), np.array([1.0])
        problem = ct.Problem()
        for xx, yy in pts:
            problem.add_residual_block(
                AutoDiffCostFunction(
                    DistanceFromCircleCost(float(xx), float(yy)),
                    1, [1, 1, 1]), None, x, y, m)
        return CompiledProgram(problem)

    return _ab_bucket_linearize(
        "auto-circle", build, {"CERES_TPU_NO_PALLAS_LINEARIZE": "1"})


def ab_auto_foe_linearize(size=96):
    """FoE bucket LINEARIZE A/B (autojet emitter vs jacfwd) on the real
    denoising problem — the VERDICT r3/r4 done-criterion shape (many
    tangent channels)."""
    import numpy as np
    DATA = "/root/reference/data"
    if not os.path.exists(os.path.join(DATA, "2x2.foe")):
        print("  (reference data unavailable; skipping FoE auto A/B)")
        return None
    from ceres_tpu.examples.denoising import (FieldsOfExperts,
                                              build_denoising_problem)
    from ceres_tpu.io.pgm import read_pgm
    from ceres_tpu.program import CompiledProgram
    img = np.asarray(read_pgm(os.path.join(DATA, "ceres_noisy.pgm"))
                     [:size, :size], dtype=np.float64)
    foe = FieldsOfExperts(os.path.join(DATA, "2x2.foe"))
    print(f"auto-foe: {size}x{size} crop", flush=True)

    def build():
        problem, _ = build_denoising_problem(img, foe)
        return CompiledProgram(problem)

    return _ab_bucket_linearize(
        "auto-foe", build, {"CERES_TPU_NO_PALLAS_LINEARIZE": "1"})


def ab_auto_dynamic(n=20000):
    """DynamicAutoDiffCostFunction bucket linearize A/B at serving scale
    (robot_pose_mle RangeConstraint, runtime-chosen block count) — the
    dynamic-cost shape of the r3 done-criterion."""
    import numpy as np
    import ceres_tpu as ct
    from ceres_tpu.cost import DynamicAutoDiffCostFunction
    from ceres_tpu.examples.robot_pose_mle import RangeConstraint
    from ceres_tpu.program import CompiledProgram
    print(f"auto-dynamic: {n} range constraints", flush=True)

    def build():
        blocks = [np.array([0.5 + 0.01 * i]) for i in range(3)]
        problem = ct.Problem()
        for k in range(n):
            cost = DynamicAutoDiffCostFunction(
                RangeConstraint(10.0 + 0.001 * k, 0.01, 30.0))
            for _ in range(3):
                cost.add_parameter_block(1)
            cost.set_num_residuals(1)
            problem.add_residual_block(cost, None, *blocks)
        return CompiledProgram(problem)

    return _ab_bucket_linearize(
        "auto-dynamic", build, {"CERES_TPU_NO_PALLAS_LINEARIZE": "1"})


def ab_autolin_phase(nobs=83718):
    """Full LIN-PHASE A/B on the Snavely hot shape: hand kernel vs the
    FORCED auto-emitted folded-epilogue kernel (_lin_kernel_auto) vs the
    generic jacfwd phase. 'Auto subsumes hand' means arm B ~ arm A."""
    import dataclasses
    import numpy as np
    import jax
    import jax.numpy as jnp
    import ceres_tpu as ct
    from ceres_tpu.io.bal import (synthetic_bal_problem,
                                  build_bal_ceres_problem)
    from ceres_tpu.program import CompiledProgram
    from ceres_tpu.solvers.schur import detect_schur_structure
    from ceres_tpu.solvers.schur_fused import make_fused_schur_lm_step
    ncam = max(4, nobs // 5232)
    npts = max(16, nobs // 4)
    bal = synthetic_bal_problem(ncam, npts, nobs, seed=7, pixel_noise=1.0)
    print(f"autolin-phase: {ncam} cams / {npts} pts / {nobs} obs",
          flush=True)
    opts = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
        use_mixed_precision_solves=True, fused_iterations=True)
    results = {}
    for tag, env in [("hand", {}),
                     ("auto", {"CERES_TPU_AUTOLIN_FORCE": "1"}),
                     ("jacfwd", {"CERES_TPU_NO_PALLAS_LIN": "1"})]:
        for kk, vv in env.items():
            os.environ[kk] = vv
        try:
            problem, _, _ = build_bal_ceres_problem(bal)
            prog = CompiledProgram.get_cached(problem, opts)
            meta = detect_schur_structure(prog, opts)
            lm = make_fused_schur_lm_step(prog, opts, meta)
            x0 = jnp.asarray(prog.initial_state())
            ones = jnp.ones((prog.num_effective,), prog.dtype)

            def lin_cost(xx, _lm=lm, _ones=ones):
                art = _lm.linearize(xx, _ones)
                return art["cost"].astype(jnp.float32)

            bound = prog.jit_with_consts(lin_cost, (x0,))
            per = _time_chained(lambda xx: bound(xx), x0)
            results[tag] = per
            print(f"  {tag:7s} lin phase: {per*1e3:.3f} ms/call "
                  f"(pallas_lin={lm.pallas_lin})", flush=True)
        finally:
            for kk in env:
                del os.environ[kk]
    if "hand" in results and "auto" in results:
        print(f"  autolin-phase auto/hand ratio: "
              f"{results['auto']/results['hand']:.2f}x "
              f"(jacfwd/auto speedup: "
              f"{results['jacfwd']/results['auto']:.2f}x)", flush=True)
    return results


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    num_poses = 20000
    img = 96
    if "--poses" in sys.argv:
        num_poses = int(sys.argv[sys.argv.index("--poses") + 1])
    if "--img" in sys.argv:
        img = int(sys.argv[sys.argv.index("--img") + 1])
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1].split(",")
    steps = [("pose3d", lambda: ab_pose3d(num_poses)),
             ("pose2d", lambda: ab_pose2d(num_poses)),
             ("foe", lambda: ab_foe(img)),
             ("auto_snavely", ab_auto_snavely),
             ("auto_circle", ab_auto_circle),
             ("auto_foe", ab_auto_foe_linearize),
             ("auto_dynamic", ab_auto_dynamic),
             ("autolin_phase", ab_autolin_phase)]
    for name, fn in steps:
        if only and name not in only:
            continue
        fn()


if __name__ == "__main__":
    main()
