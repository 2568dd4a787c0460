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


def _time_chained(fn, x, reps=64):
    """Median of 3 chained-fori timings of a jitted x->scalar fn.

    Execution is forced by PULLING the scalar result (device_get): on the
    axon backend block_until_ready alone does not force a re-dispatch of
    an identical in-flight call, and the tunnel's fixed pull cost is
    measured separately and subtracted."""
    import jax
    import jax.numpy as jnp

    def chain(x0, eps):
        def body(_, c):
            return c + fn(x0 * (1.0 + eps) + c * 1e-30)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    run = jax.jit(chain)
    trivial = jax.jit(lambda x0, eps: (x0[0] * eps).astype(jnp.float32))
    jax.device_get(run(x, 0.0))
    jax.device_get(trivial(x, 0.0))
    ts = []
    for i in range(3):
        eps = 1e-13 * (i + 1)
        t0 = time.perf_counter()
        jax.device_get(trivial(x, eps))
        base = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(run(x, eps))
        ts.append(max(time.perf_counter() - t0 - base, 0.0) / reps)
    return sorted(ts)[1]


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


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    num_poses = 20000
    img = 96
    if "--poses" in sys.argv:
        num_poses = int(sys.argv[sys.argv.index("--poses") + 1])
    if "--img" in sys.argv:
        img = int(sys.argv[sys.argv.index("--img") + 1])
    ab_pose3d(num_poses)
    ab_foe(img)


if __name__ == "__main__":
    main()
