"""TPU hardware smoke tests (the regression tier VERDICT r1 asked for:
the only TPU exercise used to be bench.py, and a real TPU-only failure —
the FoE full-image worker fault — had no harness around it)."""

import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.io.bal import build_bal_ceres_problem, synthetic_bal_problem


def test_bal_step_and_solve():
    """Mixed-precision fused DENSE_SCHUR solve on a mid-size BAL."""
    bal = synthetic_bal_problem(num_cameras=8, num_points=2000,
                                num_observations=8000, seed=5,
                                pixel_noise=1.0)
    bal.perturb(rotation_sigma=0.05, translation_sigma=0.5,
                point_sigma=0.2, seed=6)
    problem, _, _ = build_bal_ceres_problem(bal)
    s = ct.solve(ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
        use_mixed_precision_solves=True,
        max_num_iterations=30, function_tolerance=1e-6), problem)
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    assert s.final_cost < s.initial_cost


def test_chol_solve_kernel_on_device():
    import jax.numpy as jnp
    from ceres_tpu.ops.pallas_kernels import chol_solve_small
    rng = np.random.default_rng(0)
    m = 144
    A = rng.standard_normal((m, m + 4)).astype(np.float32)
    S = A @ A.T + m * np.eye(m, dtype=np.float32)
    b = rng.standard_normal(m).astype(np.float32)
    y = np.asarray(chol_solve_small(jnp.asarray(S), jnp.asarray(b)))
    ref = np.linalg.solve(S.astype(np.float64), b)
    assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-4


def test_foe_denoising_crop():
    """FoE denoising crop on hardware (the full 213x177 image faulted the
    v5e worker in round 1; fixed — the full image is exercised by
    test_foe_denoising_full, which is slow and env-gated)."""
    from ceres_tpu.examples.denoising import (FieldsOfExperts,
                                              build_denoising_problem)
    from ceres_tpu.io.pgm import read_pgm
    img = read_pgm("/root/reference/data/ceres_noisy.pgm")[:64, :64]
    foe = FieldsOfExperts("/root/reference/data/2x2.foe")
    problem, pixels = build_denoising_problem(
        np.asarray(img, dtype=np.float64), foe, sigma=20.0)
    s = ct.solve(ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.CGNR,
        preconditioner_type=ct.PreconditionerType.JACOBI,
        max_num_iterations=5, function_tolerance=1e-4), problem)
    assert s.final_cost < s.initial_cost


@pytest.mark.skipif(not __import__("os").environ.get("CERES_TPU_SLOW"),
                    reason="slow; set CERES_TPU_SLOW=1")
def test_foe_denoising_full_image():
    """The full 213x177 ceres_noisy.pgm program that faulted the tunneled
    v5e worker in round 1 — verified solving end to end on hardware."""
    from ceres_tpu.examples.denoising import (FieldsOfExperts,
                                              build_denoising_problem)
    from ceres_tpu.io.pgm import read_pgm
    img = read_pgm("/root/reference/data/ceres_noisy.pgm")
    foe = FieldsOfExperts("/root/reference/data/2x2.foe")
    problem, pixels = build_denoising_problem(
        np.asarray(img, dtype=np.float64), foe, sigma=20.0)
    s = ct.solve(ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.CGNR,
        preconditioner_type=ct.PreconditionerType.JACOBI,
        max_num_iterations=10, function_tolerance=1e-4), problem)
    assert s.termination_type == ct.TerminationType.CONVERGENCE


def test_nist_sample():
    """A NIST problem end to end on hardware (f64 path on device)."""
    from ceres_tpu.io.nist import (build_nist_problem, compute_lre,
                                   load_nist_suite)
    suite = {n.name: n for n in load_nist_suite(
        "/root/reference/data/nist")}
    nist = suite["Misra1a"]
    problem, b = build_nist_problem(nist, 1)
    s = ct.solve(ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_QR,
        max_num_iterations=200), problem)
    assert compute_lre(b, nist.certified) >= 4.0


def test_pallas_lin_phase_on_device():
    """The Snavely lin-phase Pallas kernel (ops/pallas_lin.py) must
    compile under the real Mosaic TPU compiler (interpret-mode parity is
    covered in tests/test_fused_schur.py) and agree with the generic
    fused step."""
    import os
    import jax.numpy as jnp
    from ceres_tpu import solver as solver_mod
    from ceres_tpu.program import CompiledProgram
    from ceres_tpu.solvers import schur_fused
    from ceres_tpu.solvers.schur import detect_schur_structure

    bal = synthetic_bal_problem(num_cameras=8, num_points=2000,
                                num_observations=8000, seed=5,
                                pixel_noise=1.0)
    bal.perturb(rotation_sigma=0.05, translation_sigma=0.5,
                point_sigma=0.2, seed=6)
    problem, _, _ = build_bal_ceres_problem(bal)
    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
        use_mixed_precision_solves=True)
    program = CompiledProgram.get_cached(problem, options)
    meta = detect_schur_structure(program, options)
    step = schur_fused.make_fused_schur_lm_step(program, options, meta)
    assert step.pallas_lin, "pallas lin gate rejected on TPU"

    x0 = program.initial_state()
    radius = jnp.asarray(1e4, program.dtype)
    ex = (program.example_x(), program.example_scalar(),
          program.example_delta())
    scale = solver_mod.make_scale_fn(program, options)(x0)
    a = program.jit_with_consts(
        solver_mod.make_step_impl(program, options), ex)(x0, radius, scale)
    os.environ["CERES_TPU_NO_PALLAS_LIN"] = "1"
    try:
        b = program.jit_with_consts(
            solver_mod.make_step_impl(program, options), ex)(x0, radius,
                                                             scale)
    finally:
        del os.environ["CERES_TPU_NO_PALLAS_LIN"]
    for k in ["cost", "gradient_max_norm", "delta", "model_cost_change"]:
        va, vb = np.asarray(a[k]), np.asarray(b[k])
        rel = np.max(np.abs(va - vb)) / (np.max(np.abs(vb)) + 1e-300)
        tol = 5e-4 if k == "delta" else 1e-5
        assert rel < tol, (k, rel)


def test_batched_solves_on_device():
    """ct.solve_batched (batch.py): a multi-start batch of BA solves as
    one vmapped fused program on the chip, each element matching its
    individual solve."""
    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
        use_mixed_precision_solves=True,
        max_num_iterations=30, function_tolerance=1e-6,
        fused_iterations=True)

    def build(perturb_seed):
        bal = synthetic_bal_problem(num_cameras=4, num_points=300,
                                    num_observations=1200, seed=11,
                                    pixel_noise=0.5)
        bal.perturb(rotation_sigma=0.05, translation_sigma=0.2,
                    point_sigma=0.1, seed=perturb_seed)
        return build_bal_ceres_problem(bal)[0]

    seeds = [1, 2, 3, 4]
    refs = [ct.solve(options, build(s)) for s in seeds]
    summaries = ct.solve_batched(options, [build(s) for s in seeds])
    for s_ref, s_b in zip(refs, summaries):
        assert s_b.termination_type == ct.TerminationType.CONVERGENCE
        np.testing.assert_allclose(s_b.final_cost, s_ref.final_cost,
                                   rtol=1e-6)


def test_implicit_fused_iterative_schur_on_device():
    """The one-hot-free implicit fused ITERATIVE_SCHUR mode (camera-chunk
    reductions) on hardware, forced at small size."""
    import os
    bal = synthetic_bal_problem(num_cameras=8, num_points=1000,
                                num_observations=4000, seed=3,
                                pixel_noise=1.0)
    bal.perturb(rotation_sigma=0.05, translation_sigma=0.3,
                point_sigma=0.1, seed=4)
    problem, _, _ = build_bal_ceres_problem(bal)
    ref_problem, _, _ = build_bal_ceres_problem(bal)
    s_ref = ct.solve(ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
        max_num_iterations=40, function_tolerance=1e-9), ref_problem)
    os.environ["CERES_TPU_FORCE_IMPLICIT"] = "1"
    try:
        opts_impl = ct.SolverOptions(
            linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
            use_mixed_precision_solves=True,
            max_num_iterations=40, function_tolerance=1e-9,
            fused_iterations=True)
        # The CG-apply megakernel is OPT-IN (round-5 hardware A/B at
        # 1M observations measured it 9x SLOWER than the XLA apply —
        # gather-bound; see solvers/schur_fused.py). Assert it still
        # ACTIVATES and compiles under the opt-in, then solve through
        # the default (XLA-apply) path.
        from ceres_tpu.program import CompiledProgram
        from ceres_tpu.solvers.schur import detect_schur_structure
        from ceres_tpu.solvers.schur_fused import make_fused_schur_lm_step
        os.environ["CERES_TPU_PALLAS_IMPLICIT"] = "1"
        try:
            prog = CompiledProgram.get_cached(problem, opts_impl)
            meta = detect_schur_structure(prog, opts_impl)
            step = make_fused_schur_lm_step(prog, opts_impl, meta)
            assert step.pallas_implicit, \
                "implicit CG-apply megakernel did not activate on device"
        finally:
            del os.environ["CERES_TPU_PALLAS_IMPLICIT"]
        s = ct.solve(opts_impl, problem)
    finally:
        del os.environ["CERES_TPU_FORCE_IMPLICIT"]
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    rel = abs(s.final_cost - s_ref.final_cost) / s_ref.final_cost
    assert rel < 1e-5, rel


def test_sparse_schur_on_device(monkeypatch):
    """Block-sparse SPARSE_SCHUR (schur_sparse.py): device pair-block
    assembly + host LDL^T round-trip per iteration, forced at small size,
    must reach the dense-S final cost on hardware."""
    def build():
        bal = synthetic_bal_problem(num_cameras=8, num_points=1000,
                                    num_observations=4000, seed=9,
                                    pixel_noise=1.0)
        bal.perturb(rotation_sigma=0.05, translation_sigma=0.3,
                    point_sigma=0.1, seed=10)
        return build_bal_ceres_problem(bal)[0]

    opts = dict(max_num_iterations=40, function_tolerance=1e-9,
                use_mixed_precision_solves=False)
    s_ref = ct.solve(ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR, **opts),
        build())
    monkeypatch.setenv("CERES_TPU_FORCE_SPARSE_SCHUR", "1")
    s = ct.solve(ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.SPARSE_SCHUR, **opts),
        build())
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    rel = abs(s.final_cost - s_ref.final_cost) / s_ref.final_cost
    assert rel < 1e-8, rel


def test_fused_line_search_on_device():
    """Whole L-BFGS + Wolfe loop as one device dispatch
    (minimizers/line_search_fused.py)."""
    params = np.array([-1.2, 1.0])

    class Rosen(ct.FirstOrderFunction):
        def cost(self, x):
            return (1.0 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    s = ct.solve_gradient_problem(
        ct.SolverOptions(minimizer_type=ct.MinimizerType.LINE_SEARCH,
                         max_num_iterations=200, fused_iterations=True),
        ct.GradientProblem(Rosen(2)), params)
    assert s.is_solution_usable(), s.message
    np.testing.assert_allclose(params, [1.0, 1.0], atol=1e-5)


def test_subset_preconditioner_device_on_tpu():
    """SUBSET preconditioner on the callback-less axon backend: the
    device-dense variant (factor once on device, triangular solves in the
    CG loop) closes the round-2 gap where the host-LDL^T callback could
    not run at all (subset_preconditioner.h:70 role)."""
    from ceres_tpu.io.g2o import synthetic_pose_graph_2d
    from ceres_tpu.examples.slam import build_pose_graph_2d_problem

    poses, constraints, _ = synthetic_pose_graph_2d(num_poses=60, seed=4)
    pr, _, _ = build_pose_graph_2d_problem(poses, constraints)
    rbs = pr.residual_blocks()[:59]
    s = ct.solve(ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.CGNR,
        preconditioner_type=ct.PreconditionerType.SUBSET,
        residual_blocks_for_subset_preconditioner=rbs,
        max_num_iterations=60), pr)
    assert s.is_solution_usable(), s.message

    pr2, _, _ = build_pose_graph_2d_problem(poses, constraints)
    s2 = ct.solve(ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.CGNR,
        preconditioner_type=ct.PreconditionerType.JACOBI,
        max_num_iterations=60), pr2)
    np.testing.assert_allclose(s.final_cost, s2.final_cost, rtol=1e-3)


def test_pose3d_linearize_kernel_on_device():
    """SE3 pose-graph Pallas linearize specialization compiles through
    Mosaic and matches the jacfwd path on hardware."""
    import jax.numpy as jnp
    from ceres_tpu.examples.slam import build_pose_graph_3d_problem
    from ceres_tpu.io.g2o import synthetic_pose_graph_3d
    from ceres_tpu.ops.pallas_linearize import (
        make_pallas_bucket_linearize, pallas_linearize_supported)
    from ceres_tpu.program import CompiledProgram

    poses, constraints, _ = synthetic_pose_graph_3d(num_poses=50, seed=4,
                                                    loop_every=5)
    problem, _, _ = build_pose_graph_3d_problem(poses, constraints)
    prog = CompiledProgram(problem)
    bks = [bk for bk in prog.buckets
           if pallas_linearize_supported(prog, bk)]
    assert bks, "pose3d bucket not matched by the kernel registry"
    bk = bks[0]
    lin = make_pallas_bucket_linearize(prog, bk)
    assert lin is not None, "Mosaic rejected the pose3d linearize kernel"
    import os as _os
    import jax as _jax
    x = prog.initial_state()
    bound = prog.jit_with_consts(lambda xx: lin(xx), (x,))
    r_got, J_got = _jax.device_get(bound(x))
    # reference: the jacfwd path (kernel disabled for the ref trace)
    _os.environ["CERES_TPU_NO_PALLAS_LINEARIZE"] = "1"
    try:
        r_ref, J_ref = _jax.device_get(_jax.jit(
            lambda xx: prog._bucket_linearize(
                bk, xx, cast_dtype=jnp.float32))(x))
    finally:
        del _os.environ["CERES_TPU_NO_PALLAS_LINEARIZE"]
    # the jacfwd REFERENCE is the less precise side here: its 6x6
    # sqrt_information matmul lowers to default-precision (bf16-pass)
    # TPU matmuls (values visibly bf16-quantized), while the jet kernel
    # is exact f32 — tolerance covers the reference's bf16 rounding
    np.testing.assert_allclose(r_got, r_ref, rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(J_got, J_ref, rtol=1e-2, atol=1e-2)


def test_cgnr_jtjv_kernel_on_device():
    """Single-pass J^T(Jv) CGNR kernel auto-enables on TPU for f32
    buckets and matches the two-einsum path."""
    import jax as _jax
    import jax.numpy as jnp
    from ceres_tpu.ops.pallas_kernels import (jac_normal_matvec,
                                              jtjv_default_on)

    bal = synthetic_bal_problem(num_cameras=4, num_points=300,
                                num_observations=1200, seed=3,
                                pixel_noise=0.5)
    problem, _, _ = build_bal_ceres_problem(bal)
    from ceres_tpu.program import CompiledProgram
    prog = CompiledProgram(problem)
    x = prog.initial_state()
    v_np = np.random.default_rng(0).standard_normal(prog.num_effective)
    gate = []

    def both(xx):
        _, _, jac, _ = prog.linearize_fn_mixed(xx)
        gate.append(jtjv_default_on(jac))
        v = jnp.asarray(v_np, dtype=jnp.float32)
        return jac_normal_matvec(jac, v), jac.rmatvec(jac.matvec(v))

    import os as _os
    _os.environ["CERES_TPU_PALLAS"] = "1"   # force past the 64 MB gate
    try:
        bound = prog.jit_with_consts(both, (x,))
        got, ref = _jax.device_get(bound(x))
    finally:
        del _os.environ["CERES_TPU_PALLAS"]
    # the auto-gate must be ON at this point only because of the force;
    # at this tiny J size the traffic threshold alone keeps it off
    assert gate and gate[0]
    # f32 summation-order noise only; scale atol by the result magnitude
    # (small entries see cancellation)
    np.testing.assert_allclose(got, ref, rtol=1e-3,
                               atol=1e-4 * float(np.abs(ref).max()))


def test_ds_cost_kernel_accuracy_on_device():
    """Double-single candidate-cost kernel (ops/pallas_cost.py) through
    the REAL Mosaic compiler: total cost must match the f64 residual
    pass to near-f64 accuracy (the strict bound interpret mode cannot
    carry — XLA CPU's optimizer degrades the error-free transformations
    when the interpret body inlines into the outer jit)."""
    import jax
    import ceres_tpu.solver  # noqa: F401
    from ceres_tpu.program import CompiledProgram
    from ceres_tpu.solvers.schur import detect_schur_structure
    from ceres_tpu.ops.pallas_cost import make_pallas_cost

    bal = synthetic_bal_problem(num_cameras=4, num_points=300,
                                num_observations=1200, seed=9,
                                pixel_noise=1.0)
    bal.perturb(rotation_sigma=0.1, translation_sigma=0.5,
                point_sigma=0.2, seed=10)
    problem, _, _ = build_bal_ceres_problem(bal)
    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
        use_mixed_precision_solves=True)
    program = CompiledProgram.get_cached(problem, options)
    meta = detect_schur_structure(program, options)
    pc = make_pallas_cost(program, options, meta)
    assert pc is not None, "Mosaic rejected the ds cost kernel"
    x = program.initial_state()
    c_ds = float(program.jit_with_consts(pc, (program.example_x(),))(x))
    c_64 = float(jax.jit(program.cost_fn)(x))
    rel = abs(c_ds - c_64) / max(abs(c_64), 1e-300)
    assert rel < 1e-12, (c_ds, c_64, rel)


def test_dense_pcg_kernel_on_device():
    """The whole-solve dense PCG kernel (ops/pallas_pcg.py) on hardware:
    Mosaic accepts the in-kernel while_loop, it activates for the fused
    explicit ITERATIVE_SCHUR path, and the LM trajectory matches the XLA
    CG loop exactly (same LM iterations, same total CG iterations)."""
    import os
    from ceres_tpu.program import CompiledProgram
    from ceres_tpu.solvers.schur import detect_schur_structure
    from ceres_tpu.solvers.schur_fused import make_fused_schur_lm_step

    def build():
        bal = synthetic_bal_problem(num_cameras=8, num_points=800,
                                    num_observations=3200, seed=3,
                                    pixel_noise=0.5)
        bal.perturb(rotation_sigma=0.05, translation_sigma=0.3,
                    point_sigma=0.2, seed=5)
        return build_bal_ceres_problem(bal)[0]

    def opts():
        return ct.SolverOptions(
            linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
            use_mixed_precision_solves=True, fused_iterations=True,
            max_num_iterations=30, function_tolerance=1e-6)

    problem = build()
    o = opts()
    prog = CompiledProgram.get_cached(problem, o)
    meta = detect_schur_structure(prog, o)
    step = make_fused_schur_lm_step(prog, o, meta)
    assert step.pallas_pcg, "dense PCG kernel did not activate on device"

    os.environ["CERES_TPU_NO_PALLAS_PCG"] = "1"
    try:
        s_off = ct.solve(opts(), build())
    finally:
        del os.environ["CERES_TPU_NO_PALLAS_PCG"]
    s_on = ct.solve(opts(), build())
    assert s_on.termination_type == ct.TerminationType.CONVERGENCE
    assert s_on.num_iterations == s_off.num_iterations
    assert s_on.num_linear_solver_iterations \
        == s_off.num_linear_solver_iterations
    np.testing.assert_allclose(s_on.final_cost, s_off.final_cost,
                               rtol=1e-5)
