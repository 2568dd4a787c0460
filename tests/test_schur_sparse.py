"""Block-sparse SPARSE_SCHUR (schur_sparse.py): the device-assembled
co-visibility pair blocks + native host LDL^T must reproduce the dense
explicit-S path exactly (same S, same step, same solve trajectory) — the
role of the reference's sparse SchurComplementSolver tests
(schur_complement_solver_test.cc)."""

import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.io.bal import synthetic_bal_problem, build_bal_ceres_problem
from ceres_tpu.program import CompiledProgram
from ceres_tpu.solvers.schur import detect_schur_structure, SchurOps
from ceres_tpu.solvers import schur_sparse


def _bal_problem(ncam=6, npts=80, nobs=300, seed=3):
    bal = synthetic_bal_problem(num_cameras=ncam, num_points=npts,
                                num_observations=nobs, seed=seed,
                                pixel_noise=0.5)
    bal.perturb(rotation_sigma=0.02, translation_sigma=0.1,
                point_sigma=0.05, seed=seed + 1)
    return build_bal_ceres_problem(bal)[0]


def _options(solver, **kw):
    return ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType[solver],
        max_num_iterations=40, function_tolerance=1e-9,
        use_mixed_precision_solves=False, **kw)


def test_sparse_s_matches_dense_s(monkeypatch):
    """The expanded block-sparse S equals the dense explicit S."""
    monkeypatch.setenv("CERES_TPU_FORCE_SPARSE_SCHUR", "1")
    problem = _bal_problem()
    options = _options("SPARSE_SCHUR")
    program = CompiledProgram(problem)
    meta = detect_schur_structure(program, options)
    assert schur_sparse.use_sparse_schur(meta, options)

    import jax.numpy as jnp
    _, _, jac, _ = program.linearize_fn(program.initial_state())
    D = 0.3 * jnp.ones(program.num_effective)
    ops = SchurOps(meta, jac, D)
    ctx = schur_sparse.get_sparse_schur_context(meta, program, options)
    vals = np.asarray(schur_sparse.sparse_schur_block_values(
        meta, jac, ops.inv_ete, ctx))

    # expand pair blocks to a dense group-local S and add the damping
    kf, t = ctx.kf, ctx.t
    values = np.zeros(ctx.csc_of_block.size)
    values[ctx.csc_of_block] = vals.reshape(-1)
    d_sq = (np.asarray(ops.D_f) ** 2)[ctx.cols_flat]
    values[ctx.diag_pos] += d_sq
    S_sp = np.zeros((kf * t, kf * t))
    for c in range(kf * t):
        for p in range(ctx.Ap[c], ctx.Ap[c + 1]):
            S_sp[ctx.Ai[p], c] = values[p]

    S_dense = np.asarray(ops.explicit_S())
    S_dense_local = S_dense[np.ix_(ctx.cols_flat, ctx.cols_flat)]
    np.testing.assert_allclose(S_sp, S_dense_local, rtol=1e-10, atol=1e-9)


def test_sparse_schur_step_matches_dense(monkeypatch):
    """solve_b through the sparse path equals the dense-Cholesky step."""
    problem = _bal_problem()
    program = CompiledProgram(problem)
    import jax.numpy as jnp
    x = program.initial_state()
    _, _, jac, res = program.linearize_fn(x)
    D = 0.2 * jnp.ones(program.num_effective)

    from ceres_tpu.solvers.schur import make_schur_solver
    dense = make_schur_solver(program, _options("DENSE_SCHUR"))
    d_ref, _ = dense(jac, res, D)

    monkeypatch.setenv("CERES_TPU_FORCE_SPARSE_SCHUR", "1")
    # fresh program: the solver closure binds sparse_ctx at construction
    program2 = CompiledProgram(problem)
    _, _, jac2, res2 = program2.linearize_fn(program2.initial_state())
    sparse = make_schur_solver(program2, _options("SPARSE_SCHUR"))
    d_sp, _ = sparse(jac2, res2, D)

    np.testing.assert_allclose(np.asarray(d_sp), np.asarray(d_ref),
                               rtol=1e-8, atol=1e-10)


def test_sparse_schur_solve_end_to_end(monkeypatch):
    ref = ct.solve(_options("DENSE_SCHUR", fused_iterations=False),
                   _bal_problem())
    assert ref.termination_type == ct.TerminationType.CONVERGENCE

    monkeypatch.setenv("CERES_TPU_FORCE_SPARSE_SCHUR", "1")
    s = ct.solve(_options("SPARSE_SCHUR", fused_iterations=True),
                 _bal_problem())
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    rel = abs(s.final_cost - ref.final_cost) / ref.final_cost
    assert rel < 1e-8, rel


def test_sparse_schur_cross_bucket_duplicates(monkeypatch):
    """The same (camera, point) pair in two buckets (robust + plain rows):
    cross-bucket correction pairs must land in the same co-visibility
    block."""
    from ceres_tpu.examples.snavely import SnavelyReprojectionError

    def build():
        bal = synthetic_bal_problem(num_cameras=4, num_points=50,
                                    num_observations=150, seed=7,
                                    pixel_noise=0.5)
        bal.perturb(rotation_sigma=0.02, translation_sigma=0.1,
                    point_sigma=0.05, seed=8)
        cams = [bal.cameras[i].copy() for i in range(bal.num_cameras)]
        pts = [bal.points[i].copy() for i in range(bal.num_points)]
        problem = ct.Problem()
        for i in range(bal.num_observations):
            ox, oy = bal.observations[i]
            for loss in (ct.HuberLoss(2.0), None):
                cost = ct.AutoDiffCostFunction(
                    SnavelyReprojectionError(ox, oy), 2, [9, 3])
                problem.add_residual_block(cost, loss,
                                           cams[bal.camera_index[i]],
                                           pts[bal.point_index[i]])
        return problem

    ref = ct.solve(_options("DENSE_SCHUR", fused_iterations=False), build())
    monkeypatch.setenv("CERES_TPU_FORCE_SPARSE_SCHUR", "1")
    s = ct.solve(_options("SPARSE_SCHUR", fused_iterations=False), build())
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    rel = abs(s.final_cost - ref.final_cost) / ref.final_cost
    assert rel < 1e-8, rel


def test_sparse_schur_with_camera_prior(monkeypatch):
    """An f-only bucket (NormalPrior on one camera) contributes to the
    block diagonal of the sparse S."""
    def build():
        bal = synthetic_bal_problem(num_cameras=5, num_points=60,
                                    num_observations=220, seed=11,
                                    pixel_noise=0.5)
        bal.perturb(rotation_sigma=0.02, translation_sigma=0.1,
                    point_sigma=0.05, seed=12)
        problem, cams, pts = build_bal_ceres_problem(bal)
        A = np.eye(9) * 2.0
        b = np.asarray(cams[0]).copy()
        problem.add_residual_block(ct.NormalPrior(A, b), None, cams[0])
        return problem

    ref = ct.solve(_options("DENSE_SCHUR", fused_iterations=False), build())
    monkeypatch.setenv("CERES_TPU_FORCE_SPARSE_SCHUR", "1")
    s = ct.solve(_options("SPARSE_SCHUR", fused_iterations=False), build())
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    rel = abs(s.final_cost - ref.final_cost) / ref.final_cost
    assert rel < 1e-8, rel


def test_sparse_schur_mixed_precision(monkeypatch):
    """Mixed mode: f32 block assembly, f64 host factorization — must still
    reach the f64 dense final cost."""
    ref = ct.solve(_options("DENSE_SCHUR", fused_iterations=False),
                   _bal_problem())
    monkeypatch.setenv("CERES_TPU_FORCE_SPARSE_SCHUR", "1")
    opts = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.SPARSE_SCHUR,
        max_num_iterations=60, function_tolerance=1e-9,
        use_mixed_precision_solves=True, fused_iterations=False)
    s = ct.solve(opts, _bal_problem())
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    rel = abs(s.final_cost - ref.final_cost) / ref.final_cost
    assert rel < 1e-5, rel
