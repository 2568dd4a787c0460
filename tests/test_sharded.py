"""Multi-chip sharded execution tests on the 8-virtual-device CPU mesh:
residual-block data parallelism with psum reductions (SURVEY.md section
5.7/5.8 — the reference has no distributed analog, so these are fresh
host-count-parameterized tests per the project test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import ceres_tpu as ct
from ceres_tpu.io.bal import synthetic_bal_problem, build_bal_ceres_problem
from ceres_tpu.program import CompiledProgram
from ceres_tpu.solver import make_step_fn
from ceres_tpu.parallel.sharded import (make_sharded_cost_fn,
                                        make_sharded_lm_step,
                                        make_sharded_schur_step)


def _mesh(n):
    devs = jax.devices()[:n]
    if len(devs) < n:
        pytest.skip(f"need {n} devices")
    return Mesh(np.asarray(devs), axis_names=("data",))


def _problem():
    bal = synthetic_bal_problem(3, 40, 120, seed=5, pixel_noise=0.5)
    bal.perturb(rotation_sigma=0.02, translation_sigma=0.05,
                point_sigma=0.05, seed=6)
    problem, cams, pts = build_bal_ceres_problem(bal)
    return problem


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_cgnr_step_decreases_cost(ndev):
    mesh = _mesh(ndev)
    problem = _problem()
    prog = CompiledProgram(problem)
    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.CGNR,
        max_linear_solver_iterations=100)
    step_fn, shards_np, place = make_sharded_lm_step(prog, options, mesh)
    shards = place(shards_np)
    x = prog.initial_state()
    out = step_fn(x, jnp.asarray(1e4, prog.dtype), shards)
    cost_fn = make_sharded_cost_fn(prog, mesh, shards_np)
    new_cost = float(cost_fn(prog.plus(x, out["delta"]), shards))
    assert np.isfinite(float(out["cost"]))
    assert new_cost < float(out["cost"])


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_schur_step_matches_single_device(ndev):
    """The sharded Schur elimination (partial Grams + psum + replicated
    reduced solve) must produce the same step as the single-device
    DENSE_SCHUR solver."""
    mesh = _mesh(ndev)
    problem = _problem()
    prog = CompiledProgram(problem)
    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR)
    step_fn, shards_np, place = make_sharded_schur_step(prog, options,
                                                        mesh)
    shards = place(shards_np)
    x = prog.initial_state()
    radius = jnp.asarray(1e4, prog.dtype)
    out = step_fn(x, radius, shards)

    ref = make_step_fn(prog, options)(x, radius)
    np.testing.assert_allclose(np.asarray(out["delta"]),
                               np.asarray(ref["delta"]), rtol=1e-6,
                               atol=1e-10)
    np.testing.assert_allclose(float(out["cost"]), float(ref["cost"]),
                               rtol=1e-12)
    np.testing.assert_allclose(float(out["model_cost_change"]),
                               float(ref["model_cost_change"]), rtol=1e-6)


def test_sharded_schur_full_solve_trajectory():
    """A few sharded Schur LM iterations driven by the host loop reach the
    same cost as the single-device solve."""
    mesh = _mesh(8)
    problem = _problem()
    prog = CompiledProgram(problem)
    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR)
    step_fn, shards_np, place = make_sharded_schur_step(prog, options,
                                                        mesh)
    shards = place(shards_np)
    cost_fn = make_sharded_cost_fn(prog, mesh, shards_np)
    x = prog.initial_state()
    radius = 1e4
    cost = None
    for _ in range(5):
        out = step_fn(x, jnp.asarray(radius, prog.dtype), shards)
        x_new = prog.plus(x, out["delta"])
        new_cost = float(cost_fn(x_new, shards))
        if new_cost < float(out["cost"]):
            x = x_new
            radius = min(radius * 3.0, 1e16)
            cost = new_cost
        else:
            radius /= 2.0

    problem2 = _problem()
    s = ct.solve(ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
        max_num_iterations=5), problem2)
    assert cost is not None
    np.testing.assert_allclose(cost, s.final_cost, rtol=5e-2)


def test_collective_footprint_analytic():
    """Exact per-iteration collective volume (PERF.md mesh-proxy table)."""
    from ceres_tpu.parallel.sharded_fused import collective_footprint
    from ceres_tpu.solvers.schur import detect_schur_structure
    from ceres_tpu.program import CompiledProgram
    from ceres_tpu.io.bal import (synthetic_bal_problem,
                                  build_bal_ceres_problem)

    bal = synthetic_bal_problem(4, 60, 200, seed=3, pixel_noise=0.5)
    problem, _, _ = build_bal_ceres_problem(bal)
    opts = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR)
    prog = CompiledProgram.get_cached(problem, opts)
    meta = detect_schur_structure(prog, opts)
    fp = collective_footprint(meta, opts, 8)
    kf, tf, ne, te = 4, 9, meta.ne, meta.te
    nf = kf * tf
    assert fp["psum_count"] == 4
    assert fp["psum_bytes"] == 4 * (
        (1 + kf * tf * tf + kf * tf + 2) + (nf * nf + nf) + 3 + 1)
    assert fp["allgather_bytes"] == 4 * ne * te
    assert fp["total_bytes"] == fp["psum_bytes"] + fp["allgather_bytes"]

    opts_i = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR)
    fpi = collective_footprint(meta, opts_i, 8, cg_iterations=10)
    assert fpi["psum_count"] == 14
    assert fpi["psum_bytes"] < fp["psum_bytes"]  # no nf^2 psum
