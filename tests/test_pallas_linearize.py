"""Interpret-mode parity of the shape-driven Pallas bucket-linearize
specializations (ops/pallas_linearize.py) vs the vmap(jacfwd) path."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.examples.slam import build_pose_graph_3d_problem
from ceres_tpu.io.g2o import synthetic_pose_graph_3d
from ceres_tpu.program import CompiledProgram


@pytest.fixture
def pose3d_program():
    poses, constraints, _ = synthetic_pose_graph_3d(num_poses=25, seed=4,
                                                    loop_every=5)
    problem, _, _ = build_pose_graph_3d_problem(poses, constraints)
    return CompiledProgram(problem)


def _with_interpret(fn):
    os.environ["CERES_TPU_PALLAS_INTERPRET"] = "1"
    try:
        return fn()
    finally:
        del os.environ["CERES_TPU_PALLAS_INTERPRET"]


def _supported_bucket(prog):
    from ceres_tpu.ops.pallas_linearize import pallas_linearize_supported
    return [bk for bk in prog.buckets
            if _with_interpret(
                lambda: pallas_linearize_supported(prog, bk))]


def test_pose3d_bucket_gate(pose3d_program):
    # Since the round-4 autojet compiler (ops/jet_compile.py), BOTH pose3d
    # buckets are kernel-eligible: the all-variable bucket via the hand
    # registry and the gauge-fixed constant-slot bucket via the auto-emitted
    # jet kernel.  Assert the coverage spec explicitly: every bucket is
    # supported, and the dominant (largest-n) bucket is among them.
    prog = pose3d_program
    supported = _supported_bucket(prog)
    assert len(supported) == len(prog.buckets)
    dominant = max(prog.buckets, key=lambda bk: bk.n)
    assert dominant in supported


def test_pose3d_kernel_matches_jacfwd(pose3d_program):
    from ceres_tpu.ops.pallas_linearize import make_pallas_bucket_linearize
    prog = pose3d_program
    bk = _supported_bucket(prog)[0]
    x = prog.initial_state()
    # perturb away from the identity-adjacent start so the Jacobian has
    # no accidental structure
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.asarray(x)
                    + 0.05 * rng.standard_normal(x.shape))
    # reference: the jacfwd path in the same f32 precision
    r_ref, J_ref = prog._bucket_linearize(bk, x, cast_dtype=jnp.float32)

    def run():
        lin = make_pallas_bucket_linearize(prog, bk)
        assert lin is not None
        return lin(x.astype(jnp.float32))

    r_got, J_got = _with_interpret(run)
    assert r_got.shape == r_ref.shape and J_got.shape == J_ref.shape
    np.testing.assert_allclose(np.asarray(r_got), np.asarray(r_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(J_got), np.asarray(J_ref),
                               rtol=2e-4, atol=2e-4)


def test_pose3d_solve_with_kernel_matches(pose3d_program):
    """End-to-end: mixed-precision solve with the kernel active matches
    the jacfwd solve's final cost."""
    poses, constraints, _ = synthetic_pose_graph_3d(num_poses=25, seed=4,
                                                    loop_every=5)

    def solve(env):
        for k, v in env.items():
            os.environ[k] = v
        try:
            problem, _, _ = build_pose_graph_3d_problem(poses, constraints)
            return ct.solve(ct.SolverOptions(
                linear_solver_type=ct.LinearSolverType.CGNR,
                use_mixed_precision_solves=True,
                max_num_iterations=30), problem)
        finally:
            for k in env:
                del os.environ[k]

    s_kernel = solve({"CERES_TPU_PALLAS_INTERPRET": "1"})
    s_plain = solve({"CERES_TPU_NO_PALLAS_LINEARIZE": "1"})
    assert s_kernel.is_solution_usable()
    assert abs(s_kernel.final_cost - s_plain.final_cost) <= \
        1e-4 * max(1.0, s_plain.final_cost), \
        (s_kernel.final_cost, s_plain.final_cost)


def test_pose2d_kernel_matches_jacfwd():
    from ceres_tpu.examples.slam import build_pose_graph_2d_problem
    from ceres_tpu.io.g2o import synthetic_pose_graph_2d
    from ceres_tpu.ops.pallas_linearize import make_pallas_bucket_linearize

    poses, constraints, _ = synthetic_pose_graph_2d(num_poses=40, seed=6)
    problem, _, _ = build_pose_graph_2d_problem(poses, constraints)
    prog = CompiledProgram(problem)
    bks = _supported_bucket(prog)
    assert bks, "pose2d bucket not matched by the kernel registry"
    bk = bks[0]
    x = prog.initial_state()
    rng = np.random.default_rng(1)
    x = jnp.asarray(np.asarray(x) + 0.1 * rng.standard_normal(x.shape))
    r_ref, J_ref = prog._bucket_linearize(bk, x, cast_dtype=jnp.float32)

    def run():
        lin = make_pallas_bucket_linearize(prog, bk)
        assert lin is not None
        return lin(x.astype(jnp.float32))

    r_got, J_got = _with_interpret(run)
    np.testing.assert_allclose(np.asarray(r_got), np.asarray(r_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(J_got), np.asarray(J_ref),
                               rtol=2e-4, atol=2e-4)
