"""Pose-graph SLAM end-to-end (reference slam examples, config 3:
SPARSE_NORMAL_CHOLESKY): optimized trajectory must recover ground truth
from noisy odometry initialization."""

import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.examples.slam import (build_pose_graph_2d_problem,
                                     build_pose_graph_3d_problem)
from ceres_tpu.io.g2o import (synthetic_pose_graph_2d,
                              synthetic_pose_graph_3d)


def traj_error_2d(positions, gt):
    return np.mean([np.linalg.norm(positions[i] - np.asarray([g.x, g.y]))
                    for i, g in enumerate(gt)])


def test_pose_graph_2d():
    poses, constraints, gt = synthetic_pose_graph_2d(num_poses=40, seed=1)
    problem, positions, yaws = build_pose_graph_2d_problem(poses,
                                                           constraints)
    err_before = traj_error_2d(positions, gt)
    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.SPARSE_NORMAL_CHOLESKY,
        max_num_iterations=100)
    summary = ct.solve(options, problem)
    assert summary.is_solution_usable(), summary.message
    err_after = traj_error_2d(positions, gt)
    assert err_after < 0.5 * err_before, (err_before, err_after)
    # yaw stays normalized (AngleManifold)
    for y in yaws.values():
        assert -np.pi <= y[0] <= np.pi


def test_pose_graph_3d():
    poses, constraints, gt = synthetic_pose_graph_3d(num_poses=30, seed=2,
                                                     loop_every=5)
    problem, positions, quats = build_pose_graph_3d_problem(poses,
                                                            constraints)
    err_before = np.mean([np.linalg.norm(positions[i] - g.p)
                          for i, g in enumerate(gt)])
    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.SPARSE_NORMAL_CHOLESKY,
        max_num_iterations=100)
    summary = ct.solve(options, problem)
    assert summary.is_solution_usable(), summary.message
    err_after = np.mean([np.linalg.norm(positions[i] - g.p)
                         for i, g in enumerate(gt)])
    assert err_after < 0.65 * err_before, (err_before, err_after)
    assert summary.final_cost < 0.25 * summary.initial_cost
    for q in quats.values():
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, rtol=1e-9)


def test_g2o_roundtrip(tmp_path):
    from ceres_tpu.io.g2o import read_g2o_2d
    poses, constraints, gt = synthetic_pose_graph_2d(num_poses=10, seed=3)
    p = tmp_path / "graph.g2o"
    with open(p, "w") as f:
        for i in sorted(poses):
            pp = poses[i]
            f.write(f"VERTEX_SE2 {i} {pp.x} {pp.y} {pp.yaw}\n")
        for c in constraints:
            info = c.information
            vals = " ".join(str(info[i, j]) for i in range(3)
                            for j in range(i, 3))
            f.write(f"EDGE_SE2 {c.id_begin} {c.id_end} "
                    f"{c.x} {c.y} {c.yaw} {vals}\n")
    poses2, cons2 = read_g2o_2d(str(p))
    assert len(poses2) == len(poses) and len(cons2) == len(constraints)
    np.testing.assert_allclose(cons2[0].information,
                               constraints[0].information)
