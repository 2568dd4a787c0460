"""2D/3D pose-graph SLAM (reference examples/slam/pose_graph_{2d,3d}).

PoseGraph2dErrorTerm (pose_graph_2d_error_term.h:60), AngleManifold
(angle_manifold.h:41), PoseGraph3dErrorTerm (pose_graph_3d_error_term.h:71)
with EigenQuaternionManifold. Problem build mirrors
pose_graph_2d.cc BuildOptimizationProblem / pose_graph_3d.cc.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

import ceres_tpu as ct
from ceres_tpu.manifolds import AutoDiffManifold


def normalize_angle(a):
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def angle_manifold() -> AutoDiffManifold:
    """SO(2) via 2-pi wrapping (reference angle_manifold.h:41)."""
    return AutoDiffManifold(
        plus_fn=lambda x, d: normalize_angle(x + d),
        minus_fn=lambda y, x: normalize_angle(y - x),
        ambient_size=1, tangent_size=1)


class PoseGraph2dErrorTerm:
    """residual = sqrt_info * [R_a^T (p_b - p_a) - t_ab;
                               normalize(yaw_b - yaw_a - yaw_ab)]."""

    def __init__(self, x_ab, y_ab, yaw_ab, sqrt_information):
        self.t_ab = np.asarray([x_ab, y_ab])
        self.yaw_ab = yaw_ab
        self.sqrt_information = np.asarray(sqrt_information)

    def __call__(self, p_a, yaw_a, p_b, yaw_b):
        c = jnp.cos(yaw_a[0])
        s = jnp.sin(yaw_a[0])
        d = p_b - p_a
        local = jnp.stack([c * d[0] + s * d[1], -s * d[0] + c * d[1]])
        r = jnp.concatenate([
            local - self.t_ab,
            normalize_angle(yaw_b - yaw_a - self.yaw_ab)])
        return self.sqrt_information @ r


class PoseGraph3dErrorTerm:
    """Eigen-order (x,y,z,w) quaternions (pose_graph_3d_error_term.h:71):
    residual = sqrt_info * [R(q_a)^T (p_b - p_a) - t_ab;
                            2 * vec(q_ab^-1 * (q_a^-1 q_b))]."""

    def __init__(self, t_ab, q_ab, sqrt_information):
        self.t_ab = np.asarray(t_ab)
        self.q_ab = np.asarray(q_ab)          # (x,y,z,w)
        self.sqrt_information = np.asarray(sqrt_information)

    @staticmethod
    def _q_mul(q1, q2):
        x1, y1, z1, w1 = q1[0], q1[1], q1[2], q1[3]
        x2, y2, z2, w2 = q2[0], q2[1], q2[2], q2[3]
        return jnp.stack([
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2])

    @staticmethod
    def _q_conj(q):
        return jnp.stack([-q[0], -q[1], -q[2], q[3]])

    @classmethod
    def _q_rot(cls, q, v):
        qv = jnp.concatenate([v, jnp.zeros((1,), dtype=v.dtype)])
        return cls._q_mul(cls._q_mul(q, qv), cls._q_conj(q))[:3]

    def __call__(self, p_a, q_a, p_b, q_b):
        qa_inv = self._q_conj(q_a)
        p_ab_est = self._q_rot(qa_inv, p_b - p_a)
        q_ab_est = self._q_mul(qa_inv, q_b)
        dq = self._q_mul(self._q_conj(jnp.asarray(self.q_ab)), q_ab_est)
        r = jnp.concatenate([p_ab_est - self.t_ab, 2.0 * dq[:3]])
        return self.sqrt_information @ r


def build_pose_graph_2d_problem(poses, constraints, loss=None):
    """pose_graph_2d.cc BuildOptimizationProblem: first pose fixed (gauge).
    Returns (problem, positions dict id->np[2], yaws dict id->np[1])."""
    positions = {i: np.asarray([p.x, p.y]) for i, p in poses.items()}
    yaws = {i: np.asarray([p.yaw]) for i, p in poses.items()}
    problem = ct.Problem()
    a_manifold = angle_manifold()
    for c in constraints:
        sqrt_info = np.linalg.cholesky(c.information).T
        cost = ct.AutoDiffCostFunction(
            PoseGraph2dErrorTerm(c.x, c.y, c.yaw, sqrt_info), 3,
            [2, 1, 2, 1])
        problem.add_residual_block(cost, loss,
                                   positions[c.id_begin], yaws[c.id_begin],
                                   positions[c.id_end], yaws[c.id_end])
        problem.set_manifold(yaws[c.id_begin], a_manifold)
        problem.set_manifold(yaws[c.id_end], a_manifold)
    first = min(poses)
    problem.set_parameter_block_constant(positions[first])
    problem.set_parameter_block_constant(yaws[first])
    return problem, positions, yaws


def build_pose_graph_3d_problem(poses, constraints, loss=None):
    """pose_graph_3d.cc: EigenQuaternionManifold on rotations, first pose
    fixed. Returns (problem, positions, quaternions)."""
    positions = {i: p.p.copy() for i, p in poses.items()}
    quats = {i: p.q.copy() for i, p in poses.items()}
    problem = ct.Problem()
    q_manifold = ct.EigenQuaternionManifold()
    for c in constraints:
        sqrt_info = np.linalg.cholesky(c.information).T
        cost = ct.AutoDiffCostFunction(
            PoseGraph3dErrorTerm(c.t, c.q, sqrt_info), 6, [3, 4, 3, 4])
        problem.add_residual_block(cost, loss,
                                   positions[c.id_begin], quats[c.id_begin],
                                   positions[c.id_end], quats[c.id_end])
        problem.set_manifold(quats[c.id_begin], q_manifold)
        problem.set_manifold(quats[c.id_end], q_manifold)
    first = min(poses)
    problem.set_parameter_block_constant(positions[first])
    problem.set_parameter_block_constant(quats[first])
    return problem, positions, quats
