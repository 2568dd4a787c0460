"""Robot pose MLE: DynamicAutoDiffCostFunction demo
(reference examples/robot_pose_mle.cc).

A robot drives down a corridor taking noisy odometry and noisy range
(distance-to-end) readings. Each relative pose is one 1-D parameter block.
OdometryConstraint touches one block; RangeConstraint at pose i touches
blocks 0..i — a runtime-chosen parameter count, the DynamicAutoDiffCost
use-case. The cumulative-sum structure makes each RangeConstraint bucket
distinct, exactly like the reference's per-constraint cost functions.

CLI: python -m ceres_tpu.examples.robot_pose_mle [--corridor_length L]
     [--pose_separation D] [--odometry_stddev S] [--range_stddev S]
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class OdometryConstraint:
    def __init__(self, odometry_mean: float, odometry_stddev: float):
        self.odometry_mean = odometry_mean
        self.odometry_stddev = odometry_stddev

    def __call__(self, odometry):
        return (odometry - self.odometry_mean) / self.odometry_stddev


class RangeConstraint:
    def __init__(self, range_reading: float, range_stddev: float,
                 corridor_length: float):
        self.range_reading = range_reading
        self.range_stddev = range_stddev
        self.corridor_length = corridor_length

    def __call__(self, relative_poses):
        global_pose = jnp.sum(jnp.concatenate(
            [jnp.reshape(p, (1,)) for p in relative_poses]))
        return jnp.reshape(
            (global_pose + self.range_reading - self.corridor_length)
            / self.range_stddev, (1,))


def simulate_robot(corridor_length=30.0, pose_separation=0.5,
                   odometry_stddev=0.1, range_stddev=0.01, seed=0):
    rng = np.random.default_rng(seed)
    num_steps = int(np.ceil(corridor_length / pose_separation))
    odometry_values, range_readings = [], []
    location = 0.0
    for _ in range(num_steps):
        actual_odometry = min(pose_separation, corridor_length - location)
        location += actual_odometry
        odometry_values.append(actual_odometry
                               + rng.normal(0.0, odometry_stddev))
        range_readings.append((corridor_length - location)
                              + rng.normal(0.0, range_stddev))
    return odometry_values, range_readings


def solve_robot_pose_mle(odometry_values, range_readings,
                         corridor_length=30.0, odometry_stddev=0.1,
                         range_stddev=0.01, options=None):
    """Returns (corrected odometry list of 1-arrays, summary)."""
    import ceres_tpu as ct
    from ceres_tpu.cost import (AutoDiffCostFunction,
                                DynamicAutoDiffCostFunction)

    blocks = [np.array([v]) for v in odometry_values]
    problem = ct.Problem()
    for i, (odo, rng_read) in enumerate(zip(odometry_values,
                                            range_readings)):
        problem.add_residual_block(
            AutoDiffCostFunction(
                OdometryConstraint(float(odo), odometry_stddev), 1, [1]),
            None, blocks[i])
        range_cost = DynamicAutoDiffCostFunction(
            RangeConstraint(float(rng_read), range_stddev, corridor_length))
        for _ in range(i + 1):
            range_cost.add_parameter_block(1)
        range_cost.set_num_residuals(1)
        problem.add_residual_block(range_cost, None, *blocks[:i + 1])

    if options is None:
        options = ct.SolverOptions(max_num_iterations=500)
    summary = ct.solve(options, problem)
    return blocks, summary


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--corridor_length", type=float, default=30.0)
    ap.add_argument("--pose_separation", type=float, default=0.5)
    ap.add_argument("--odometry_stddev", type=float, default=0.1)
    ap.add_argument("--range_stddev", type=float, default=0.01)
    args = ap.parse_args(argv)

    odometry, ranges = simulate_robot(
        args.corridor_length, args.pose_separation,
        args.odometry_stddev, args.range_stddev)
    blocks, summary = solve_robot_pose_mle(
        odometry, ranges, args.corridor_length,
        args.odometry_stddev, args.range_stddev)
    print(summary.brief_report())
    loc = 0.0
    for i, b in enumerate(blocks):
        loc += float(b[0])
    print(f"final estimated location: {loc:.4f} "
          f"(corridor length {args.corridor_length})")


if __name__ == "__main__":
    main()
