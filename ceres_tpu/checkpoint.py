"""Checkpoint / resume for long solves.

The reference has no built-in checkpointing (SURVEY.md section 5.4) — users
emulate it with update_state_every_iteration + IterationCallback. Here both
are supported:

  * CheckpointCallback: an IterationCallback that snapshots the solver
    state every k iterations (parameters, trust-region radius, iteration)
    to an .npz; `resume=` restarts a solve from a snapshot.
  * Trust-region problem dumping (reference solver.h:724-734
    trust_region_problem_dump_*): dump_linear_problem writes the
    per-iteration (J, D, b, x) for offline debugging.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .types import CallbackReturnType


def save_state(path: str, problem, iteration: int = 0,
               trust_region_radius: float = 1e4, extra: Optional[dict] = None):
    """Snapshot all parameter-block values (+ scalars) to an npz."""
    blocks = problem.parameter_blocks()
    payload = {f"block_{i}": np.asarray(b) for i, b in enumerate(blocks)}
    payload["iteration"] = np.asarray(iteration)
    payload["trust_region_radius"] = np.asarray(trust_region_radius)
    for k, v in (extra or {}).items():
        payload["extra_" + k] = np.asarray(v)
    np.savez(path, **payload)


def load_state(path: str, problem) -> dict:
    """Restore parameter-block values in place; returns the scalar state."""
    data = np.load(path)
    blocks = problem.parameter_blocks()
    for i, b in enumerate(blocks):
        key = f"block_{i}"
        if key not in data:
            raise ValueError(f"checkpoint missing {key}; problem structure "
                             f"changed since the snapshot")
        if data[key].shape != b.shape:
            raise ValueError(f"{key} shape mismatch")
        b[:] = data[key]
    out = {"iteration": int(data["iteration"]),
           "trust_region_radius": float(data["trust_region_radius"])}
    for k in data.files:
        if k.startswith("extra_"):
            out[k[6:]] = data[k]
    return out


class CheckpointCallback:
    """IterationCallback writing periodic snapshots. Use with
    options.update_state_every_iteration semantics: state is written back to
    the user arrays only after the solve here, so the callback snapshots
    from the solver summary path instead — pass the problem and it saves
    the latest accepted state at each firing."""

    def __init__(self, problem, directory: str, every_k_iterations: int = 5,
                 prefix: str = "ceres_tpu_ckpt"):
        self.problem = problem
        self.directory = directory
        self.every = max(1, every_k_iterations)
        self.prefix = prefix
        os.makedirs(directory, exist_ok=True)

    def __call__(self, iteration_summary):
        it = iteration_summary.iteration
        if it % self.every == 0 and iteration_summary.step_is_successful:
            path = os.path.join(self.directory,
                                f"{self.prefix}_{it:05d}.npz")
            save_state(path, self.problem, iteration=it,
                       trust_region_radius=(
                           iteration_summary.trust_region_radius))
        return CallbackReturnType.SOLVER_CONTINUE


def dump_linear_problem(path: str, jac, res, D, x):
    """Reference DumpLinearLeastSquaresProblem
    (linear_least_squares_problems.cc:84): persist the inner problem."""
    np.savez(path,
             jacobian=np.asarray(jac.to_dense()),
             rhs=np.asarray(res.flatten()),
             D=np.asarray(D),
             x=np.asarray(x))
