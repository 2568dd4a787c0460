"""True multi-process "multi-host" solve (SURVEY.md §5.8, BASELINE's
N>=2-hosts scaling line): two OS processes, each owning 4 virtual CPU
devices, form one 8-device {host, chip} mesh via jax.distributed; the
sharded fused LM loop's collectives cross the process boundary (Gloo on
the CPU proxy, DCN on real pods). The final cost must match the
single-process solve of the identical problem.
"""

import json
import os
import socket
import subprocess
import sys

import ceres_tpu as ct
from ceres_tpu.io.bal import synthetic_bal_problem, build_bal_ceres_problem

SHAPE = dict(num_cameras=8, num_points=600, num_observations=2400)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_final_cost() -> float:
    bal = synthetic_bal_problem(**SHAPE, seed=7, pixel_noise=1.0)
    bal.perturb(rotation_sigma=0.1, translation_sigma=1.0, point_sigma=0.5,
                seed=8)
    problem, _, _ = build_bal_ceres_problem(bal)
    s = ct.solve(ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
        use_mixed_precision_solves=True,
        max_num_iterations=50, function_tolerance=1e-9), problem)
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    return s.final_cost


def test_two_process_sharded_solve_matches_single():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "benchmarks.multihost_worker",
             "--num-processes", "2", "--process-id", str(pid),
             "--devices-per-process", "4",
             "--coordinator", f"127.0.0.1:{port}",
             "--cameras", str(SHAPE["num_cameras"]),
             "--points", str(SHAPE["num_points"]),
             "--observations", str(SHAPE["num_observations"])],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for code, out, err in outs:
        assert code == 0, f"worker failed:\n{err[-3000:]}"
    result = json.loads(outs[0][1].strip().splitlines()[-1])
    assert result["processes"] == 2
    assert result["global_devices"] == 8
    assert result["termination"].endswith("CONVERGENCE")

    ref_cost = _single_process_final_cost()
    rel = abs(result["final_cost"] - ref_cost) / ref_cost
    assert rel < 1e-6, (result["final_cost"], ref_cost)
