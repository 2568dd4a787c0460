"""NIST StRD suite runner (reference examples/nist.cc CLI).

Usage: python -m ceres_tpu.examples.nist_runner [data_dir]
Prints per-problem LRE for both certified starting points and the average
(the reference reports Ceres LM+DENSE_QR average LRE 9.4, best on 41/54).
"""

from __future__ import annotations

import sys

import numpy as np


def run_suite(data_dir: str, verbose: bool = True,
              linear_solver: str = "DENSE_QR"):
    import ceres_tpu as ct
    from ceres_tpu.io.nist import (build_nist_problem, compute_lre,
                                   load_nist_suite)

    suite = load_nist_suite(data_dir)
    results = {}
    for nist in suite:
        lres = []
        for start in range(nist.starts.shape[0]):
            problem, b = build_nist_problem(nist, start)
            options = ct.SolverOptions(
                linear_solver_type=ct.LinearSolverType[linear_solver],
                max_num_iterations=10000,
                function_tolerance=1e-18,
                gradient_tolerance=1e-18,
                parameter_tolerance=1e-18,
                initial_trust_region_radius=1e4,
            )
            summary = ct.solve(options, problem)
            lre = compute_lre(b, nist.certified)
            lres.append(lre)
            if verbose:
                print(f"{nist.name:10s} start{start+1}: LRE {lre:5.2f}  "
                      f"cost {summary.final_cost:.10e} "
                      f"(certified {nist.certified_cost:.10e}) "
                      f"iters {summary.num_iterations}")
        results[nist.name] = lres
    all_lres = [v for lres in results.values() for v in lres]
    avg = float(np.mean(all_lres))
    solved = sum(1 for v in all_lres if v >= 4.0)
    if verbose:
        print(f"\naverage LRE: {avg:.2f} over {len(all_lres)} configs "
              f"(reference Ceres: 9.4); solved (LRE>=4): {solved}")
    return results, avg


if __name__ == "__main__":
    data_dir = sys.argv[1] if len(sys.argv) > 1 \
        else "/root/reference/data/nist"
    run_suite(data_dir)
