"""NIST StRD accuracy (reference examples/nist.cc; BASELINE.md: Ceres
average LRE 9.4/11). The full 54-config sweep runs in the benchmark/example
runner; here a representative subset guards accuracy per-commit."""

import os

import numpy as np
import pytest

DATA_DIR = "/root/reference/data/nist"

pytestmark = pytest.mark.skipif(not os.path.isdir(DATA_DIR),
                                reason="NIST data not available")


def solve_one(name, start, **opts):
    import ceres_tpu as ct
    from ceres_tpu.io.nist import (build_nist_problem, compute_lre,
                                   load_nist_suite, parse_nist_file)
    nist = parse_nist_file(os.path.join(DATA_DIR, name + ".dat"))
    problem, b = build_nist_problem(nist, start)
    options = ct.SolverOptions(
        max_num_iterations=2000, function_tolerance=1e-18,
        gradient_tolerance=1e-18, parameter_tolerance=1e-18, **opts)
    summary = ct.solve(options, problem)
    return compute_lre(b, nist.certified), summary, nist


# (name, start, minimum acceptable LRE) — values our solver achieves with
# margin; Ceres-reference average is 9.4.
# Thresholds calibrated to the full-suite sweep (benchmarks/
# NIST_RESULTS.txt) under the reference's fixed iteration-0 Jacobi scaling
# (suite average LRE 9.58, every configuration >= 4 certified digits).
CASES = [
    ("Misra1a", 0, 9.0), ("Misra1a", 1, 9.0),
    ("Chwirut1", 0, 8.0), ("DanWood", 1, 9.5),
    ("Gauss1", 0, 8.0), ("Lanczos3", 1, 6.0),
    ("Thurber", 1, 7.0), ("BoxBOD", 1, 8.0),
    ("Eckerle4", 1, 9.0),
    ("Rat43", 1, 7.5), ("MGH09", 0, 7.0),
]


@pytest.mark.parametrize("name,start,min_lre", CASES,
                         ids=[f"{n}-s{s+1}" for n, s, _ in CASES])
def test_nist_accuracy(name, start, min_lre):
    lre, summary, nist = solve_one(name, start)
    assert lre >= min_lre, (
        f"{name} start{start+1}: LRE {lre:.2f} < {min_lre} "
        f"(cost {summary.final_cost:.6e} vs certified "
        f"{nist.certified_cost:.6e})")


def test_nist_certified_cost_reached():
    """Final cost must match the certified residual sum of squares.
    Roszman1 is checked by cost only: its arctan model admits parameter
    branches with identical residuals, and the solver may land on either."""
    for name, start in [("Misra1b", 0), ("Rat42", 1), ("Kirby2", 1),
                        ("Roszman1", 0)]:
        lre, summary, nist = solve_one(name, start)
        np.testing.assert_allclose(summary.final_cost, nist.certified_cost,
                                   rtol=1e-6)
