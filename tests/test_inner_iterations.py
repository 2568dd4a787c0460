"""Inner iterations (coordinate descent over independent sets,
reference coordinate_descent_minimizer.cc + inner-iteration option)."""

import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.io.bal import build_bal_ceres_problem, synthetic_bal_problem
from ceres_tpu.minimizers.coordinate_descent import (create_ordering,
                                                     is_ordering_valid)
from ceres_tpu.program import CompiledProgram


def test_create_ordering_is_independent():
    bal = synthetic_bal_problem(3, 12, 30, seed=0)
    problem, cams, pts = build_bal_ceres_problem(bal)
    prog = CompiledProgram(problem)
    groups = create_ordering(prog)
    # every group must be an independent set
    for keys in groups:
        keyset = set(keys)
        for rb in problem._residual_records():
            assert sum(1 for k in rb.param_keys if k in keyset) <= 1
    # all variable blocks covered exactly once
    total = sum(len(g) for g in groups)
    assert total == len(prog.variable_blocks)


def test_is_ordering_valid():
    bal = synthetic_bal_problem(2, 6, 12, seed=1)
    problem, cams, pts = build_bal_ceres_problem(bal)
    prog = CompiledProgram(problem)
    good = ct.ParameterBlockOrdering()
    for p in pts:
        good.add_element_to_group(p, 0)
    for c in cams:
        good.add_element_to_group(c, 1)
    assert is_ordering_valid(prog, good)
    bad = ct.ParameterBlockOrdering()
    for a in list(pts) + list(cams):
        bad.add_element_to_group(a, 0)   # cams+points co-occur
    assert not is_ordering_valid(prog, bad)


def test_inner_iterations_accelerate_ba():
    bal = synthetic_bal_problem(3, 20, 50, seed=5, pixel_noise=0.5)
    bal.perturb(rotation_sigma=0.03, translation_sigma=0.1,
                point_sigma=0.1, seed=6)
    problem, cams, pts = build_bal_ceres_problem(bal)
    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
        use_inner_iterations=True, max_num_iterations=30)
    summary = ct.solve(options, problem)
    assert summary.is_solution_usable(), summary.message
    assert summary.num_inner_iteration_steps > 0
    assert summary.final_cost < 0.05 * summary.initial_cost
