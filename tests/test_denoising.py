"""FoE denoising (reference config 4: large sparse grid, CGNR)."""

import os

import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.examples.denoising import (FieldsOfExperts,
                                          build_denoising_problem,
                                          pixels_to_image)
from ceres_tpu.io.pgm import read_pgm, write_pgm

DATA = "/root/reference/data"

pytestmark = pytest.mark.skipif(not os.path.isdir(DATA),
                                reason="reference data not available")


def test_foe_loader():
    foe = FieldsOfExperts(os.path.join(DATA, "2x2.foe"))
    assert foe.size == 2 and foe.num_filters == 3
    assert len(foe.filters) == 3 and foe.filters[0].shape == (4,)
    foe5 = FieldsOfExperts(os.path.join(DATA, "5x5.foe"))
    assert foe5.size == 5 and foe5.filters[0].shape == (25,)


def test_pgm_roundtrip(tmp_path):
    img = read_pgm(os.path.join(DATA, "ceres_noisy.pgm"))
    assert img.ndim == 2 and img.size > 1000
    p = tmp_path / "out.pgm"
    write_pgm(str(p), img[:16, :16])
    back = read_pgm(str(p))
    np.testing.assert_allclose(back, np.clip(np.round(img[:16, :16]),
                                             0, 255))


def test_denoising_crop_cgnr():
    """Solve a small crop of the real noisy image with CGNR; the FoE prior
    must smooth the image (cost decreases, total variation drops)."""
    img = read_pgm(os.path.join(DATA, "ceres_noisy.pgm"))[:24, :24]
    foe = FieldsOfExperts(os.path.join(DATA, "2x2.foe"))
    problem, pixels = build_denoising_problem(img, foe, sigma=20.0)
    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.CGNR,
        preconditioner_type=ct.PreconditionerType.JACOBI,
        max_num_iterations=20, max_linear_solver_iterations=50)
    summary = ct.solve(options, problem)
    assert summary.is_solution_usable(), summary.message
    assert summary.final_cost < summary.initial_cost
    out = pixels_to_image(pixels)

    def tv(a):
        return (np.abs(np.diff(a, axis=0)).sum()
                + np.abs(np.diff(a, axis=1)).sum())

    assert tv(out) < tv(img)
    assert np.abs(out - img).mean() < 25.0  # stays close to the data
