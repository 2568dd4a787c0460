"""Covariance-at-scale benchmark: all camera-block covariances of a
BA problem via the scalable Schur back-solve path (reference
covariance_impl.cc:360 sparsity + :535 sparse QR role — re-architected
as batched unit-vector back-solves against the Schur-eliminated normal
equations; the dense Jacobian is never materialized).

Default shape: 256 cameras / 50k points / 200k observations — the
dense-J covariance would need a ~[400k, 152k] Jacobian (~500 GB);
the scalable path factors one [2304, 2304] S and runs 2304 batched
back-solves. Gauge is fixed by holding the first camera constant.

Usage: python -m benchmarks.covariance_benchmark [--cpu]
       [--cameras N --points N --observations N]
"""

from __future__ import annotations

import json
import sys
import time

from .common import setup_platform


def main(argv=None):
    jax = setup_platform()
    import numpy as np
    import ceres_tpu as ct
    from ceres_tpu.covariance import Covariance, CovarianceOptions
    from ceres_tpu.io.bal import synthetic_bal_problem, \
        build_bal_ceres_problem
    from ceres_tpu.types import CovarianceAlgorithmType

    args = sys.argv[1:] if argv is None else argv

    def intarg(name, default):
        return int(args[args.index(name) + 1]) if name in args else default

    ncam = intarg("--cameras", 256)
    npts = intarg("--points", 50000)
    nobs = intarg("--observations", 200000)

    bal = synthetic_bal_problem(ncam, npts, nobs, seed=7, pixel_noise=1.0)
    problem, cams, pts = build_bal_ceres_problem(bal)
    # Hold the gauge: one camera (7 dof) + one point (the remaining
    # monocular scale freedom).
    problem.set_parameter_block_constant(cams[0])
    problem.set_parameter_block_constant(pts[0])

    pairs = [(c, c) for c in cams[1:]]
    t0 = time.time()
    cov = Covariance(CovarianceOptions(
        algorithm_type=CovarianceAlgorithmType.SPARSE_QR))
    ok = cov.compute(pairs, problem)
    wall = time.time() - t0
    assert ok, cov.message

    traces = np.array([np.trace(cov.get_covariance_block_in_tangent_space(
        c, c)) for c in cams[1:]])
    assert np.all(np.isfinite(traces)) and np.all(traces > 0)
    print(json.dumps({
        "name": "camera_block_covariances",
        "time_s": round(wall, 2),
        "cameras": ncam, "points": npts, "observations": nobs,
        "blocks": len(pairs),
        "median_trace": float(f"{np.median(traces):.4e}"),
    }), flush=True)


if __name__ == "__main__":
    main()
