"""End-to-end tests of the example workloads (reference examples/ §2.8:
circle_fit.cc, bicubic_interpolation.cc, sampled_function.cc,
robot_pose_mle.cc, ellipse_approximation.cc, more_garbow_hillstrom.cc,
helloworld*.cc, powell.cc, rosenbrock.cc)."""

import numpy as np
import pytest


def test_circle_fit_robust():
    from ceres_tpu.examples.circle_fit import fit_circle, synthesize
    pts = synthesize(num_points=60, outliers=4, cx=2.0, cy=3.0, r=5.0, seed=1)
    x, y, r, summary = fit_circle(pts, pts[0, 0], pts[0, 1], 1.0,
                                  robust_threshold=0.5)
    assert summary.is_solution_usable()
    assert abs(x - 2.0) < 0.1 and abs(y - 3.0) < 0.1 and abs(r - 5.0) < 0.1


def test_sampled_function_1d():
    from ceres_tpu.examples.sampled_function import sampled_function_1d
    x, summary = sampled_function_1d()
    assert abs(x - 4.5) < 1e-2


def test_bicubic_shift_recovery():
    from ceres_tpu.examples.sampled_function import bicubic_2d
    shift, summary = bicubic_2d()
    np.testing.assert_allclose(shift, [1.234, 2.345], atol=1e-6)


def test_robot_pose_mle():
    from ceres_tpu.examples.robot_pose_mle import (simulate_robot,
                                                   solve_robot_pose_mle)
    odo, rng = simulate_robot(corridor_length=5.0, pose_separation=0.5,
                              seed=2)
    blocks, summary = solve_robot_pose_mle(odo, rng, corridor_length=5.0)
    assert summary.is_solution_usable()
    # With precise range readings the MLE location lands near the truth.
    assert abs(sum(float(b[0]) for b in blocks) - 5.0) < 0.05


def test_ellipse_approximation_small():
    from ceres_tpu.examples.ellipse_approximation import (
        solve_ellipse, synthesize_ellipse_points)
    pts = synthesize_ellipse_points(n=40, seed=5)
    X, t, summary = solve_ellipse(pts, num_segments=24, max_iterations=40)
    assert summary.is_solution_usable()
    assert summary.final_cost < summary.initial_cost * 0.05


MGH_UNCONSTRAINED = [1, 5, 13, 15]
MGH_CONSTRAINED = [3, 4, 5, 9]


@pytest.mark.parametrize("number", MGH_UNCONSTRAINED)
def test_mgh_unconstrained(number):
    from ceres_tpu.examples.more_garbow_hillstrom import BY_NUMBER, solve_mgh
    lre, summary, x = solve_mgh(BY_NUMBER[number])
    assert lre >= 4.0, f"problem {number}: LRE {lre:.2f}"


@pytest.mark.parametrize("number", MGH_CONSTRAINED)
def test_mgh_constrained(number):
    """Bounds-constrained solves must reach the published constrained
    optimum (Gay 1984) — exercises box projection in Plus."""
    from ceres_tpu.examples.more_garbow_hillstrom import BY_NUMBER, solve_mgh
    lre, summary, x = solve_mgh(BY_NUMBER[number], constrained=True)
    p = BY_NUMBER[number]
    assert np.all(np.asarray(x) >= np.asarray(p.lower_bounds) - 1e-12)
    assert np.all(np.asarray(x) <= np.asarray(p.upper_bounds) + 1e-12)
    assert lre >= 4.0, f"problem {number} constrained: LRE {lre:.2f}"


def test_libmv_homography():
    """libmv_homography.cc: symmetric-transfer-error homography with
    callback-driven termination recovers the true H."""
    from ceres_tpu.examples.libmv_homography import main
    H, H_true = main()
    np.testing.assert_allclose(H / H[2, 2], H_true, atol=1e-5)


LIBMV_FILE = "/root/reference/data/libmv-ba-problems/problem_01.bin"


@pytest.mark.skipif(not __import__("os").path.exists(LIBMV_FILE),
                    reason="libmv fixtures not available")
def test_libmv_bundle_adjuster():
    """libmv_bundle_adjuster.cc: binary loader + OpenCV-distortion BA on a
    Tears-of-Steel refinement problem."""
    import ceres_tpu as ct
    from ceres_tpu.io.libmv import read_libmv_problem
    from ceres_tpu.examples.libmv_bundle_adjuster import solve_libmv

    lp = read_libmv_problem(LIBMV_FILE)
    assert lp.is_image_space and len(lp.cameras) == 333
    assert len(lp.points) == 26 and len(lp.markers) == 5421

    opts = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
        preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
        max_num_iterations=10)
    s, intr, cams, pts = solve_libmv(LIBMV_FILE, options=opts)
    assert s.is_solution_usable()
    assert s.final_cost <= s.initial_cost


def test_ransac_homography_batched():
    """RANSAC with batched hypothesis refinement (solve_batched demo):
    recovers H against gross outliers; SubsetManifold through the
    batched fused path."""
    import numpy as np
    from ceres_tpu.examples.ransac_homography import ransac_homography

    rng = np.random.default_rng(4)
    H_true = np.array([[1.02, 0.01, 0.3],
                       [-0.02, 0.98, -0.2],
                       [1e-4, -2e-4, 1.0]])
    n, n_out = 30, 7
    x1 = rng.uniform(-1, 1, (n, 2))
    x1h = np.concatenate([x1, np.ones((n, 1))], axis=1)
    x2h = x1h @ H_true.T
    x2 = x2h[:, :2] / x2h[:, 2:]
    x2 += 1e-4 * rng.standard_normal(x2.shape)
    out = rng.choice(n, size=n_out, replace=False)
    x2[out] += rng.uniform(0.3, 1.0, (n_out, 2))

    H, mask, (summaries, s_polish) = ransac_homography(
        x1, x2, num_hypotheses=6, seed=1)
    assert len(summaries) == 6
    assert "batched fused" in summaries[0].message
    H = H / H[2, 2]
    assert np.linalg.norm(H - H_true / H_true[2, 2]) < 1e-2
    true_inliers = np.ones(n, bool)
    true_inliers[out] = False
    assert (mask & ~true_inliers).sum() == 0
    assert mask.sum() >= 0.8 * (n - n_out)


def test_bal_quaternion_perturb_and_normalize():
    """bal_problem.cc Perturb/Normalize must respect the quaternion
    layout [q4 | t3 | f,k1,k2]: rotation noise in angle-axis (unit
    quaternion preserved), translation at columns 4:7."""
    from ceres_tpu.io.bal import synthetic_bal_problem
    bal = synthetic_bal_problem(3, 40, 120, seed=2, pixel_noise=0.5)
    q = bal.to_quaternions()
    f_before = q.cameras[:, 7].copy()
    q.perturb(rotation_sigma=0.05, translation_sigma=0.1,
              point_sigma=0.01, seed=5)
    norms = np.linalg.norm(q.cameras[:, :4], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-12)   # still unit
    np.testing.assert_allclose(q.cameras[:, 7], f_before)  # f untouched

    # perturbing the aa problem and converting is geometry-equivalent to
    # perturbing the quaternion problem with the same seed
    bal2 = synthetic_bal_problem(3, 40, 120, seed=2, pixel_noise=0.5)
    bal2.perturb(rotation_sigma=0.05, translation_sigma=0.1,
                 point_sigma=0.01, seed=5)
    q2 = bal2.to_quaternions()
    dots = np.abs(np.sum(q2.cameras[:, :4] * q.cameras[:, :4], axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-10)
    np.testing.assert_allclose(q2.cameras[:, 4:7], q.cameras[:, 4:7],
                               atol=1e-12)

    q.normalize()    # must handle quaternions without raising
    np.testing.assert_allclose(
        np.linalg.norm(q.cameras[:, :4], axis=1), 1.0, atol=1e-12)


def test_synthetic_bal_exact_observation_count():
    from ceres_tpu.io.bal import synthetic_bal_problem
    # clamped regime: nobs/npts exceeds ncam, windows saturate and the
    # top-up must still deliver the exact requested count
    bal = synthetic_bal_problem(num_cameras=2, num_points=10,
                                num_observations=18, seed=0)
    assert bal.num_observations == 18
    pairs = set(zip(bal.camera_index.tolist(), bal.point_index.tolist()))
    assert len(pairs) == 18              # all distinct (point, cam) pairs
    import pytest as _pytest
    with _pytest.raises(ValueError):
        synthetic_bal_problem(num_cameras=2, num_points=10,
                              num_observations=100, seed=0)


def test_bal_file_roundtrip_parse(tmp_path):
    """Vectorized from_file equals the documented BAL text layout."""
    from ceres_tpu.io.bal import BALProblem, synthetic_bal_problem
    bal = synthetic_bal_problem(3, 20, 60, seed=1)
    lines = [f"{bal.num_cameras} {bal.num_points} {bal.num_observations}"]
    for i in range(bal.num_observations):
        lines.append(f"{bal.camera_index[i]} {bal.point_index[i]} "
                     f"{bal.observations[i,0]!s} {bal.observations[i,1]!s}")
    for c in bal.cameras:
        lines.extend(str(float(v)) for v in c)
    for p in bal.points:
        lines.extend(str(float(v)) for v in p)
    f = tmp_path / "p.txt"
    f.write_text("\n".join(lines) + "\n")
    loaded = BALProblem.from_file(str(f))
    np.testing.assert_array_equal(loaded.camera_index, bal.camera_index)
    np.testing.assert_array_equal(loaded.point_index, bal.point_index)
    np.testing.assert_allclose(loaded.observations, bal.observations)
    np.testing.assert_allclose(loaded.cameras, bal.cameras)
    np.testing.assert_allclose(loaded.points, bal.points)
