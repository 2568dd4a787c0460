"""RANSAC homography with batched hypothesis refinement — the flagship
demo for ct.solve_batched (batch.py; no reference analog).

Classic RANSAC refines each minimal-sample hypothesis with its own tiny
nonlinear solve — a host loop of K solver calls. Here all K hypothesis
refinements run as ONE vmapped fused device program: same problem
structure (4 correspondences, 8-DoF H via SubsetManifold), different
numeric data per hypothesis. After the batched refinement, hypotheses
are scored by inlier count under a symmetric-transfer-error threshold
and the winner is polished on all inliers.

Cost model shared with examples/libmv_homography.py (reference
examples/libmv_homography.cc:27-46).

CLI: python -m ceres_tpu.examples.ransac_homography
"""

from __future__ import annotations

import numpy as np

from .libmv_homography import (HomographySymmetricGeometricCost,
                               symmetric_geometric_distance)


def _build_refine_problem(x1, x2, h):
    """One hypothesis-refinement problem over the given correspondences
    (h: the 9-vector being refined, H[2,2] pinned by SubsetManifold)."""
    import ceres_tpu as ct
    problem = ct.Problem()
    for i in range(len(x1)):
        cost = ct.AutoDiffCostFunction(
            HomographySymmetricGeometricCost(
                float(x1[i, 0]), float(x1[i, 1]),
                float(x2[i, 0]), float(x2[i, 1])), 4, [9])
        problem.add_residual_block(cost, None, h)
    problem.set_manifold(h, ct.SubsetManifold(9, [8]))
    return problem


def _dlt_homography(x1, x2):
    """Direct linear transform from >= 4 correspondences (the standard
    minimal-sample initializer). Returns the 9-vector, H[2,2] = 1."""
    A = []
    for (u, v), (up, vp) in zip(x1, x2):
        A.append([u, v, 1, 0, 0, 0, -up * u, -up * v, -up])
        A.append([0, 0, 0, u, v, 1, -vp * u, -vp * v, -vp])
    _, _, Vt = np.linalg.svd(np.asarray(A))
    h = Vt[-1]
    if abs(h[8]) < 1e-12:
        return None
    return h / h[8]


def ransac_homography(x1: np.ndarray, x2: np.ndarray,
                      num_hypotheses: int = 16,
                      inlier_threshold: float = 1e-2,
                      seed: int = 0):
    """Returns (H [3,3], inlier_mask, summaries). x1, x2: [n, 2]."""
    import jax.numpy as jnp
    import ceres_tpu as ct

    rng = np.random.default_rng(seed)
    n = len(x1)
    options = ct.SolverOptions(max_num_iterations=20,
                               function_tolerance=1e-10)

    # minimal samples -> DLT inits -> one BATCHED refinement program
    hs, problems = [], []
    while len(problems) < num_hypotheses:
        idx = rng.choice(n, size=4, replace=False)
        h0 = _dlt_homography(x1[idx], x2[idx])
        if h0 is None:
            continue
        h = np.asarray(h0, dtype=np.float64)
        problems.append(_build_refine_problem(x1[idx], x2[idx], h))
        hs.append(h)
    summaries = ct.solve_batched(options, problems)

    # score every refined hypothesis by inlier count
    best, best_mask = None, None
    for h in hs:
        H = jnp.asarray(h.reshape(3, 3))
        d = np.array([symmetric_geometric_distance(
            H, jnp.asarray(x1[i]), jnp.asarray(x2[i]))
            for i in range(n)])
        mask = d < inlier_threshold
        if best_mask is None or mask.sum() > best_mask.sum():
            best, best_mask = h, mask
    if best_mask is None or best_mask.sum() < 4:
        raise RuntimeError("RANSAC found no viable hypothesis")

    # polish the winner on all inliers
    h = best.copy()
    polish = _build_refine_problem(x1[best_mask], x2[best_mask], h)
    s = ct.solve(options, polish)
    return h.reshape(3, 3), best_mask, (summaries, s)


def main():
    import jax
    rng = np.random.default_rng(4)
    H_true = np.array([[1.02, 0.01, 0.3],
                       [-0.02, 0.98, -0.2],
                       [1e-4, -2e-4, 1.0]])
    n, n_out = 60, 15
    x1 = rng.uniform(-1, 1, (n, 2))
    x1h = np.concatenate([x1, np.ones((n, 1))], axis=1)
    x2h = x1h @ H_true.T
    x2 = x2h[:, :2] / x2h[:, 2:]
    x2 += 1e-4 * rng.standard_normal(x2.shape)          # inlier noise
    out = rng.choice(n, size=n_out, replace=False)      # gross outliers
    x2[out] += rng.uniform(0.3, 1.0, (n_out, 2))

    H, mask, (summaries, s_polish) = ransac_homography(x1, x2)
    H = H / H[2, 2]
    err = np.linalg.norm(H - H_true / H_true[2, 2])
    true_inliers = np.ones(n, bool)
    true_inliers[out] = False
    print(f"hypotheses refined (batched): {len(summaries)}")
    print(f"inliers found: {int(mask.sum())}/{n - n_out} true inliers, "
          f"outliers admitted: {int((mask & ~true_inliers).sum())}")
    print(f"||H - H_true||_F = {err:.2e}")
    print(f"polish: {s_polish.brief_report()}")
    assert err < 1e-2, err
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
