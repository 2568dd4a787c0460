"""Homography estimation with early-termination callback
(reference examples/libmv_homography.cc): minimize the symmetric geometric
transfer error of a 3x3 homography between two point sets, normalized so
H[2,2] = 1 (8 free parameters via SubsetManifold), stopping early through
an IterationCallback once the update to H falls below a threshold — the
callback-driven termination demo.

CLI: python -m ceres_tpu.examples.libmv_homography
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def symmetric_geometric_distance_terms(H, x1, x2):
    """Forward and backward transfer errors (libmv_homography.cc:27-46).
    H: [3,3]; x1, x2: [2]. Returns ([2], [2])."""
    x = jnp.concatenate([x1, jnp.ones((1,), dtype=x1.dtype)])
    y = jnp.concatenate([x2, jnp.ones((1,), dtype=x2.dtype)])
    Hx = H @ x
    fwd = Hx[:2] / Hx[2] - x2
    Hinv_y = jnp.linalg.solve(H, y)
    bwd = Hinv_y[:2] / Hinv_y[2] - x1
    return fwd, bwd


def symmetric_geometric_distance(H, x1, x2):
    fwd, bwd = symmetric_geometric_distance_terms(H, x1, x2)
    return float(jnp.sum(fwd * fwd) + jnp.sum(bwd * bwd))


class HomographySymmetricGeometricCost:
    """4 residuals over the 9-vector H (row-major), h22 pinned to 1 by a
    SubsetManifold (Homography2DNormalizedParameterization analog)."""

    def __init__(self, x1, y1, x2, y2):
        self.x1 = x1
        self.y1 = y1
        self.x2 = x2
        self.y2 = y2

    def __call__(self, h):
        H = h.reshape(3, 3)
        p1 = jnp.stack([self.x1, self.y1])
        p2 = jnp.stack([self.x2, self.y2])
        fwd, bwd = symmetric_geometric_distance_terms(H, p1, p2)
        return jnp.concatenate([fwd, bwd])


class TerminationCheckingCallback:
    """Stops once max symmetric distance over correspondences drops under
    the expected average error (libmv_homography.cc:140-170). Needs
    update_state_every_iteration so it observes the live H."""

    def __init__(self, x1, x2, h, expected_average_symmetric_distance):
        self.x1 = x1
        self.x2 = x2
        self.h = h
        self.expected = expected_average_symmetric_distance

    def __call__(self, summary):
        import ceres_tpu as ct
        if not summary.step_is_successful:
            return ct.CallbackReturnType.SOLVER_CONTINUE
        H = self.h.reshape(3, 3)
        avg = max(symmetric_geometric_distance(
            jnp.asarray(H), jnp.asarray(self.x1[i]), jnp.asarray(self.x2[i]))
            for i in range(len(self.x1)))
        if avg <= self.expected:
            return ct.CallbackReturnType.SOLVER_TERMINATE_SUCCESSFULLY
        return ct.CallbackReturnType.SOLVER_CONTINUE


def estimate_homography(x1: np.ndarray, x2: np.ndarray,
                        expected_average_symmetric_distance: float = 1e-16,
                        max_num_iterations: int = 50):
    """Returns (H [3,3], summary). x1, x2: [n, 2] correspondences."""
    import ceres_tpu as ct

    # Algebraic initialization: identity (the reference seeds from a 4-point
    # DLT; identity suffices for the demo's small motions).
    h = np.eye(3).reshape(-1)
    problem = ct.Problem()
    for i in range(len(x1)):
        cost = ct.AutoDiffCostFunction(
            HomographySymmetricGeometricCost(
                float(x1[i, 0]), float(x1[i, 1]),
                float(x2[i, 0]), float(x2[i, 1])), 4, [9])
        problem.add_residual_block(cost, None, h)
    problem.set_manifold(h, ct.SubsetManifold(9, [8]))  # pin h22 = 1

    callback = TerminationCheckingCallback(
        x1, x2, h, expected_average_symmetric_distance)
    options = ct.SolverOptions(
        max_num_iterations=max_num_iterations,
        update_state_every_iteration=True,
        callbacks=[callback])
    summary = ct.solve(options, problem)
    return h.reshape(3, 3), summary


def main(argv=None):
    # The reference demo: a quad mapped by a known homography.
    H_true = np.array([[1.243715, -0.461057, -111.964454],
                       [0.0, 0.617589, -192.379252],
                       [0.0, -0.000983, 1.0]])
    x1 = np.array([[0.0, 0.0], [320.0, 0.0], [320.0, 240.0], [0.0, 240.0],
                   [160.0, 120.0], [80.0, 60.0]])
    x2 = []
    for p in x1:
        v = H_true @ np.array([p[0], p[1], 1.0])
        x2.append(v[:2] / v[2])
    x2 = np.asarray(x2)

    H, summary = estimate_homography(x1, x2)
    print(summary.brief_report())
    print("H estimated (scaled):")
    print(H / H[2, 2])
    print("H true:")
    print(H_true)
    return H, H_true


if __name__ == "__main__":
    main()
