"""Blender/libmv production bundle adjuster
(reference examples/libmv_bundle_adjuster.cc): refine camera motion
(angle-axis + translation 6-vectors), 3D tracks, and optionally a shared
8-parameter OpenCV intrinsics block (f, cx, cy, k1, k2, k3, p1, p2 with
radial + tangential distortion) against 2D markers loaded from the binary
problem files shipped at data/libmv-ba-problems/.

Intrinsics refinement flags mirror the reference's BUNDLE_* bitmask; the
unrefined intrinsics components are pinned with a SubsetManifold
(libmv_bundle_adjuster.cc:744-770).

CLI: python -m ceres_tpu.examples.libmv_bundle_adjuster --input problem.bin
     [--refine_intrinsics BITMASK]
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..io.libmv import (BUNDLE_FOCAL_LENGTH, BUNDLE_NO_INTRINSICS,
                        BUNDLE_PRINCIPAL_POINT, BUNDLE_RADIAL_K1,
                        BUNDLE_RADIAL_K2, BUNDLE_TANGENTIAL_P1,
                        BUNDLE_TANGENTIAL_P2, LibmvProblem,
                        read_libmv_problem)
from .. import rotation as rot


class OpenCVReprojectionError:
    """intrinsics [8], R_t [6] (angle-axis + t), X [3]
    (libmv_bundle_adjuster.cc OpenCVReprojectionError)."""

    def __init__(self, observed_x: float, observed_y: float):
        self.observed_x = observed_x
        self.observed_y = observed_y

    def __call__(self, intrinsics, R_t, X):
        focal = intrinsics[0]
        cx, cy = intrinsics[1], intrinsics[2]
        k1, k2, k3 = intrinsics[3], intrinsics[4], intrinsics[5]
        p1, p2 = intrinsics[6], intrinsics[7]

        x = rot.angle_axis_rotate_point(R_t[:3], X) + R_t[3:6]
        xn = x[0] / x[2]
        yn = x[1] / x[2]
        r2 = xn * xn + yn * yn
        r_coeff = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xd = xn * r_coeff + 2.0 * p1 * xn * yn + p2 * (r2 + 2.0 * xn * xn)
        yd = yn * r_coeff + 2.0 * p2 * xn * yn + p1 * (r2 + 2.0 * yn * yn)
        predicted_x = focal * xd + cx
        predicted_y = focal * yd + cy
        return jnp.stack([predicted_x - self.observed_x,
                          predicted_y - self.observed_y])


def build_libmv_problem(lp: LibmvProblem,
                        bundle_intrinsics: int = BUNDLE_NO_INTRINSICS):
    """Returns (problem, intrinsics_array, camera_R_t dict, point dict)."""
    import ceres_tpu as ct

    if not lp.is_image_space:
        raise ValueError("normalized-space markers need BUNDLE_INTRINSICS "
                         "(libmv_bundle_adjuster.cc:833)")

    intrinsics = lp.intrinsics.copy()
    cam_rt = {}
    for image, (R, t) in lp.cameras.items():
        aa = np.asarray(rot.rotation_matrix_to_angle_axis(jnp.asarray(R)))
        cam_rt[image] = np.concatenate([aa, t])
    pts = {track: X.copy() for track, X in lp.points.items()}

    problem = ct.Problem()
    num_residuals = 0
    for (image, track, x, y) in lp.markers:
        if image not in cam_rt or track not in pts:
            continue
        cost = ct.AutoDiffCostFunction(
            OpenCVReprojectionError(float(x), float(y)), 2, [8, 6, 3])
        problem.add_residual_block(cost, None, intrinsics, cam_rt[image],
                                   pts[track])
        num_residuals += 1
    if num_residuals == 0:
        raise ValueError("no usable markers")

    if bundle_intrinsics == BUNDLE_NO_INTRINSICS:
        problem.set_parameter_block_constant(intrinsics)
    else:
        constant = []
        if not bundle_intrinsics & BUNDLE_FOCAL_LENGTH:
            constant.append(0)
        if not bundle_intrinsics & BUNDLE_PRINCIPAL_POINT:
            constant += [1, 2]
        if not bundle_intrinsics & BUNDLE_RADIAL_K1:
            constant.append(3)
        if not bundle_intrinsics & BUNDLE_RADIAL_K2:
            constant.append(4)
        constant.append(5)  # K3 never refined (reference :762)
        if not bundle_intrinsics & BUNDLE_TANGENTIAL_P1:
            constant.append(6)
        if not bundle_intrinsics & BUNDLE_TANGENTIAL_P2:
            constant.append(7)
        problem.set_manifold(intrinsics, ct.SubsetManifold(8, constant))
    return problem, intrinsics, cam_rt, pts


def solve_libmv(path: str, bundle_intrinsics: int = BUNDLE_NO_INTRINSICS,
                max_iterations: int = 100, options=None):
    import ceres_tpu as ct

    lp = read_libmv_problem(path)
    problem, intrinsics, cam_rt, pts = build_libmv_problem(
        lp, bundle_intrinsics)
    if options is None:
        options = ct.SolverOptions(
            linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
            use_inner_iterations=True,
            max_num_iterations=max_iterations)
    summary = ct.solve(options, problem)
    return summary, intrinsics, cam_rt, pts


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--refine_intrinsics", type=int,
                    default=BUNDLE_NO_INTRINSICS)
    ap.add_argument("--max_iterations", type=int, default=100)
    args = ap.parse_args(argv)
    summary, intrinsics, cam_rt, pts = solve_libmv(
        args.input, args.refine_intrinsics, args.max_iterations)
    print(summary.full_report())
    print(f"intrinsics: f={intrinsics[0]:.4f} cx={intrinsics[1]:.4f} "
          f"cy={intrinsics[2]:.4f} k1={intrinsics[3]:.6f} "
          f"k2={intrinsics[4]:.6f}")


if __name__ == "__main__":
    main()
