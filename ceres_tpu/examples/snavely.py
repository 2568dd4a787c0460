"""Snavely reprojection errors for BAL bundle adjustment.

Capability parity with the reference's
examples/snavely_reprojection_error.h:53 (9-param camera + 3-param point,
autodiff) and the quaternion variant (:102). The functor is a plain
jnp-traceable class: the evaluator vmaps it across all observations and
jacfwd's it — the reference's AutoDiffCostFunction<SnavelyReprojectionError,
2, 9, 3> pattern.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import rotation as rot


class SnavelyReprojectionError:
    """camera: [angle_axis(3), translation(3), f, k1, k2]; point: [3].

    Residual: reprojection error against the observed (x, y), with the BAL
    convention of negative-z looking direction (snavely_reprojection_error.h:
    'the camera coordinate system ... -z axis').
    """

    def __init__(self, observed_x: float, observed_y: float):
        self.observed_x = observed_x
        self.observed_y = observed_y

    def __call__(self, camera, point):
        p = rot.angle_axis_rotate_point(camera[:3], point)
        p = p + camera[3:6]
        # Center of distortion: -p/z (BAL convention).
        xp = -p[0] / p[2]
        yp = -p[1] / p[2]
        r2 = xp * xp + yp * yp
        distortion = 1.0 + r2 * (camera[7] + camera[8] * r2)
        focal = camera[6]
        predicted_x = focal * distortion * xp
        predicted_y = focal * distortion * yp
        return jnp.stack([predicted_x - self.observed_x,
                          predicted_y - self.observed_y])


class SnavelyReprojectionErrorWithQuaternions:
    """camera: [quaternion(4, w-first), translation(3), f, k1, k2]
    (snavely_reprojection_error.h:102)."""

    def __init__(self, observed_x: float, observed_y: float):
        self.observed_x = observed_x
        self.observed_y = observed_y

    def __call__(self, camera, point):
        p = rot.unit_quaternion_rotate_point(camera[:4], point)
        p = p + camera[4:7]
        xp = -p[0] / p[2]
        yp = -p[1] / p[2]
        r2 = xp * xp + yp * yp
        distortion = 1.0 + r2 * (camera[8] + camera[9] * r2)
        focal = camera[7]
        return jnp.stack([focal * distortion * xp - self.observed_x,
                          focal * distortion * yp - self.observed_y])
