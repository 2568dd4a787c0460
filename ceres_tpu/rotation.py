"""Differentiable rotation conversions.

Capability parity with the reference's include/ceres/rotation.h (861 LoC):
AngleAxis<->Quaternion (:89,:98), RotationMatrix<->Quaternion (:104,:236),
AngleAxis<->R (:114,:121), Euler (:134,:199), QuaternionProduct (:270),
AngleAxisRotatePoint (:288), UnitQuaternionRotatePoint (:254),
Cross/Dot (:278,:281).

The reference templates everything on Jet<T,N> for forward-mode autodiff;
here plain jnp functions are transparently differentiable under
jax.jacfwd/jacrev. Near-zero-angle branches use `jnp.where` with *safe*
operands on both sides so gradients stay finite (the NaN-through-where trap).

Quaternion convention: [w, x, y, z] (Ceres order, not Eigen's).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS_BY_DTYPE = {jnp.dtype("float32"): 1e-6, jnp.dtype("float64"): 1e-12}


def _small(theta_sq):
    eps = _EPS_BY_DTYPE.get(jnp.asarray(theta_sq).dtype, 1e-12)
    return theta_sq < eps


def cross_product(a, b):
    """rotation.h:278."""
    return jnp.cross(a, b)


def dot_product(a, b):
    """rotation.h:281."""
    return jnp.sum(a * b, axis=-1)


def angle_axis_to_quaternion(angle_axis):
    """rotation.h:89. angle_axis [..,3] -> quaternion [..,4] (w,x,y,z)."""
    theta_sq = jnp.sum(angle_axis * angle_axis, axis=-1, keepdims=True)
    small = _small(theta_sq)
    safe_theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    half = 0.5 * safe_theta
    k_large = jnp.sin(half) / safe_theta
    k_small = 0.5 - theta_sq / 48.0  # sin(t/2)/t Taylor
    k = jnp.where(small, k_small, k_large)
    w = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([w, angle_axis * k], axis=-1)


def quaternion_to_angle_axis(quaternion):
    """rotation.h:98. quaternion [..,4] (w,x,y,z) -> angle_axis [..,3]."""
    q = quaternion
    sin_sq = jnp.sum(q[..., 1:] * q[..., 1:], axis=-1, keepdims=True)
    small = _small(sin_sq)
    sin_theta = jnp.sqrt(jnp.where(small, 1.0, sin_sq))
    cos_theta = q[..., :1]
    # two_theta in (-pi, pi]: mirror for cos < 0 (rotation.h handles both
    # hemispheres so the result angle is minimal).
    two_theta_large = 2.0 * jnp.where(
        cos_theta < 0.0,
        jnp.arctan2(-sin_theta, -cos_theta),
        jnp.arctan2(sin_theta, cos_theta))
    k_large = two_theta_large / sin_theta
    k_small = 2.0 / jnp.where(cos_theta == 0.0, 1.0, cos_theta)
    k = jnp.where(small, k_small, k_large)
    return q[..., 1:] * k


def quaternion_to_scaled_rotation(q):
    """rotation.h:104 QuaternionToScaledRotation: R scaled by |q|^2."""
    a, b, c, d = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    aa, ab, ac, ad = a * a, a * b, a * c, a * d
    bb, bc, bd = b * b, b * c, b * d
    cc, cd = c * c, c * d
    dd = d * d
    R = jnp.stack([
        jnp.stack([aa + bb - cc - dd, 2 * (bc - ad), 2 * (ac + bd)], axis=-1),
        jnp.stack([2 * (ad + bc), aa - bb + cc - dd, 2 * (cd - ab)], axis=-1),
        jnp.stack([2 * (bd - ac), 2 * (ab + cd), aa - bb - cc + dd], axis=-1),
    ], axis=-2)
    return R


def quaternion_to_rotation_matrix(q):
    """rotation.h QuaternionToRotation: normalizes first."""
    norm_sq = jnp.sum(q * q, axis=-1, keepdims=True)
    return quaternion_to_scaled_rotation(q) / norm_sq[..., None]


def rotation_matrix_to_quaternion(R):
    """rotation.h:236 RotationMatrixToQuaternion (branch-free jnp version).

    Uses the numerically-stable 4-case construction selected by the largest
    diagonal-based discriminant, combined with where().
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-30))

    # Case w: trace positive
    sw = safe_sqrt(tr + 1.0) * 2.0
    qw0 = jnp.stack([0.25 * sw, (m21 - m12) / sw, (m02 - m20) / sw,
                     (m10 - m01) / sw], axis=-1)
    # Case x
    sx = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    qx0 = jnp.stack([(m21 - m12) / sx, 0.25 * sx, (m01 + m10) / sx,
                     (m02 + m20) / sx], axis=-1)
    # Case y
    sy = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    qy0 = jnp.stack([(m02 - m20) / sy, (m01 + m10) / sy, 0.25 * sy,
                     (m12 + m21) / sy], axis=-1)
    # Case z
    sz = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    qz0 = jnp.stack([(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz,
                     0.25 * sz], axis=-1)

    cond_w = tr > 0.0
    cond_x = (m00 >= m11) & (m00 >= m22)
    cond_y = m11 >= m22
    q = jnp.where(cond_w[..., None], qw0,
                  jnp.where(cond_x[..., None], qx0,
                            jnp.where(cond_y[..., None], qy0, qz0)))
    # Canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def angle_axis_to_rotation_matrix(angle_axis):
    """rotation.h:121 (Rodrigues)."""
    theta_sq = jnp.sum(angle_axis * angle_axis, axis=-1)
    small = _small(theta_sq)
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    w = angle_axis / jnp.where(small[..., None], 1.0, theta[..., None])
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    one_c = 1.0 - c
    R_large = jnp.stack([
        jnp.stack([c + wx * wx * one_c, wx * wy * one_c - wz * s,
                   wx * wz * one_c + wy * s], axis=-1),
        jnp.stack([wy * wx * one_c + wz * s, c + wy * wy * one_c,
                   wy * wz * one_c - wx * s], axis=-1),
        jnp.stack([wz * wx * one_c - wy * s, wz * wy * one_c + wx * s,
                   c + wz * wz * one_c], axis=-1),
    ], axis=-2)
    # Small angle: R = I + skew(aa)  (first order, matches reference :150)
    ax, ay, az = angle_axis[..., 0], angle_axis[..., 1], angle_axis[..., 2]
    one = jnp.ones_like(ax)
    R_small = jnp.stack([
        jnp.stack([one, -az, ay], axis=-1),
        jnp.stack([az, one, -ax], axis=-1),
        jnp.stack([-ay, ax, one], axis=-1),
    ], axis=-2)
    return jnp.where(small[..., None, None], R_small, R_large)


def rotation_matrix_to_angle_axis(R):
    """rotation.h:114 (via quaternion, as reference does)."""
    return quaternion_to_angle_axis(rotation_matrix_to_quaternion(R))


def euler_angles_to_rotation_matrix(euler_deg):
    """rotation.h:134 EulerAnglesToRotationMatrix: (pitch,roll,yaw) about
    fixed X,Y,Z axes resp., *degrees*, R = R_z R_y R_x convention as in the
    reference."""
    rad = euler_deg * (jnp.pi / 180.0)
    c1, c2, c3 = (jnp.cos(rad[..., 0]), jnp.cos(rad[..., 1]),
                  jnp.cos(rad[..., 2]))
    s1, s2, s3 = (jnp.sin(rad[..., 0]), jnp.sin(rad[..., 1]),
                  jnp.sin(rad[..., 2]))
    # Matches reference: R = Rz(yaw=a3) * Ry(roll=a2) * Rx(pitch=a1)
    # with the element layout of rotation.h:146-160.
    return jnp.stack([
        jnp.stack([c2 * c3, -s3 * c1 + s1 * s2 * c3,
                   s1 * s3 + c1 * s2 * c3], axis=-1),
        jnp.stack([c2 * s3, c1 * c3 + s1 * s2 * s3,
                   -s1 * c3 + c1 * s2 * s3], axis=-1),
        jnp.stack([-s2, s1 * c2, c1 * c2], axis=-1),
    ], axis=-2)


class EulerSystem:
    """One of the 24 Euler-angle conventions, Shoemake's classification
    (reference include/ceres/internal/euler_angles.h:84-93): an inner axis,
    permutation parity, proper-Euler vs Tait-Bryan, extrinsic vs intrinsic.
    Use the named instances (rotation.ExtrinsicXYZ, rotation.IntrinsicZYX,
    ...) with euler_angles_to_rotation / rotation_matrix_to_euler_angles."""

    def __init__(self, name, inner_axis, parity_odd, proper, intrinsic):
        self.name = name
        self.inner_axis = inner_axis
        self.parity_odd = parity_odd
        self.proper = proper
        self.intrinsic = intrinsic

    @property
    def axes(self):
        i = self.inner_axis
        return (i, (i + 1 + int(self.parity_odd)) % 3,
                (i + 2 - int(self.parity_odd)) % 3)

    def __repr__(self):
        return f"EulerSystem({self.name})"


def _make_euler_systems():
    ax = {"X": 0, "Y": 1, "Z": 2}
    systems = {}
    for frame in ("Extrinsic", "Intrinsic"):
        for a in "XYZ":
            for b in "XYZ":
                if b == a:
                    continue
                for c in "XYZ":
                    if c == b:
                        continue
                    seq = a + b + c
                    # Intrinsic names are the reversed extrinsic sequence.
                    eff = seq if frame == "Extrinsic" else seq[::-1]
                    inner = ax[eff[0]]
                    parity_odd = (ax[eff[1]] != (inner + 1) % 3)
                    proper = eff[2] == eff[0]
                    name = frame + seq
                    systems[name] = EulerSystem(
                        name, inner, parity_odd, proper,
                        frame == "Intrinsic")
    return systems


EULER_SYSTEMS = _make_euler_systems()
globals().update(EULER_SYSTEMS)


def euler_angles_to_rotation(euler, system: EulerSystem):
    """General Euler angles (radians) -> rotation matrix
    (rotation.h:497-551 EulerAnglesToRotation)."""
    euler = jnp.asarray(euler)
    i, j, k = system.axes
    ea1 = euler[..., 1]
    if system.intrinsic:
        ea0, ea2 = euler[..., 2], euler[..., 0]
    else:
        ea0, ea2 = euler[..., 0], euler[..., 2]
    if system.parity_odd:
        ea0, ea1, ea2 = -ea0, -ea1, -ea2

    ci, cj, ch = jnp.cos(ea0), jnp.cos(ea1), jnp.cos(ea2)
    si, sj, sh = jnp.sin(ea0), jnp.sin(ea1), jnp.sin(ea2)
    cc, cs, sc, ss = ci * ch, ci * sh, si * ch, si * sh

    R = [[None] * 3 for _ in range(3)]
    if system.proper:
        R[i][i] = cj
        R[i][j] = sj * si
        R[i][k] = sj * ci
        R[j][i] = sj * sh
        R[j][j] = -cj * ss + cc
        R[j][k] = -cj * cs - sc
        R[k][i] = -sj * ch
        R[k][j] = cj * sc + cs
        R[k][k] = cj * cc - ss
    else:
        R[i][i] = cj * ch
        R[i][j] = sj * sc - cs
        R[i][k] = sj * cc + ss
        R[j][i] = cj * sh
        R[j][j] = sj * ss + cc
        R[j][k] = sj * cs - sc
        R[k][i] = -sj
        R[k][j] = cj * si
        R[k][k] = cj * ci
    return jnp.stack([jnp.stack([R[r][c] for c in range(3)], axis=-1)
                      for r in range(3)], axis=-2)


def rotation_matrix_to_euler_angles(R, system: EulerSystem):
    """Rotation matrix -> general Euler angles in radians
    (rotation.h:558-628 RotationMatrixToEulerAngles); branches via
    jnp.where so the conversion is traceable and Jet-equivalent."""
    R = jnp.asarray(R)
    i, j, k = system.axes
    if system.proper:
        sy = jnp.hypot(R[..., i, j], R[..., i, k])
        degenerate = sy == 0.0
        ea0 = jnp.where(degenerate,
                        jnp.arctan2(-R[..., j, k], R[..., j, j]),
                        jnp.arctan2(R[..., i, j], R[..., i, k]))
        ea1 = jnp.arctan2(sy, R[..., i, i])
        ea2 = jnp.where(degenerate, 0.0,
                        jnp.arctan2(R[..., j, i], -R[..., k, i]))
    else:
        cy = jnp.hypot(R[..., i, i], R[..., j, i])
        degenerate = cy == 0.0
        ea0 = jnp.where(degenerate,
                        jnp.arctan2(-R[..., j, k], R[..., j, j]),
                        jnp.arctan2(R[..., k, j], R[..., k, k]))
        ea1 = jnp.arctan2(-R[..., k, i], cy)
        ea2 = jnp.where(degenerate, 0.0,
                        jnp.arctan2(R[..., j, i], R[..., i, i]))
    if system.parity_odd:
        ea0, ea1, ea2 = -ea0, -ea1, -ea2
    e1 = ea1
    if system.intrinsic:
        e0, e2 = ea2, ea0
    else:
        e0, e2 = ea0, ea2
    if system.proper:
        # Normalize into [-pi, pi) x [0, pi/2) x [-pi, pi).
        flip = e1 < 0.0
        e0 = jnp.where(flip, e0 + jnp.pi, e0)
        e1 = jnp.where(flip, -e1, e1)
        e2 = jnp.where(flip, e2 - jnp.pi, e2)

        def wrap(a):
            a = jnp.where(a < -jnp.pi, a + 2.0 * jnp.pi, a)
            return jnp.where(a > jnp.pi, a - 2.0 * jnp.pi, a)

        e0, e1, e2 = wrap(e0), wrap(e1), wrap(e2)
    return jnp.stack([e0, e1, e2], axis=-1)


def quaternion_product(z, w):
    """rotation.h:270 zw = z * w (Hamilton product, w-first)."""
    z0, z1, z2, z3 = z[..., 0], z[..., 1], z[..., 2], z[..., 3]
    w0, w1, w2, w3 = w[..., 0], w[..., 1], w[..., 2], w[..., 3]
    return jnp.stack([
        z0 * w0 - z1 * w1 - z2 * w2 - z3 * w3,
        z0 * w1 + z1 * w0 + z2 * w3 - z3 * w2,
        z0 * w2 - z1 * w3 + z2 * w0 + z3 * w1,
        z0 * w3 + z1 * w2 - z2 * w1 + z3 * w0,
    ], axis=-1)


def quaternion_conjugate(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def unit_quaternion_rotate_point(q, pt):
    """rotation.h:254 UnitQuaternionRotatePoint (assumes |q| = 1)."""
    # uv = 2 * q_vec x pt; result = pt + q_w * uv + q_vec x uv
    qvec = q[..., 1:]
    uv = 2.0 * jnp.cross(qvec, pt)
    return pt + q[..., :1] * uv + jnp.cross(qvec, uv)


def quaternion_rotate_point(q, pt):
    """rotation.h QuaternionRotatePoint: normalizes q first."""
    scale = 1.0 / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    return unit_quaternion_rotate_point(q * scale, pt)


def angle_axis_rotate_point(angle_axis, pt):
    """rotation.h:288 AngleAxisRotatePoint (Rodrigues on a point)."""
    theta_sq = jnp.sum(angle_axis * angle_axis, axis=-1, keepdims=True)
    small = _small(theta_sq)
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    inv_theta = 1.0 / theta
    w = angle_axis * inv_theta
    w_cross_pt = jnp.cross(w, pt)
    w_dot_pt = jnp.sum(w * pt, axis=-1, keepdims=True)
    large = (pt * cos_t + w_cross_pt * sin_t
             + w * w_dot_pt * (1.0 - cos_t))
    # Near zero: R(aa) pt ~= pt + aa x pt  (reference :306)
    small_res = pt + jnp.cross(angle_axis, pt)
    return jnp.where(small, small_res, large)
