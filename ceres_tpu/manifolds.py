"""Manifolds: local parameterizations of parameter blocks.

Capability parity with the reference's manifold surface:
Manifold base (include/ceres/manifold.h:148), EuclideanManifold (:241),
SubsetManifold (:317), QuaternionManifold (:366), EigenQuaternionManifold
(:390), SphereManifold (sphere_manifold.h:86), LineManifold
(line_manifold.h:76), ProductManifold (product_manifold.h:85),
AutoDiffManifold (autodiff_manifold.h:148), householder machinery
(internal/householder_vector.h).

Design: `plus(x, delta)` / `minus(y, x)` are JAX-traceable on single blocks;
the evaluator vmaps them over a bucket of blocks. `plus_jacobian` /
`minus_jacobian` default to jax.jacfwd of plus/minus — the reference computes
these analytically per manifold (manifold.cc), but jacfwd at compile time
produces identical XLA code for these tiny fixed-size functions, so analytic
overrides are only kept where they are cheaper or better conditioned.

In the solver itself, per-block Jacobians are computed as
jacfwd(residual o plus)(0), so plus_jacobian is used only by the public
API (GradientChecker, Covariance tangent projection).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import rotation as rot


class Manifold:
    """Base manifold (reference manifold.h:148)."""

    @property
    def ambient_size(self) -> int:
        raise NotImplementedError

    @property
    def tangent_size(self) -> int:
        raise NotImplementedError

    def plus(self, x, delta):
        raise NotImplementedError

    def minus(self, y, x):
        raise NotImplementedError

    def plus_jacobian(self, x):
        """d/d delta plus(x, delta) at delta=0: [ambient, tangent]."""
        dtype = jnp.asarray(x).dtype
        zero = jnp.zeros((self.tangent_size,), dtype=dtype)
        return jax.jacfwd(lambda d: self.plus(x, d))(zero)

    def minus_jacobian(self, x):
        """d/dy minus(y, x) at y=x: [tangent, ambient]."""
        return jax.jacfwd(lambda y: self.minus(y, x))(x)

    # Equality-by-structure so Problem can bucket blocks sharing a manifold.
    def bucket_key(self):
        return (type(self).__name__, self.ambient_size, self.tangent_size)


class EuclideanManifold(Manifold):
    """Plus = +, Minus = - (manifold.h:241)."""

    def __init__(self, size: int):
        self._size = int(size)

    @property
    def ambient_size(self):
        return self._size

    @property
    def tangent_size(self):
        return self._size

    def plus(self, x, delta):
        return x + delta

    def minus(self, y, x):
        return y - x

    def plus_jacobian(self, x):
        return jnp.eye(self._size, dtype=jnp.asarray(x).dtype)

    def minus_jacobian(self, x):
        return jnp.eye(self._size, dtype=jnp.asarray(x).dtype)


class SubsetManifold(Manifold):
    """Euclidean on a subset of coordinates; the rest held constant
    (manifold.h:317)."""

    def __init__(self, size: int, constant_indices):
        self._size = int(size)
        const = sorted(set(int(i) for i in constant_indices))
        for i in const:
            if not 0 <= i < size:
                raise ValueError(f"constant index {i} out of range [0,{size})")
        self._constant = const
        self._free = np.asarray(
            [i for i in range(size) if i not in set(const)], dtype=np.int32)

    @property
    def ambient_size(self):
        return self._size

    @property
    def tangent_size(self):
        return int(self._free.size)

    def plus(self, x, delta):
        if self._free.size == 0:
            return x
        # jnp.asarray: the public API hands users numpy-owned blocks,
        # which have no .at
        return jnp.asarray(x).at[self._free].add(delta)

    def minus(self, y, x):
        if self._free.size == 0:
            return jnp.zeros((0,), dtype=jnp.asarray(x).dtype)
        return (y - x)[self._free]

    def bucket_key(self):
        return ("SubsetManifold", self._size, tuple(self._constant))


class QuaternionManifold(Manifold):
    """Unit quaternion, Ceres [w,x,y,z] order (manifold.h:366).

    Plus(x, delta) = exp(delta) * x where |delta| is the half rotation angle
    (manifold.cc QuaternionPlusImpl)."""

    @property
    def ambient_size(self):
        return 4

    @property
    def tangent_size(self):
        return 3

    def _exp(self, delta):
        # [cos|d|, sin|d|/|d| d] with Taylor-safe small-angle branch.
        sq = jnp.sum(delta * delta, axis=-1, keepdims=True)
        small = sq < 1e-12
        nd = jnp.sqrt(jnp.where(small, 1.0, sq))
        k = jnp.where(small, 1.0 - sq / 6.0, jnp.sin(nd) / nd)
        w = jnp.where(small, 1.0 - sq / 2.0, jnp.cos(nd))
        return jnp.concatenate([w, delta * k], axis=-1)

    def _log(self, q):
        # Inverse of _exp: half-angle axis-angle/2 representation.
        sq = jnp.sum(q[..., 1:] * q[..., 1:], axis=-1, keepdims=True)
        small = sq < 1e-12
        sn = jnp.sqrt(jnp.where(small, 1.0, sq))
        w = q[..., :1]
        # theta = atan2(|u|, w) with NO sign flip (manifold.cc:105
        # QuaternionMinusImpl): the log distinguishes the double cover,
        # so Minus(Plus(x, d), x) = d holds for |d| up to pi, not pi/2.
        atan = jnp.arctan2(sn, w)
        k = jnp.where(small, 1.0 / jnp.where(w == 0, 1.0, w), atan / sn)
        return q[..., 1:] * k

    def plus(self, x, delta):
        return rot.quaternion_product(self._exp(delta), x)

    def minus(self, y, x):
        return self._log(rot.quaternion_product(y, rot.quaternion_conjugate(x)))


class EigenQuaternionManifold(QuaternionManifold):
    """Same manifold, Eigen storage order [x,y,z,w] (manifold.h:390)."""

    _TO_WFIRST = np.asarray([3, 0, 1, 2])
    _TO_EIGEN = np.asarray([1, 2, 3, 0])

    def plus(self, x, delta):
        xw = x[..., self._TO_WFIRST]
        return super().plus(xw, delta)[..., self._TO_EIGEN]

    def minus(self, y, x):
        return super().minus(y[..., self._TO_WFIRST], x[..., self._TO_WFIRST])


def householder_vector(x):
    """Householder vector v (v[-1]=1) and beta with
    (I - beta v v^T) x = |x| e_last (reference householder_vector.h)."""
    n = x.shape[-1]
    sigma = jnp.sum(x[..., :-1] * x[..., :-1], axis=-1)
    xn = x[..., -1]
    zero_sigma = sigma < 1e-30
    mu = jnp.sqrt(xn * xn + sigma)
    v_last = jnp.where(
        xn <= 0.0,
        xn - mu,
        -sigma / jnp.where(zero_sigma, 1.0, xn + mu))
    safe_v_last = jnp.where(zero_sigma, 1.0, v_last)
    beta = jnp.where(
        zero_sigma,
        jnp.where(xn < 0.0, 2.0, 0.0),
        2.0 * safe_v_last * safe_v_last / (sigma + safe_v_last * safe_v_last))
    v = jnp.concatenate(
        [x[..., :-1] / safe_v_last[..., None],
         jnp.ones_like(xn)[..., None]], axis=-1)
    v = jnp.where(zero_sigma[..., None],
                  jnp.concatenate([jnp.zeros_like(x[..., :-1]),
                                   jnp.ones_like(xn)[..., None]], axis=-1),
                  v)
    return v, beta


def _apply_householder(v, beta, y):
    """(I - beta v v^T) y."""
    return y - beta[..., None] * v * jnp.sum(v * y, axis=-1, keepdims=True)


class SphereManifold(Manifold):
    """Sphere of radius |x| in R^n; tangent dim n-1 (sphere_manifold.h:86,
    sphere_manifold_functions.h)."""

    def __init__(self, size: int):
        if size < 2:
            raise ValueError("SphereManifold needs ambient size >= 2")
        self._size = int(size)

    @property
    def ambient_size(self):
        return self._size

    @property
    def tangent_size(self):
        return self._size - 1

    def bucket_key(self):
        return ("SphereManifold", self._size)

    def plus(self, x, delta):
        v, beta = householder_vector(x)
        norm_x = jnp.linalg.norm(x, axis=-1)
        sq = jnp.sum(delta * delta, axis=-1)
        small = sq < 1e-28
        nd = jnp.sqrt(jnp.where(small, 1.0, sq))
        sinc = jnp.where(small, 1.0 - sq / 6.0, jnp.sin(nd) / nd)
        y = jnp.concatenate(
            [sinc[..., None] * delta,
             jnp.where(small, 1.0 - sq / 2.0, jnp.cos(nd))[..., None]],
            axis=-1)
        return norm_x[..., None] * _apply_householder(v, beta, y)

    def minus(self, y, x):
        v, beta = householder_vector(x)
        hy = _apply_householder(v, beta, y)
        ny = jnp.linalg.norm(y, axis=-1)
        hy = hy / jnp.where(ny == 0, 1.0, ny)[..., None]
        head, last = hy[..., :-1], hy[..., -1]
        sq = jnp.sum(head * head, axis=-1)
        small = sq < 1e-28
        sn = jnp.sqrt(jnp.where(small, 1.0, sq))
        atan = jnp.arctan2(sn, last)
        k = jnp.where(small, 1.0, atan / sn)
        return head * k[..., None]


class LineManifold(Manifold):
    """Line in R^n as (origin, direction): ambient 2n, tangent 2(n-1)
    (line_manifold.h:76). Direction moves on the sphere; origin moves in the
    hyperplane orthogonal to the direction."""

    def __init__(self, ambient_space_dim: int):
        if ambient_space_dim < 2:
            raise ValueError("LineManifold needs spatial dim >= 2")
        self._dim = int(ambient_space_dim)
        self._sphere = SphereManifold(self._dim)

    @property
    def ambient_size(self):
        return 2 * self._dim

    @property
    def tangent_size(self):
        return 2 * (self._dim - 1)

    def bucket_key(self):
        return ("LineManifold", self._dim)

    def plus(self, x, delta):
        n = self._dim
        origin, direction = x[..., :n], x[..., n:]
        do = delta[..., : n - 1]
        dd = delta[..., n - 1:]
        # Origin displacement lives in the direction's tangent hyperplane,
        # mapped through the direction's householder frame (line_manifold.h).
        v, beta = householder_vector(direction)
        # y = [delta_o, 0] with NO half factor (line_manifold.h:212)
        y = jnp.concatenate([do, jnp.zeros_like(do[..., :1])], axis=-1)
        origin_new = origin + _apply_householder(v, beta, y)
        direction_new = self._sphere.plus(direction, dd)
        return jnp.concatenate([origin_new, direction_new], axis=-1)

    def minus(self, y, x):
        n = self._dim
        xo, xd = x[..., :n], x[..., n:]
        yo, yd = y[..., :n], y[..., n:]
        v, beta = householder_vector(xd)
        # head of H (y_o - x_o), no doubling (line_manifold.h:265-267)
        h = _apply_householder(v, beta, yo - xo)
        do = h[..., : n - 1]
        dd = self._sphere.minus(yd, xd)
        return jnp.concatenate([do, dd], axis=-1)


class ProductManifold(Manifold):
    """Cartesian product of manifolds (product_manifold.h:85)."""

    def __init__(self, *manifolds):
        if not manifolds:
            raise ValueError("ProductManifold needs >= 1 manifold")
        self._manifolds = list(manifolds)
        self._ambient_offsets = np.cumsum(
            [0] + [m.ambient_size for m in manifolds])
        self._tangent_offsets = np.cumsum(
            [0] + [m.tangent_size for m in manifolds])

    @property
    def ambient_size(self):
        return int(self._ambient_offsets[-1])

    @property
    def tangent_size(self):
        return int(self._tangent_offsets[-1])

    def bucket_key(self):
        return ("ProductManifold",
                tuple(m.bucket_key() for m in self._manifolds))

    def plus(self, x, delta):
        parts = []
        for i, m in enumerate(self._manifolds):
            xs = x[..., self._ambient_offsets[i]:self._ambient_offsets[i + 1]]
            ds = delta[...,
                       self._tangent_offsets[i]:self._tangent_offsets[i + 1]]
            parts.append(m.plus(xs, ds))
        return jnp.concatenate(parts, axis=-1)

    def minus(self, y, x):
        parts = []
        for i, m in enumerate(self._manifolds):
            ys = y[..., self._ambient_offsets[i]:self._ambient_offsets[i + 1]]
            xs = x[..., self._ambient_offsets[i]:self._ambient_offsets[i + 1]]
            parts.append(m.minus(ys, xs))
        return jnp.concatenate(parts, axis=-1)


class AutoDiffManifold(Manifold):
    """Manifold from user Plus/Minus functors; Jacobians via JAX AD
    (autodiff_manifold.h:148). The functors must be jnp-traceable."""

    def __init__(self, plus_fn, minus_fn, ambient_size: int,
                 tangent_size: int):
        self._plus = plus_fn
        self._minus = minus_fn
        self._ambient = int(ambient_size)
        self._tangent = int(tangent_size)

    @property
    def ambient_size(self):
        return self._ambient

    @property
    def tangent_size(self):
        return self._tangent

    def bucket_key(self):
        return ("AutoDiffManifold", id(self._plus), id(self._minus),
                self._ambient, self._tangent)

    def plus(self, x, delta):
        return self._plus(x, delta)

    def minus(self, y, x):
        return self._minus(y, x)
