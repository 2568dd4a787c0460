"""Autodiff benchmark (reference internal/ceres/autodiff_benchmarks/):
linearization throughput per cost function — from a trivial constant cost
to Snavely reprojection and rotation-heavy costs. The TPU analog measures
the full vmapped jacfwd bucket evaluation (residuals + Jacobians per
second), since that is the unit of work the evaluator issues.

Usage: python -m benchmarks.autodiff_benchmark [--cpu]
"""

from __future__ import annotations

import sys

from .common import bench, block, setup_platform


def main(argv=None):
    jax = setup_platform()
    import jax.numpy as jnp
    import numpy as np
    from ceres_tpu import rotation as rot

    dname = jax.devices()[0].platform
    N = 100_000
    rng = np.random.default_rng(0)

    cases = {}

    def linear_cost(p):  # "Linear1D" analog
        return p - 1.0

    cases["Linear10"] = (linear_cost, [10])

    def rat43(p, xy):
        x, y = xy[0], xy[1]
        return jnp.reshape(
            y - p[0] / (1.0 + jnp.exp(p[1] - p[2] * x)) ** (1.0 / p[3]),
            (1,))

    def snavely(cam, pt):
        p = rot.angle_axis_rotate_point(cam[:3], pt) + cam[3:6]
        xp, yp = -p[0] / p[2], -p[1] / p[2]
        r2 = xp * xp + yp * yp
        d = 1.0 + r2 * (cam[7] + cam[8] * r2)
        return jnp.stack([cam[6] * d * xp, cam[6] * d * yp])

    def quat_rotate(q, pt):
        return rot.unit_quaternion_rotate_point(q / jnp.linalg.norm(q), pt)

    for name, fn, shapes in [
        ("Linear10", linear_cost, [(10,)]),
        ("Rat43", rat43, [(4,), (2,)]),
        ("SnavelyReprojection", snavely, [(9,), (3,)]),
        ("QuaternionRotatePoint", quat_rotate, [(4,), (3,)]),
    ]:
        args = [jnp.asarray(rng.normal(size=(N,) + s) + 1.0)
                for s in shapes]

        def one(*ps, _fn=fn):
            def g(*qs):
                r = jnp.atleast_1d(_fn(*qs))
                return r, r
            J, r = jax.jacfwd(g, argnums=tuple(range(len(ps))),
                              has_aux=True)(*ps)
            return r, J

        f = jax.jit(jax.vmap(one))
        block(f(*args))
        dt = bench(f"AutoDiff_{name}", lambda: block(f(*args)),
                   device=dname, n=N)
    return 0


if __name__ == "__main__":
    sys.exit(main())
