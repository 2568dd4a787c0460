"""Robust loss functions rho(s) and the Triggs corrector.

Capability parity with the reference's loss_function.h:87-392 /
loss_function.cc and corrector.h:51 / corrector.cc. Every loss is a
JAX-traceable callable `evaluate(s) -> (rho, rho', rho'')` evaluated on the
*squared* residual norm s = ||r||^2, batched with vmap over residual blocks.

All branches are implemented with `jnp.where` (not Python if) so a single
bucket of residual blocks evaluates in one fused XLA kernel.
"""

from __future__ import annotations

import jax.numpy as jnp


class LossFunction:
    """Base class. Subclasses implement evaluate(s) -> (rho0, rho1, rho2)."""

    def evaluate(self, s):
        raise NotImplementedError

    def __call__(self, s):
        return self.evaluate(s)


class TrivialLoss(LossFunction):
    """rho(s) = s (reference loss_function.h:87)."""

    def evaluate(self, s):
        return s, jnp.ones_like(s), jnp.zeros_like(s)


class HuberLoss(LossFunction):
    """Quadratic near zero, linear in the tails (loss_function.h:132)."""

    def __init__(self, a: float):
        self.a = float(a)
        self.b = self.a * self.a

    def evaluate(self, s):
        # Guard sqrt against s <= b region where its value is unused.
        r = jnp.sqrt(jnp.maximum(s, self.b))
        out_rho0 = 2.0 * self.a * r - self.b
        out_rho1 = self.a / r
        out_rho2 = -0.5 * out_rho1 / jnp.maximum(s, self.b)
        inlier = s <= self.b
        return (jnp.where(inlier, s, out_rho0),
                jnp.where(inlier, jnp.ones_like(s), out_rho1),
                jnp.where(inlier, jnp.zeros_like(s), out_rho2))


class SoftLOneLoss(LossFunction):
    """rho(s) = 2 b (sqrt(1 + s/b) - 1) (loss_function.h:175)."""

    def __init__(self, a: float):
        self.b = float(a) * float(a)
        self.c = 1.0 / self.b

    def evaluate(self, s):
        total = 1.0 + s * self.c
        tmp = jnp.sqrt(total)
        return (2.0 * self.b * (tmp - 1.0),
                1.0 / tmp,
                -self.c / (2.0 * total * tmp))


class CauchyLoss(LossFunction):
    """rho(s) = b log(1 + s/b) (loss_function.h:191)."""

    def __init__(self, a: float):
        self.b = float(a) * float(a)
        self.c = 1.0 / self.b

    def evaluate(self, s):
        total = 1.0 + s * self.c
        inv = 1.0 / total
        return self.b * jnp.log(total), inv, -self.c * inv * inv


class ArctanLoss(LossFunction):
    """rho(s) = a atan(s/a); caps the value of a residual (loss_function.h:208)."""

    def __init__(self, a: float):
        self.a = float(a)
        self.b = 1.0 / (self.a * self.a)

    def evaluate(self, s):
        total = 1.0 + s * s * self.b
        inv = 1.0 / total
        return self.a * jnp.arctan2(s, self.a), inv, -2.0 * s * self.b * inv * inv


class TolerantLoss(LossFunction):
    """Flat near zero up to `a`, then linear (loss_function.h:229)."""

    def __init__(self, a: float, b: float):
        assert a >= 0.0 and b > 0.0
        self.a = float(a)
        self.b = float(b)
        self.c = self.b * jnp.log1p(jnp.exp(-self.a / self.b))

    def evaluate(self, s):
        x = (s - self.a) / self.b
        # Stable softplus / logistic (reference guards x > 115 overflow).
        big = x > 35.0
        softplus = jnp.where(big, x, jnp.log1p(jnp.exp(jnp.minimum(x, 35.0))))
        sig = jnp.where(big, jnp.ones_like(x),
                        1.0 / (1.0 + jnp.exp(-jnp.minimum(jnp.abs(x), 35.0))))
        sig = jnp.where(x < 0,
                        jnp.exp(jnp.maximum(x, -35.0))
                        / (1.0 + jnp.exp(jnp.maximum(x, -35.0))),
                        sig)
        rho0 = self.b * softplus - self.c
        rho1 = sig
        rho2 = sig * (1.0 - sig) / self.b
        return rho0, rho1, rho2


class TukeyLoss(LossFunction):
    """Tukey biweight: completely suppresses large outliers
    (loss_function.h:268)."""

    def __init__(self, a: float):
        self.a2 = float(a) * float(a)

    def evaluate(self, s):
        value = jnp.maximum(1.0 - s / self.a2, 0.0)
        inlier = s <= self.a2
        rho0 = jnp.where(inlier, self.a2 / 6.0 * (1.0 - value ** 3),
                         jnp.full_like(s, self.a2 / 6.0))
        rho1 = jnp.where(inlier, 0.5 * value * value, jnp.zeros_like(s))
        rho2 = jnp.where(inlier, -value / self.a2, jnp.zeros_like(s))
        return rho0, rho1, rho2


class ComposedLoss(LossFunction):
    """rho(s) = f(g(s)) (loss_function.h:287)."""

    def __init__(self, f: LossFunction, g: LossFunction):
        self.f = f
        self.g = g

    def evaluate(self, s):
        g0, g1, g2 = self.g.evaluate(s)
        f0, f1, f2 = self.f.evaluate(g0)
        return f0, f1 * g1, f2 * g1 * g1 + f1 * g2


class ScaledLoss(LossFunction):
    """a * rho(s); None inner means a * s (loss_function.h:299)."""

    def __init__(self, rho, a: float):
        self.rho = rho if rho is not None else TrivialLoss()
        self.a = float(a)

    def evaluate(self, s):
        r0, r1, r2 = self.rho.evaluate(s)
        return self.a * r0, self.a * r1, self.a * r2


class LossFunctionWrapper(LossFunction):
    """Mutable holder allowing the loss to be swapped between solves
    (loss_function.h:330). NOTE: swapping after Problem compilation
    invalidates the compiled program; Problem re-compiles on next solve."""

    def __init__(self, rho, ownership=None):
        self.rho = rho

    def reset(self, rho, ownership=None):
        self.rho = rho

    def evaluate(self, s):
        if self.rho is None:
            return TrivialLoss().evaluate(s)
        return self.rho.evaluate(s)


def correct_residuals_and_jacobian(loss: LossFunction, residuals, jacobian):
    """Triggs robust-loss correction of a batch of residual blocks.

    Reference corrector.cc (Triggs et al. correction; handles rho'' < 0 via
    the alpha solve) applied per residual block, vectorized over the leading
    batch axis.

    Args:
      loss: LossFunction (or None -> no-op).
      residuals: [n, r] per-block residuals.
      jacobian:  [n, r, t] per-block Jacobians (or None).
    Returns:
      (cost_per_block [n], corrected_residuals [n, r], corrected_jacobian)
      where cost_per_block = 0.5 * rho(||r||^2).
    """
    sq_norm = jnp.sum(residuals * residuals, axis=-1)  # [n]
    if loss is None:
        cost = 0.5 * sq_norm
        return cost, residuals, jacobian

    rho0, rho1, rho2 = loss.evaluate(sq_norm)
    cost = 0.5 * rho0

    sqrt_rho1 = jnp.sqrt(jnp.maximum(rho1, 0.0))
    # Simple case: rho2 <= 0 or ||r||^2 == 0 -> pure rescale (corrector.cc:60).
    simple = (sq_norm == 0.0) | (rho2 <= 0.0)

    safe_sq = jnp.where(sq_norm == 0.0, 1.0, sq_norm)
    safe_rho1 = jnp.where(rho1 == 0.0, 1.0, rho1)
    D = 1.0 + 2.0 * sq_norm * rho2 / safe_rho1
    alpha = 1.0 - jnp.sqrt(jnp.maximum(D, 0.0))
    residual_scaling = jnp.where(simple, sqrt_rho1,
                                 sqrt_rho1 / (1.0 - alpha))
    alpha_sq_norm = jnp.where(simple, 0.0, alpha / safe_sq)

    corrected_residuals = residuals * residual_scaling[..., None]
    corrected_jacobian = None
    if jacobian is not None:
        # J <- sqrt(rho1) (I - alpha_sq_norm r r^T) J   (corrector.cc:110)
        rTJ = jnp.einsum("nr,nrt->nt", residuals, jacobian)
        corrected_jacobian = sqrt_rho1[..., None, None] * (
            jacobian
            - alpha_sq_norm[..., None, None]
            * residuals[..., :, None] * rTJ[..., None, :])
    return cost, corrected_residuals, corrected_jacobian
