"""Loss function tests, mirroring the reference's loss_function_test.cc:
check rho(s) values and verify rho'/rho'' against numeric differentiation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.loss import correct_residuals_and_jacobian


LOSSES = [
    ct.TrivialLoss(),
    ct.HuberLoss(0.7),
    ct.SoftLOneLoss(1.3),
    ct.CauchyLoss(1.3),
    ct.ArctanLoss(1.3),
    ct.TolerantLoss(0.7, 0.4),
    ct.TukeyLoss(0.7),
    ct.ComposedLoss(ct.HuberLoss(0.5), ct.CauchyLoss(1.0)),
    ct.ScaledLoss(ct.CauchyLoss(1.0), 2.5),
    ct.LossFunctionWrapper(ct.HuberLoss(0.7)),
]


@pytest.mark.parametrize("loss", LOSSES, ids=lambda l: type(l).__name__)
@pytest.mark.parametrize("s", [0.25, 1.0, 2.5, 10.0])
def test_derivative_consistency(loss, s):
    """rho' and rho'' match AD of rho (loss_function_test.cc AssertLossFunctionIsValid)."""
    s = jnp.asarray(s, dtype=jnp.float64)
    rho0, rho1, rho2 = loss.evaluate(s)
    d1 = jax.grad(lambda t: loss.evaluate(t)[0])(s)
    d2 = jax.grad(lambda t: loss.evaluate(t)[1])(s)
    np.testing.assert_allclose(rho1, d1, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(rho2, d2, rtol=1e-8, atol=1e-12)


def test_huber_values():
    loss = ct.HuberLoss(1.0)
    # inlier region: rho(s) = s
    r0, r1, r2 = loss.evaluate(jnp.asarray(0.5))
    assert float(r0) == 0.5 and float(r1) == 1.0 and float(r2) == 0.0
    # outlier: rho(s) = 2 sqrt(s) - 1
    r0, r1, r2 = loss.evaluate(jnp.asarray(4.0))
    np.testing.assert_allclose(float(r0), 2 * 2.0 - 1.0)


def test_tolerant_loss_asymptotics():
    loss = ct.TolerantLoss(5.0, 1.0)
    # Far below a: nearly flat; far above: nearly linear in s - a.
    lo = float(loss.evaluate(jnp.asarray(0.1))[0])
    hi0 = float(loss.evaluate(jnp.asarray(100.0))[0])
    hi1 = float(loss.evaluate(jnp.asarray(101.0))[0])
    assert lo < 0.1
    np.testing.assert_allclose(hi1 - hi0, 1.0, rtol=1e-6)


def test_tukey_suppresses_outliers():
    loss = ct.TukeyLoss(1.0)
    r0, r1, r2 = loss.evaluate(jnp.asarray(100.0))
    np.testing.assert_allclose(float(r0), 1.0 / 6.0)
    assert float(r1) == 0.0 and float(r2) == 0.0


def test_scaled_loss():
    base = ct.CauchyLoss(1.0)
    scaled = ct.ScaledLoss(base, 3.0)
    s = jnp.asarray(2.0)
    for a, b in zip(base.evaluate(s), scaled.evaluate(s)):
        np.testing.assert_allclose(3.0 * float(a), float(b))


def test_loss_function_wrapper_swap():
    w = ct.LossFunctionWrapper(ct.HuberLoss(1.0))
    s = jnp.asarray(4.0)
    v1 = float(w.evaluate(s)[0])
    w.reset(ct.TrivialLoss())
    v2 = float(w.evaluate(s)[0])
    assert v1 != v2 and v2 == 4.0


def test_corrector_matches_reference_semantics():
    """corrector_test.cc core property: for the corrected residual/Jacobian,
    g = J_c^T r_c equals rho' J^T r and H ~ J_c^T J_c approximates the
    Gauss-Newton Hessian of the robustified cost."""
    rng = np.random.default_rng(0)
    n, r, t = 5, 3, 4
    res = jnp.asarray(rng.normal(size=(n, r)))
    jac = jnp.asarray(rng.normal(size=(n, r, t)))
    loss = ct.CauchyLoss(1.0)
    cost, rc, Jc = correct_residuals_and_jacobian(loss, res, jac)

    s = jnp.sum(res * res, axis=-1)
    rho0, rho1, rho2 = loss.evaluate(s)
    np.testing.assert_allclose(np.asarray(cost), 0.5 * np.asarray(rho0))

    # Gradient identity: J_c^T r_c = rho' J^T r  (Triggs correction keeps
    # the gradient of the robustified cost exact).
    g_corrected = jnp.einsum("nrt,nr->nt", Jc, rc)
    g_expected = rho1[:, None] * jnp.einsum("nrt,nr->nt", jac, res)
    np.testing.assert_allclose(np.asarray(g_corrected),
                               np.asarray(g_expected), rtol=1e-10)


def test_corrector_trivial_noop():
    rng = np.random.default_rng(1)
    res = jnp.asarray(rng.normal(size=(4, 2)))
    jac = jnp.asarray(rng.normal(size=(4, 2, 3)))
    cost, rc, Jc = correct_residuals_and_jacobian(ct.TrivialLoss(), res, jac)
    np.testing.assert_allclose(np.asarray(rc), np.asarray(res))
    np.testing.assert_allclose(np.asarray(Jc), np.asarray(jac))
    np.testing.assert_allclose(np.asarray(cost),
                               0.5 * np.sum(np.asarray(res) ** 2, axis=-1))


def test_vectorized_loss_parameters_match_reference():
    """Same-class losses with different scalar parameters batch into one
    bucket; the result must match solving with explicitly distinct
    losses (verified against a hand-computed robustified cost)."""
    import ceres_tpu as ct

    xs = np.linspace(0.0, 3.0, 12)
    ys = np.exp(0.5 * xs) + np.array([3.0 if i == 5 else 0.0
                                      for i in range(12)])

    class R:
        def __init__(self, x, y):
            self.x = x
            self.y = y

        def __call__(self, m):
            return self.y - jnp.exp(m[0] * self.x)

    def build():
        m = np.array([0.1])
        problem = ct.Problem()
        for i, (x, y) in enumerate(zip(xs, ys)):
            # per-block scale: same HuberLoss class, different a
            loss = ct.HuberLoss(0.5 + 0.1 * i)
            problem.add_residual_block(
                ct.AutoDiffCostFunction(R(float(x), float(y)), 1, [1]),
                loss, m)
        return problem, m

    problem, m = build()
    from ceres_tpu.program import CompiledProgram
    prog = CompiledProgram(problem)
    assert len(prog.buckets) == 1  # batched despite 12 distinct a's

    s = ct.solve(ct.SolverOptions(max_num_iterations=100), problem)
    assert s.is_solution_usable()

    # reference cost at the solution computed by hand
    r = ys - np.exp(m[0] * xs)
    sq = r * r
    total = 0.0
    for i, si in enumerate(sq):
        a = 0.5 + 0.1 * i
        b = a * a
        total += 0.5 * (si if si <= b else 2.0 * a * np.sqrt(si) - b)
    np.testing.assert_allclose(s.final_cost, total, rtol=1e-10)
