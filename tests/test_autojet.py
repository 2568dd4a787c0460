"""Interpret-mode parity of the jaxpr->jetlib auto-compiler
(ops/jet_compile.py) vs the vmap(jacfwd) path.

The reference's Jet machinery is fully generic over user functors
(include/ceres/internal/autodiff.h:307); these tests pin the TPU
equivalent: ANY traceable functor (manifolds included) auto-compiles to
the Pallas plane kernel, matching jacfwd to f32 tolerance, with a clean
fallback for functors outside the interpreter's primitive set.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.cost import AutoDiffCostFunction, DynamicAutoDiffCostFunction
from ceres_tpu.program import CompiledProgram
import ceres_tpu.ops.pallas_linearize as PL


def _interp(on=True):
    if on:
        os.environ["CERES_TPU_PALLAS_INTERPRET"] = "1"
    else:
        os.environ.pop("CERES_TPU_PALLAS_INTERPRET", None)


@pytest.fixture(autouse=True)
def interpret_mode():
    _interp(True)
    yield
    _interp(False)


def _parity(prog, bk, atol_r=1e-4, rtol_j=1e-5, force_auto=False):
    """Build the kernel for bk, compare (r, J) against jacfwd in f32."""
    x0 = prog.initial_state()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(np.asarray(x0, dtype=np.float64)
                     + 0.02 * rng.standard_normal(x0.shape))
    os.environ["CERES_TPU_NO_AUTOJET"] = "1"
    try:
        r_ref, J_ref = prog._bucket_linearize(bk, x0,
                                              cast_dtype=jnp.float32)
    finally:
        del os.environ["CERES_TPU_NO_AUTOJET"]
    saved = dict(PL._REGISTRY)
    if force_auto:
        PL._REGISTRY.clear()
    try:
        assert PL.pallas_linearize_supported(prog, bk)
        lin = PL.make_pallas_bucket_linearize(prog, bk)
        assert lin is not None
        r, J = lin(x0)
    finally:
        PL._REGISTRY.update(saved)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                               atol=atol_r, rtol=1e-5)
    scale = max(float(jnp.max(jnp.abs(J_ref))), 1.0)
    assert float(jnp.max(jnp.abs(J - J_ref))) / scale < rtol_j
    return r, J


def test_circle_fit_auto():
    """examples/circle_fit.cc functor: r = m^4 - ||p - c||^2."""
    from ceres_tpu.examples.circle_fit import (DistanceFromCircleCost,
                                               synthesize)
    pts = synthesize(num_points=80)
    x, y, m = np.array([0.1]), np.array([-0.2]), np.array([1.0])
    problem = ct.Problem()
    for xx, yy in pts:
        problem.add_residual_block(
            AutoDiffCostFunction(DistanceFromCircleCost(float(xx),
                                                        float(yy)),
                                 1, [1, 1, 1]), None, x, y, m)
    prog = CompiledProgram(problem)
    _parity(prog, prog.buckets[0])


def test_snavely_auto():
    """The BA functor (snavely_reprojection_error.h:53) through the
    GENERIC compiler (the hand pallas_lin megakernel is a separate,
    deeper path)."""
    from ceres_tpu.io.bal import (synthetic_bal_problem,
                                  build_bal_ceres_problem)
    bal = synthetic_bal_problem(3, 40, 120, seed=0, pixel_noise=0.5)
    problem, _, _ = build_bal_ceres_problem(bal)
    prog = CompiledProgram(problem)
    _parity(prog, max(prog.buckets, key=lambda b: b.n))


def test_pose3d_auto_matches_hand_kernel():
    """SE3 pose graph: the auto-compiled kernel must agree with BOTH the
    jacfwd path and the hand-written registry kernel — quaternion
    manifold Plus traced through the jet interpreter (gather indices,
    select_n branches, pjit inlining all exercised)."""
    from ceres_tpu.examples.slam import build_pose_graph_3d_problem
    from ceres_tpu.io.g2o import synthetic_pose_graph_3d
    poses, constraints, _ = synthetic_pose_graph_3d(num_poses=25, seed=4,
                                                    loop_every=5)
    problem, _, _ = build_pose_graph_3d_problem(poses, constraints)
    prog = CompiledProgram(problem)
    bk = max(prog.buckets, key=lambda b: b.n)
    r_auto, J_auto = _parity(prog, bk, force_auto=True)
    prog._plinz_cache = {}
    lin_hand = PL.make_pallas_bucket_linearize(prog, bk)
    x0 = prog.initial_state()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(np.asarray(x0, dtype=np.float64)
                     + 0.02 * rng.standard_normal(x0.shape))
    r_hand, J_hand = lin_hand(x0)
    np.testing.assert_allclose(np.asarray(r_hand), np.asarray(r_auto),
                               atol=1e-5, rtol=1e-5)
    scale = max(float(jnp.max(jnp.abs(J_hand))), 1.0)
    assert float(jnp.max(jnp.abs(J_hand - J_auto))) / scale < 1e-5


def test_foe_patch_auto():
    """FoE-class linear filter over a 25-slot patch (fields_of_experts.h
    FieldsOfExpertsCost shape, AD variant): the many-tangent-channel
    case (nt=25)."""

    class FoEPatch:
        def __init__(self, coef):
            self.coef = np.asarray(coef)

        def __call__(self, *pixels):
            patch = jnp.stack([p[0] for p in pixels])
            return jnp.dot(self.coef, patch)[None]

    rng = np.random.default_rng(1)
    pix = [np.array([float(i) * 0.3]) for i in range(25)]
    problem = ct.Problem()
    coef = rng.standard_normal(25)
    for k in range(40):
        problem.add_residual_block(
            AutoDiffCostFunction(FoEPatch(coef * (1 + 0.01 * k)),
                                 1, [1] * 25), None, *pix)
    prog = CompiledProgram(problem)
    _parity(prog, prog.buckets[0])


def test_dynamic_cost_auto():
    """DynamicAutoDiffCostFunction (dynamic_autodiff_cost_function.h:80
    role): runtime-chosen block count, through the auto compiler."""
    from ceres_tpu.examples.robot_pose_mle import RangeConstraint
    blocks = [np.array([0.5 + 0.01 * i]) for i in range(3)]
    problem = ct.Problem()
    for k in range(24):
        cost = DynamicAutoDiffCostFunction(
            RangeConstraint(10.0 + 0.1 * k, 0.01, 30.0))
        for _ in range(3):
            cost.add_parameter_block(1)
        cost.set_num_residuals(1)
        problem.add_residual_block(cost, None, *blocks)
    prog = CompiledProgram(problem)
    bk = max(prog.buckets, key=lambda b: b.n)
    assert bk.n == 24
    _parity(prog, bk)


def test_robust_loss_bucket_not_hijacked():
    """Buckets with per-row loss scalars keep the jacfwd path (the
    corrector runs outside either way; per-row loss params are the
    unsupported case)."""
    from ceres_tpu.examples.circle_fit import (DistanceFromCircleCost,
                                               synthesize)
    pts = synthesize(num_points=12)
    x, y, m = np.array([0.1]), np.array([-0.2]), np.array([1.0])
    problem = ct.Problem()
    for i, (xx, yy) in enumerate(pts):
        problem.add_residual_block(
            AutoDiffCostFunction(DistanceFromCircleCost(float(xx),
                                                        float(yy)),
                                 1, [1, 1, 1]),
            ct.CauchyLoss(1.0 + 0.1 * i), x, y, m)
    prog = CompiledProgram(problem)
    bk = prog.buckets[0]
    if getattr(bk, "loss_attr_consts", None):
        assert not PL.pallas_linearize_supported(prog, bk)


def test_unsupported_primitive_falls_back():
    """A functor with data-dependent control flow (sort) must be refused
    by the validator and fall back cleanly — no exception, no kernel."""

    class Sorty:
        def __call__(self, p):
            return jnp.sort(p)[:1]

    p = np.array([1.0, 2.0])
    problem = ct.Problem()
    for _ in range(4):
        problem.add_residual_block(
            AutoDiffCostFunction(Sorty(), 1, [2]), None, p)
    prog = CompiledProgram(problem)
    bk = prog.buckets[0]
    assert not PL.pallas_linearize_supported(prog, bk)
    # and the generic evaluator still works
    x0 = prog.initial_state()
    r, J = prog._bucket_linearize(bk, x0, cast_dtype=jnp.float32)
    assert np.isfinite(np.asarray(r)).all()


def test_autojet_kill_switch():
    from ceres_tpu.examples.circle_fit import (DistanceFromCircleCost,
                                               synthesize)
    pts = synthesize(num_points=8)
    x, y, m = np.array([0.1]), np.array([-0.2]), np.array([1.0])
    problem = ct.Problem()
    for xx, yy in pts:
        problem.add_residual_block(
            AutoDiffCostFunction(DistanceFromCircleCost(float(xx),
                                                        float(yy)),
                                 1, [1, 1, 1]), None, x, y, m)
    prog = CompiledProgram(problem)
    os.environ["CERES_TPU_NO_AUTOJET"] = "1"
    try:
        assert not PL.pallas_linearize_supported(prog, prog.buckets[0])
    finally:
        del os.environ["CERES_TPU_NO_AUTOJET"]


def test_full_solve_through_autojet_matches():
    """End-to-end: circle fit solved with the auto kernel active matches
    the solve with it disabled (same final cost to f32-driven
    tolerance)."""
    from ceres_tpu.examples.circle_fit import fit_circle, synthesize
    pts = synthesize(num_points=60, seed=3)
    os.environ["CERES_TPU_NO_AUTOJET"] = "1"
    try:
        _, _, r_off, s_off = fit_circle(pts, 0.0, 0.0, 1.0)
    finally:
        del os.environ["CERES_TPU_NO_AUTOJET"]
    _, _, r_on, s_on = fit_circle(pts, 0.0, 0.0, 1.0)
    assert abs(r_on - r_off) < 1e-3
    assert abs(s_on.final_cost - s_off.final_cost) \
        <= 1e-4 * max(1.0, s_off.final_cost)


def test_custom_jvp_falls_back_to_jacfwd():
    """A functor relying on a user-supplied JVP rule (custom_jvp) must
    NOT be autojet-compiled (inlining its primal would silently ignore
    the custom derivative, e.g. edge-point-safe sqrt at 0); it falls
    back to jacfwd, which honors the rule (ADVICE r4)."""

    @jax.custom_jvp
    def safe_sqrt(x):
        return jnp.sqrt(x)

    @safe_sqrt.defjvp
    def safe_sqrt_jvp(primals, tangents):
        (x,), (t,) = primals, tangents
        # intentionally-regularized derivative near 0
        return jnp.sqrt(x), t * 0.5 / jnp.sqrt(x + 1e-6)

    class CustomCost:
        def __call__(self, p):
            return safe_sqrt(p * p) - 2.0

    p = np.array([0.5, 1.5])
    problem = ct.Problem()
    for _ in range(4):
        problem.add_residual_block(
            AutoDiffCostFunction(CustomCost(), 2, [2]), None, p)
    prog = CompiledProgram(problem)
    bk = prog.buckets[0]
    from ceres_tpu.ops.jet_compile import make_auto_spec
    assert make_auto_spec(prog, bk) is None
    # the jacfwd fallback honors the custom rule: at p=0 the derivative
    # is finite (0.5/sqrt(1e-6)), not NaN
    x0 = jnp.zeros_like(prog.initial_state())
    r, J = prog._bucket_linearize(bk, x0, cast_dtype=jnp.float32)
    assert np.isfinite(np.asarray(J)).all()


def test_emit_time_failure_falls_back_in_interpret_mode():
    """A functor that PASSES the name-only validator (gather is an
    allowed selection primitive) but fails at emit time (traced gather
    index) must fall back to jacfwd in interpret mode instead of
    crashing the solve trace (ADVICE r4 medium)."""

    class TracedIndex:
        def __call__(self, p):
            # index depends on the traced parameter value -> the
            # selection rule raises _Unsupported only at emit time
            idx = jnp.clip(jnp.floor(p[0]).astype(jnp.int32), 0, 1)
            tbl = jnp.stack([p[0] * 2.0, p[1] * 3.0])
            return tbl[idx][None] - 1.0

    p = np.array([0.3, 0.7])
    problem = ct.Problem()
    for _ in range(4):
        problem.add_residual_block(
            AutoDiffCostFunction(TracedIndex(), 1, [2]), None, p)
    prog = CompiledProgram(problem)
    bk = prog.buckets[0]
    # must not raise; must cleanly report unsupported and use jacfwd
    lin = PL.make_pallas_bucket_linearize(prog, bk)
    assert lin is None
    x0 = prog.initial_state()
    r, J = prog._bucket_linearize(bk, x0, cast_dtype=jnp.float32)
    assert np.isfinite(np.asarray(r)).all()
