"""The AUTO folded-epilogue LIN kernel (ops/pallas_lin.py
_lin_kernel_auto): the hand Snavely kernel's one-pass
linearize+Gram pipeline generalized to ANY traceable two-slot (e, f)
functor via the jet_compile auto-emitter. Interpret-mode parity vs the
hand kernel and vs the generic jacfwd fused path.

Reference role: generate_template_specializations.py produces 44
compiled eliminator specializations for the hot shapes; here ONE
emitter covers every shape, with the hand kernel remaining as the
tuned Snavely special case."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.io.bal import build_bal_ceres_problem, synthetic_bal_problem
from ceres_tpu.program import CompiledProgram
from ceres_tpu.solvers.schur import detect_schur_structure
from ceres_tpu.ops.pallas_lin import make_pallas_lin, pallas_lin_supported


@pytest.fixture(autouse=True)
def interpret_mode():
    os.environ["CERES_TPU_PALLAS_INTERPRET"] = "1"
    yield
    os.environ.pop("CERES_TPU_PALLAS_INTERPRET", None)
    os.environ.pop("CERES_TPU_AUTOLIN_FORCE", None)


def _bal_problem():
    bal = synthetic_bal_problem(num_cameras=6, num_points=150,
                                num_observations=600, seed=3,
                                pixel_noise=0.5)
    bal.perturb(rotation_sigma=0.05, translation_sigma=0.3,
                point_sigma=0.2, seed=5)
    return build_bal_ceres_problem(bal)[0]


def _opts(**kw):
    return ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
        use_mixed_precision_solves=True, fused_iterations=True,
        max_num_iterations=30, function_tolerance=1e-8, **kw)


def test_auto_lin_matches_hand_on_snavely():
    """Forcing Snavely through the auto emitter must reproduce the hand
    kernel's outputs (EtE, g_e, A_e, FtF, g_f) to f32 tolerance."""
    opts = _opts()
    prog = CompiledProgram.get_cached(_bal_problem(), opts)
    meta = detect_schur_structure(prog, opts)
    plin_hand = make_pallas_lin(prog, opts, meta)
    assert plin_hand is not None
    x0 = prog.initial_state()
    se = jnp.ones((plin_hand.ne_pad, meta.te), jnp.float32)
    out_h = plin_hand.lin(x0, se, None)

    os.environ["CERES_TPU_AUTOLIN_FORCE"] = "1"
    prog2 = CompiledProgram.get_cached(_bal_problem(), opts)
    meta2 = detect_schur_structure(prog2, opts)
    assert pallas_lin_supported(prog2, opts, meta2, True, True, False)
    plin_auto = make_pallas_lin(prog2, opts, meta2)
    assert plin_auto is not None
    out_a = plin_auto.lin(x0, se, None)
    for k in ["EtE", "g_e", "A_eT", "FtF", "g_f"]:
        a, h = np.asarray(out_a[k]), np.asarray(out_h[k])
        rel = np.max(np.abs(a - h)) / (np.max(np.abs(h)) + 1e-30)
        assert rel < 1e-5, (k, rel)


class _WeightedPinhole:
    """A custom (non-registry) reprojection functor: 6-param camera
    (angle-axis rotation + translation), 3-param point, plain pinhole
    with a per-functor weight — NOT Snavely, so only the auto emitter
    can serve it."""

    def __init__(self, ox, oy, w):
        self.ox, self.oy, self.w = float(ox), float(oy), float(w)

    def __call__(self, cam, pt):
        from ceres_tpu.rotation import angle_axis_rotate_point
        p = angle_axis_rotate_point(cam[0:3], pt) + cam[3:6]
        xp = -p[0] / p[2]
        yp = -p[1] / p[2]
        return jnp.stack([self.w * (xp - self.ox),
                          self.w * (yp - self.oy)])


def _custom_problem(seed=0):
    """Well-posed synthetic: observations projected from ground truth,
    parameters perturbed — converges back near zero cost."""
    from ceres_tpu.rotation import angle_axis_rotate_point
    rng = np.random.default_rng(seed)
    ncam, npts = 5, 60
    cams_true = [np.concatenate([0.05 * rng.standard_normal(3),
                                 [0.1 * c, -0.1, 4.0]])
                 for c in range(ncam)]
    pts_true = [0.5 * rng.standard_normal(3) for _ in range(npts)]

    def project(cam, pt):
        p = np.asarray(angle_axis_rotate_point(
            jnp.asarray(cam[0:3]), jnp.asarray(pt))) + cam[3:6]
        return -p[0] / p[2], -p[1] / p[2]

    cams = [c + 0.01 * rng.standard_normal(6) for c in cams_true]
    pts = [p + 0.02 * rng.standard_normal(3) for p in pts_true]
    prob = ct.Problem()
    for j in range(npts):
        for c in rng.choice(ncam, size=3, replace=False):
            ox, oy = project(cams_true[c], pts_true[j])
            prob.add_residual_block(
                ct.AutoDiffCostFunction(
                    _WeightedPinhole(ox, oy, 1.0 + 0.1 * (c % 3)),
                    2, [6, 3]),
                None, cams[c], pts[j])
    return prob


def test_auto_lin_activates_for_custom_functor():
    opts = _opts()
    prog = CompiledProgram.get_cached(_custom_problem(), opts)
    meta = detect_schur_structure(prog, opts)
    assert meta is not None
    assert pallas_lin_supported(prog, opts, meta, True, True, False)
    plin = make_pallas_lin(prog, opts, meta)
    assert plin is not None


def test_auto_lin_custom_functor_solve_matches_jacfwd():
    """End-to-end fused DENSE_SCHUR solve of the custom-functor BA with
    the auto LIN kernel active vs the generic jacfwd lin phase."""
    os.environ["CERES_TPU_NO_PALLAS_LIN"] = "1"
    try:
        s_off = ct.solve(_opts(), _custom_problem())
    finally:
        del os.environ["CERES_TPU_NO_PALLAS_LIN"]
    s_on = ct.solve(_opts(), _custom_problem())
    assert s_on.termination_type == ct.TerminationType.CONVERGENCE
    assert s_on.final_cost <= 1e-10
    assert abs(s_on.final_cost - s_off.final_cost) \
        <= 1e-4 * max(1e-8, s_off.final_cost), \
        (s_on.final_cost, s_off.final_cost)


def test_auto_lin_robust_loss_and_full_solve_snavely():
    """Snavely through the FORCED auto path, end-to-end solve parity
    with the hand-kernel solve (same problem, same options)."""
    s_hand = ct.solve(_opts(), _bal_problem())
    os.environ["CERES_TPU_AUTOLIN_FORCE"] = "1"
    s_auto = ct.solve(_opts(), _bal_problem())
    assert s_auto.termination_type == ct.TerminationType.CONVERGENCE
    assert abs(s_auto.final_cost - s_hand.final_cost) \
        <= 1e-5 * max(1.0, s_hand.final_cost)
