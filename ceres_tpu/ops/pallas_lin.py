"""Pallas lin+eliminate front-end for the fused Schur eliminator.

Two TPU kernels cover the hot phases of the Snavely bundle-adjustment
LM step (the reference's AutoDiff + SchurEliminator roles,
autodiff_cost_function.h:156 + schur_eliminator_impl.h:228,
re-architected for the MXU/VPU rather than translated):

1. LIN kernel (radius-independent, one pass per linearization):
   per e-block tile, the residual/Jacobian jet chains (hand-vectorized
   sparse forward-mode, jet.h role), the per-point Gram blocks E^T E and
   e-gradient, the E-SCALED cross tensor A_e = diag(s_e) E^T F, the
   F-side block-diagonal F^T F and f-gradient (grid-accumulated [kf,
   tf, tf] — folding these in-kernel removes the [n, k, tf, tf] Gram
   materialization the XLA one-hot einsum path paid ~230 MB/iteration
   for), and the iteration-0 Jacobi scale resolution (s_e derived from
   this linearization's own Gram diagonals,
   trust_region_minimizer.cc:261-277).

2. ELIM kernel (radius-dependent, one pass per damped solve): given the
   stored A_e, the damped-inverse planes inv(E_s^T E_s + D^2) and
   z = inv * b_e (computed by XLA on the small tensors), accumulates the
   reduced system's correction S_corr = sum_n A_n^T inv_n A_n (MXU dots
   per tile) and rhs part A^T z — so A is read from HBM exactly once per
   damped solve and the [te, nf, ne] Y tensor is never materialized.
   Rejected LM steps re-run ONLY this kernel (the reference reuses the
   Jacobian across rejections, levenberg_marquardt_strategy.cc
   reuse_diagonal_).

Layout: rows live chunk-grouped [ne, k] (k = chunk width); every per-row
quantity in the kernel is a PLANE [k, TILE] — k on sublanes, e-blocks on
lanes — so all jet arithmetic runs at full VPU lane width. Channel axes
(residual r, tangent t) are unrolled in Python.

Specialization is the point, not a limitation: the reference ships 44
generated eliminator specializations for its hot shapes
(schur_eliminator.h, generate_template_specializations.py); this is the
TPU analog for the BAL hot shape. Non-Snavely problems keep the generic
fused path.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pallas_lin_supported", "make_pallas_lin"]


# ----------------------------------------------------------------------
# Jet algebra: shared with ops/pallas_linearize.py (see ops/jetlib.py).

from .jetlib import (_Jet, _jc, _jvar, _p, _jadd, _jsub, _jneg, _jmul,
                     _jscale, _jshift, _jdiv, _jsqrt, _jsincos, _jwhere,
                     _jdot3, _jcross, _aa_rotate_jets,
                     _snavely_residual_jets, _correct_jets, _jet_planes)


# ----------------------------------------------------------------------
# LIN kernel

def _lin_kernel(xf_ref, xe_ref, oh_ref, mask_ref,
                obsx_ref, obsy_ref, se_ref, first_ref,
                ete_ref, ge_ref, seo_ref, a_ref, ftf_ref, gf_ref,
                *, te, tf, kf, k, eo, fo, loss=None, use_scaling=True):
    """One e-block tile: jets -> EtE, g_e, scale, scaled cross A_e,
    grid-accumulated FtF / g_f.

    All refs hold planes with rows-on-lanes:
      xf  [kf*tf]      camera parameter values (SMEM scalars)
      xe  [te, T]      point parameter values
      oh  [kf, k, T]   one-hot camera membership (masked)
      mask [k, T]
      obsx/obsy [k, T]
      se  [te, T]      carried Jacobi scale (ignored when first)
      first [1]        SMEM flag: derive s_e from this tile's Gram diag
    outs:
      ete [te*te, T]   E^T E UNSCALED (row-major a*te+b)
      ge  [te, T]      e gradient UNSCALED
      seo [te, T]      resolved s_e (pad lanes -> 1)
      a   [te, kf*tf, T]  E-SCALED cross tensor A_e^T = (s_e E)^T F
                          (f scaling is a rank-1 congruence applied by
                          the caller on the reduced outputs)
      ftf [kf, tf*tf]  F^T F block diagonal UNSCALED (grid-accumulated)
      gf  [kf, tf]     f gradient UNSCALED (grid-accumulated)
    """
    from jax.experimental import pallas as pl

    nt = tf + te
    mask = mask_ref[...]                              # [k, T]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        ftf_ref[...] = jnp.zeros_like(ftf_ref)
        gf_ref[...] = jnp.zeros_like(gf_ref)

    # camera values per row: one-hot contraction against SMEM scalars
    cam = []
    for a in range(tf):
        plane = None
        for c in range(kf):
            term = oh_ref[c, :, :] * xf_ref[c * tf + a]
            plane = term if plane is None else plane + term
        cam.append(_jvar(plane, fo + a))
    pt = [_jvar(xe_ref[a, :][None, :], eo + a) for a in range(te)]

    rx, ry = _snavely_residual_jets(cam, pt, obsx_ref[...], obsy_ref[...],
                                    mask > 0.5)
    if loss is not None:
        rx, ry = _correct_jets([rx, ry], loss, mask > 0.5)

    rvals, rcols = [], []
    for jet in (rx, ry):
        v, cols = _jet_planes(jet, mask, nt)
        rvals.append(v)
        rcols.append(cols)

    # ---- E^T E, g_e (sum over r and k), Jacobi scale ----
    cn = [None] * te
    for a in range(te):
        ca = [rcols[r][eo + a] for r in range(2)]
        g = None
        for r in range(2):
            if ca[r] is None:
                continue
            term = ca[r] * rvals[r]
            g = term if g is None else g + term
        ge_ref[a, :] = (jnp.zeros_like(mask) if g is None else g
                        ).sum(axis=0)
        for b in range(a, te):
            cb = [rcols[r][eo + b] for r in range(2)]
            acc = None
            for r in range(2):
                if ca[r] is None or cb[r] is None:
                    continue
                term = ca[r] * cb[r]
                acc = term if acc is None else acc + term
            plane = (jnp.zeros_like(mask) if acc is None else acc
                     ).sum(axis=0)
            ete_ref[a * te + b, :] = plane
            if b != a:
                ete_ref[b * te + a, :] = plane
            else:
                cn[a] = plane

    # Iteration-0 Jacobi scaling from THIS linearization's Gram
    # diagonals (trust_region_minimizer.cc:261-277), carried thereafter.
    se = []
    for a in range(te):
        if not use_scaling:
            s = jnp.ones_like(cn[a])
        else:
            derived = 1.0 / (1.0 + jnp.sqrt(cn[a]))
            s = jnp.where(first_ref[0] > 0.5, derived, se_ref[a, :])
        se.append(s)
        seo_ref[a, :] = s

    # ---- A_e^T: a[a, c*tf+t, :] = s_e[a] * sum_k oh[c] * Ge[a,t] ----
    zero = jnp.zeros_like(mask[0])
    ge_planes = {}
    for a in range(te):
        for t in range(tf):
            acc = None
            for r in range(2):
                pa = rcols[r][eo + a]
                pf = rcols[r][fo + t]
                if pa is None or pf is None:
                    continue
                term = pa * pf
                acc = term if acc is None else acc + term
            ge_planes[(a, t)] = acc
    for c in range(kf):
        ohc = oh_ref[c]                                # [k, T]
        for a in range(te):
            for t in range(tf):
                gp = ge_planes[(a, t)]
                if gp is None:
                    a_ref[a, c * tf + t, :] = zero
                    continue
                a_ref[a, c * tf + t, :] = (gp * ohc).sum(axis=0) * se[a]

    # ---- F^T F block diagonal + f gradient (grid-accumulated) ----
    # ftf[c, t*tf+u] = sum_{r,k,n} oh[c,k,n] Jf[r,t][k,n] Jf[r,u][k,n].
    # Folding this in-kernel removes the [n, k, tf, tf] Gram
    # materialization (and its ~230 MB/iteration of HBM traffic) that
    # the XLA one-hot einsum path could not avoid. The fold itself runs
    # on the MXU: all tf*(tf+1)/2 pair planes + the tf gradient planes
    # are stacked into one [npair+tf, k, T] tensor and contracted
    # against the one-hot lanewise with k dots [kf, T] x [T, npair+tf]
    # at HIGHEST precision (exact f32: oh is 0/1) — the VPU
    # masked-reduce formulation (45 x [kf, k, T] multiply-reduces) was
    # ~0.47 ms/iteration of the kernel's 0.67 at BAL-16; the MXU fold
    # measures 0.29 total (benchmarks/hw_r5/lin_isolate).
    _fold_ftf_gf_mxu(oh_ref, rcols, rvals, ftf_ref, gf_ref, mask,
                     tf=tf, kf=kf, k=k, fo=fo, R=2)


def _fold_ftf_gf_mxu(oh_ref, rcols, rvals, ftf_ref, gf_ref, mask,
                     *, tf, kf, k, fo, R):
    """MXU one-hot fold shared by the hand and auto LIN kernels: builds
    the F-side pair planes P_tu = sum_r Jf_t Jf_u and gradient planes
    G_t = sum_r Jf_t r, stacks them [npair+tf, k, T], and contracts
    against the one-hot with k lane-slice dots (sum over rows =
    contraction over T per sublane k). Accumulates into ftf/gf."""
    zero_kt = jnp.zeros_like(mask)
    P_list = []
    for t in range(tf):
        for u in range(t, tf):
            P = None
            for r in range(R):
                pt_ = rcols[r][fo + t]
                pu_ = rcols[r][fo + u]
                if pt_ is None or pu_ is None:
                    continue
                term = pt_ * pu_
                P = term if P is None else P + term
            P_list.append(P if P is not None else zero_kt)
    G_list = []
    for t in range(tf):
        G = None
        for r in range(R):
            pt_ = rcols[r][fo + t]
            if pt_ is None:
                continue
            term = pt_ * rvals[r]
            G = term if G is None else G + term
        G_list.append(G if G is not None else zero_kt)
    Q = jnp.stack(P_list + G_list)                    # [npair+tf, k, T]
    oh = oh_ref[...]                                   # [kf, k, T]
    W = None
    for kk in range(k):
        d = jax.lax.dot_general(
            oh[:, kk, :], Q[:, kk, :],
            (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)        # [kf, npair+tf]
        W = d if W is None else W + d
    npair = tf * (tf + 1) // 2
    ftf_full = [None] * (tf * tf)
    idx = 0
    for t in range(tf):
        for u in range(t, tf):
            col = W[:, idx][:, None]
            ftf_full[t * tf + u] = col
            ftf_full[u * tf + t] = col
            idx += 1
    ftf_ref[...] += jnp.concatenate(ftf_full, axis=1)
    gf_ref[...] += W[:, npair:]


# ----------------------------------------------------------------------
# AUTO LIN kernel: the SAME folded epilogue (EtE/g_e/scale/A_e/FtF/g_f),
# with the residual jet chain auto-emitted from the functor's jaxpr
# (ops/jet_compile.py) instead of the hand-vectorized Snavely chain.
# This is what makes the fast path subsume the hand registry: ANY
# chunk-groupable two-slot (e, f) bucket with a traceable functor gets
# the one-pass linearize+Gram pipeline; the hand kernel remains only as
# the tuned special case for the Snavely hot shape.
#
# Masked-lane discipline differs from the hand chain: the hand jets are
# guard-masked internally (benign divisors on inactive lanes); a generic
# chain cannot be, so the HOST fills masked/pad lanes with a REAL row's
# data and camera (finite garbage), and every epilogue fold multiplies
# by planes that _jet_planes has already masked — the filled lanes
# contribute exactly zero (jet_compile.py module doc, edge-pad rule,
# applied to the chunk layout).

def _lin_kernel_auto(xf_ref, xe_ref, oh_ref, mask_ref, dat_ref,
                     se_ref, first_ref,
                     ete_ref, ge_ref, seo_ref, a_ref, ftf_ref, gf_ref,
                     *, te, tf, kf, k, eo, fo, R, P_dat, slot_order,
                     emit_raw, loss, use_scaling):
    """slot_order: per bk.slots, ('e', amb) or ('f', amb) — ordering of
    the xin planes emit_raw expects. emit_raw: jet_compile emit over
    [k, T]-plane jets."""
    from jax.experimental import pallas as pl

    nt = tf + te
    mask = mask_ref[...]                              # [k, T]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        ftf_ref[...] = jnp.zeros_like(ftf_ref)
        gf_ref[...] = jnp.zeros_like(gf_ref)

    # camera parameter values per row via the (lane-safe) one-hot
    cam_vals = []
    for a in range(tf):
        plane = None
        for c in range(kf):
            term = oh_ref[c, :, :] * xf_ref[c * tf + a]
            plane = term if plane is None else plane + term
        cam_vals.append(plane)                        # [k, T]
    pt_vals = [xe_ref[a, :][None, :] for a in range(te)]   # [1, T]

    xin_planes = []
    for kind, amb in slot_order:
        xin_planes.extend(cam_vals if kind == "f" else pt_vals)
    dat_planes = [dat_ref[i] for i in range(P_dat)]

    rjets = emit_raw(xin_planes, dat_planes, jnp.zeros_like(mask))
    if loss is not None:
        rjets = _correct_jets(list(rjets), loss, mask > 0.5)

    rvals, rcols = [], []
    for jet in rjets:
        v, cols = _jet_planes(jet, mask, nt)
        rvals.append(v)
        rcols.append(cols)

    # ---- E^T E, g_e (sum over r and k), Jacobi scale ----
    cn = [None] * te
    for a in range(te):
        ca = [rcols[r][eo + a] for r in range(R)]
        g = None
        for r in range(R):
            if ca[r] is None:
                continue
            term = ca[r] * rvals[r]
            g = term if g is None else g + term
        ge_ref[a, :] = (jnp.zeros_like(mask) if g is None else g
                        ).sum(axis=0)
        for b in range(a, te):
            cb = [rcols[r][eo + b] for r in range(R)]
            acc = None
            for r in range(R):
                if ca[r] is None or cb[r] is None:
                    continue
                term = ca[r] * cb[r]
                acc = term if acc is None else acc + term
            plane = (jnp.zeros_like(mask) if acc is None else acc
                     ).sum(axis=0)
            ete_ref[a * te + b, :] = plane
            if b != a:
                ete_ref[b * te + a, :] = plane
            else:
                cn[a] = plane

    se = []
    for a in range(te):
        if not use_scaling:
            s = jnp.ones_like(cn[a])
        else:
            derived = 1.0 / (1.0 + jnp.sqrt(cn[a]))
            s = jnp.where(first_ref[0] > 0.5, derived, se_ref[a, :])
        se.append(s)
        seo_ref[a, :] = s

    # ---- A_e^T ----
    zero = jnp.zeros_like(mask[0])
    ge_planes = {}
    for a in range(te):
        for t in range(tf):
            acc = None
            for r in range(R):
                pa = rcols[r][eo + a]
                pf = rcols[r][fo + t]
                if pa is None or pf is None:
                    continue
                term = pa * pf
                acc = term if acc is None else acc + term
            ge_planes[(a, t)] = acc
    for c in range(kf):
        ohc = oh_ref[c]
        for a in range(te):
            for t in range(tf):
                gp = ge_planes[(a, t)]
                if gp is None:
                    a_ref[a, c * tf + t, :] = zero
                    continue
                a_ref[a, c * tf + t, :] = (gp * ohc).sum(axis=0) * se[a]

    # ---- F^T F block diagonal + f gradient (MXU fold, grid-accum) ----
    _fold_ftf_gf_mxu(oh_ref, rcols, rvals, ftf_ref, gf_ref, mask,
                     tf=tf, kf=kf, k=k, fo=fo, R=R)




# ----------------------------------------------------------------------
# ELIM kernel

def _elim_kernel(a_ref, inv_ref, z_ref, scorr_ref, rhsa_ref, *, te, nf):
    """One e-block tile of the damped elimination:
      a   [te, nf, T]   E-scaled cross tensor A_e^T (lin kernel output)
      inv [te*te, T]    inv(E_s^T E_s + D^2) planes (row-major)
      z   [te, T]       inv * b_e planes
    accumulates (constant out index maps):
      scorr [nf, nf]    sum_n A_n^T inv_n A_n   (f-unscaled congruence)
      rhsa  [nf, 1]     sum_n A_n^T z_n
    The S_corr contraction runs as te MXU dots [nf, T] x [T, nf] per
    tile; A is read from HBM exactly once per damped solve and the
    [te, nf, ne] Y tensor of the XLA path is never materialized.
    """
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _init():
        scorr_ref[...] = jnp.zeros_like(scorr_ref)
        rhsa_ref[...] = jnp.zeros_like(rhsa_ref)

    A = [a_ref[u] for u in range(te)]                  # [nf, T] each
    sc = None
    rh = None
    for u in range(te):
        Yu = None
        for v in range(te):
            term = A[v] * inv_ref[u * te + v, :][None, :]
            Yu = term if Yu is None else Yu + term
        d = jax.lax.dot_general(A[u], Yu, (((1,), (1,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
        sc = d if sc is None else sc + d
        r = jnp.sum(A[u] * z_ref[u, :][None, :], axis=1, keepdims=True)
        rh = r if rh is None else rh + r
    scorr_ref[...] += sc
    rhsa_ref[...] += rh


def _elim2_kernel(a_ref, etes_ref, gse_ref, diag_ref, rad_ref,
                  scorr_ref, rhsa_ref, inv_ref, z_ref, *, te, nf):
    """ELIM v2: the damped elimination WITH the per-point damping,
    closed-form SPD inverse (te <= 3), and z = inv b_e computed
    IN-KERNEL from the scaled Gram planes — removing the ~20-op XLA
    small-tensor chain (EtE_d build, cofactor inverse, z einsum, two
    plane transposes) that ran between the LIN and ELIM kernels on
    every damped solve.

      a    [te, nf, T]   E-scaled cross planes (lin kernel output)
      etes [te*te, T]    SCALED E-side Gram planes (s_e EtE s_e)
      gse  [te, T]       SCALED e gradient planes (g_e * s_e)
      diag [te, T]       clipped scaled diagonal (LM damping source)
      rad  [1] SMEM      trust-region radius (f32)
    outs:
      scorr [nf, nf], rhsa [nf, 1]   (grid-accumulated)
      inv   [te*te, T]   damped inverse planes (for the back-sub)
      z     [te, T]      inv * b_e planes
    """
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _init():
        scorr_ref[...] = jnp.zeros_like(scorr_ref)
        rhsa_ref[...] = jnp.zeros_like(rhsa_ref)

    rad = rad_ref[0]
    m = {}
    for a in range(te):
        for b in range(a, te):
            v = etes_ref[a * te + b, :]
            if a == b:
                v = v + diag_ref[a, :] / rad
            m[(a, b)] = v

    if te == 1:
        inv = {(0, 0): 1.0 / m[(0, 0)]}
    elif te == 2:
        det = m[(0, 0)] * m[(1, 1)] - m[(0, 1)] * m[(0, 1)]
        invdet = 1.0 / det
        inv = {(0, 0): m[(1, 1)] * invdet,
               (0, 1): -m[(0, 1)] * invdet,
               (1, 1): m[(0, 0)] * invdet}
    else:
        a_, b_, c_ = m[(0, 0)], m[(0, 1)], m[(0, 2)]
        d_, e_, f_ = m[(1, 1)], m[(1, 2)], m[(2, 2)]
        co00 = d_ * f_ - e_ * e_
        co01 = c_ * e_ - b_ * f_
        co02 = b_ * e_ - c_ * d_
        co11 = a_ * f_ - c_ * c_
        co12 = b_ * c_ - a_ * e_
        co22 = a_ * d_ - b_ * b_
        det = a_ * co00 + b_ * co01 + c_ * co02
        invdet = 1.0 / det
        inv = {(0, 0): co00 * invdet, (0, 1): co01 * invdet,
               (0, 2): co02 * invdet, (1, 1): co11 * invdet,
               (1, 2): co12 * invdet, (2, 2): co22 * invdet}

    def ie(i, j):
        return inv[(i, j) if i <= j else (j, i)]

    inv_ref[...] = jnp.stack([ie(i, j) for i in range(te)
                              for j in range(te)])
    z_rows = []
    for i in range(te):
        acc = None
        for j in range(te):
            t = ie(i, j) * (-gse_ref[j, :])
            acc = t if acc is None else acc + t
        z_rows.append(acc)
    z_ref[...] = jnp.stack(z_rows)

    A = [a_ref[u] for u in range(te)]
    sc = None
    rh = None
    for u in range(te):
        Yu = None
        for v in range(te):
            term = A[v] * ie(u, v)[None, :]
            Yu = term if Yu is None else Yu + term
        d = jax.lax.dot_general(A[u], Yu, (((1,), (1,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
        sc = d if sc is None else sc + d
        r = jnp.sum(A[u] * z_rows[u][None, :], axis=1, keepdims=True)
        rh = r if rh is None else rh + r
    scorr_ref[...] += sc
    rhsa_ref[...] += rh


def pallas_lin_supported(program, options, meta, explicit: bool,
                         mixed: bool, f64_rhs: bool) -> bool:
    """Structural gate for the Snavely lin-phase kernel."""
    if os.environ.get("CERES_TPU_NO_PALLAS") or \
            os.environ.get("CERES_TPU_NO_PALLAS_LIN"):
        return False
    interp = bool(os.environ.get("CERES_TPU_PALLAS_INTERPRET"))
    if jax.default_backend() == "cpu" and not interp:
        return False
    if not (explicit and mixed and not f64_rhs):
        return False
    if len(program.buckets) != 1 or len(meta.buckets) != 1:
        return False
    bk, bs = program.buckets[0], meta.buckets[0]
    if bs.e_slot is None or bs.f_cols is None or bs.chunk_rows is None:
        return False
    # Uniform-scalar robust losses run inside the kernel (the Triggs
    # corrector is plane math); per-row stacked loss parameters
    # (loss_attrs) would need chunk-layout attr planes — not yet.
    if getattr(bk, "loss_attrs", None) or getattr(bk, "loss_attr_consts",
                                                  None):
        return False
    if bk.jac_mode != "ad":
        return False
    slots = [sl for sl in bk.slots if sl.variable]
    if len(slots) != 2 or any(sl.manifold is not None for sl in slots):
        return False
    grp = meta.f_groups[0]
    kf_cap = int(os.environ.get("CERES_TPU_PLIN_MAX_KF", "64"))
    if grp["kf"] > kf_cap:     # VPU A-assembly cost grows linearly in kf
        return False
    from ..solvers.schur_fused import _slab_of
    if _slab_of(meta.e_cols) is None:
        return False
    fpos = meta.f_global_cols[grp["cols"]].reshape(grp["kf"], grp["t"])
    if _slab_of(fpos) is None:
        return False
    if _is_snavely(bk):
        # hand-vectorized jet chain (the tuned hot shape)
        if grp["t"] != 9 or meta.te != 3 or bk.r != 2:
            return False
        if not isinstance(bk.data, dict) or \
                set(bk.data.keys()) != {"observed_x", "observed_y"}:
            return False
        return True
    # AUTO path: any traceable functor (autojet), folded epilogue shared
    # with the hand kernel. Caps keep the unrolled channel loops and the
    # A_e tile within Mosaic-friendly sizes.
    from .jet_compile import autojet_enabled, make_auto_spec
    if os.environ.get("CERES_TPU_NO_AUTOLIN") or not autojet_enabled():
        return False
    if meta.te > 6 or grp["t"] > 12 or bk.r > 8:
        return False
    return make_auto_spec(program, bk) is not None


def _is_snavely(bk) -> bool:
    if os.environ.get("CERES_TPU_AUTOLIN_FORCE"):
        return False        # A/B knob: run Snavely through the auto path
    try:
        from ..examples.snavely import SnavelyReprojectionError
        return type(bk.cost.functor) is SnavelyReprojectionError
    except Exception:
        return False


# Mosaic probe-compile results per kernel shape (process-wide): the same
# shape never pays a second probe, and a rejected shape never re-probes.
_PROBE_CACHE: dict = {}


def _probe(tag, call, probe_args, shape_key):
    """Probe-compile a pallas_call through the real Mosaic backend ONCE
    per shape (a front-end that traces fine can still be rejected by the
    TPU kernel compiler), with disk-backed results (utils/probecache) so
    warm starts skip the probe compile."""
    key = (tag,) + tuple(shape_key)
    ok = _PROBE_CACHE.get(key)
    if ok is None:
        from ..utils import probecache
        ok = probecache.get(key)
    if ok is None:
        probe_err = None
        try:
            jax.jit(call).lower(*probe_args).compile()
            ok = True
        except Exception as e:
            import sys
            print(f"ceres_tpu: pallas '{tag}' kernel rejected by the "
                  f"TPU kernel compiler ({type(e).__name__}); using "
                  "the XLA fallback", file=sys.stderr)
            if os.environ.get("CERES_TPU_PALLAS_DEBUG"):
                import traceback
                traceback.print_exc()
            ok = False
            probe_err = e
        from ..utils import probecache
        probecache.put(key, ok,
                       transient=(not ok and probe_err is not None
                                  and probecache.is_transient_error(
                                      probe_err)))
    _PROBE_CACHE[key] = ok
    return ok


class _PallasLin:
    """Callable bundle: .lin(x, s_e, first), .elim(A_eT, inv, z), and
    .elim2(A_eT, etes_t, gse_t, diag_t, rad) (each None when the Mosaic
    compiler rejected that kernel — the caller keeps the corresponding
    XLA path)."""

    def __init__(self, lin, elim, ne_pad, elim2=None):
        self.lin = lin
        self.elim = elim
        self.elim2 = elim2
        self.ne_pad = ne_pad


def make_pallas_lin(program, options, meta, tile: int = 512):
    """Returns a _PallasLin bundle, or None when the kernels cannot fit
    VMEM at any tile width or the Mosaic compiler rejects the LIN kernel
    (probed at build time so BOTH the fused and host-loop paths fall
    back to the generic lin phase cleanly).

    lin(x, s_e [ne_pad, te] f32, first bool-or-None) -> dict with keys
      EtE [ne_pad, te, te], g_e [ne_pad, te], s_e [ne_pad, te]
      (resolved), A_eT [te, kf*tf, ne_pad] (E-SCALED, f-unscaled),
      FtF [kf, tf, tf], g_f [kf, tf], ne_pad — all f32 UNSCALED except
      A_eT's e factor; pad rows zero (s_e pad rows 1).
    elim(A_eT, inv_t [te*te, ne_pad], z_t [te, ne_pad])
      -> (scorr [nf, nf], rhsa [nf]) f32, f-unscaled."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..solvers.schur_fused import _slab_of

    bk, bs = program.buckets[0], meta.buckets[0]
    grp = meta.f_groups[0]
    kf, tf, te, ne = grp["kf"], grp["t"], meta.te, meta.ne
    nf = kf * tf
    k = bs.chunk_rows.shape[1]
    e_slab = _slab_of(meta.e_cols)
    fpos = meta.f_global_cols[grp["cols"]].reshape(kf, tf)
    f_slab = _slab_of(fpos)

    hand = _is_snavely(bk)
    spec = None
    P_dat = 0
    if not hand:
        from .jet_compile import make_auto_spec
        spec = make_auto_spec(program, bk)
        if spec is None:
            return None
        P_dat = max(1, sum(spec["data_widths"]))

    # VMEM fit: per-lane bytes across all blocks (in/out refs) plus a
    # generous allowance for the live jet planes the kernel body keeps
    # (~40 [k, tile] planes through the unrolled channel loops; the auto
    # chain keeps more live values, so its allowance is doubled). Shrink
    # the tile until the estimate fits a conservative VMEM budget; give
    # up below the minimum lane tile.
    per_lane = 4 * (kf * k                 # oh
                    + 4 * k                # mask/obsx/obsy + headroom
                    + 4 * te + te * te     # ge/se in+out/xe, ete
                    + te * kf * tf         # A_e^T
                    + P_dat * k            # auto data planes
                    + (tf * (tf + 1) // 2 + tf + 8) * k  # MXU-fold Q stack
                    + (80 if not hand else 40) * k)   # jet working set
    # 4 MB budget against the 16 MB scoped-vmem limit: Mosaic
    # double-buffers the in/out blocks across grid steps, so the live
    # footprint is ~2x the block estimate plus the fold/jet working set
    # (a 64-camera problem OOM'd the compiler at the old 6 MB budget —
    # hw_r5/ba_scaling_mid.log).
    budget = 4 * 1024 * 1024
    tile = min(tile, max(128, 1 << (ne - 1).bit_length()))
    while tile > 128 and per_lane * tile > budget:
        tile //= 2
    if per_lane * tile > 2 * budget:
        return None
    ne_pad = int(math.ceil(ne / tile) * tile)
    grid = ne_pad // tile

    # variable-slot column offsets in the concatenated tangent layout
    # (bs.e_slot / f_si index VARIABLE slots, schur_fused bucket_plan)
    voffs, off = [], 0
    for sl in bk.slots:
        if sl.variable:
            voffs.append(off)
            off += sl.tangent_size
    (_, f_si, local) = [s for s in grp["slots"] if s[0] == 0][0]
    eo = voffs[bs.e_slot]
    fo = voffs[f_si]

    # ---- host-side consts (chunked, transposed, padded) ----
    rows, cmask = bs.chunk_rows, bs.chunk_mask

    def chunk_t(a, pad_value=0.0):
        a = np.asarray(a, np.float32)
        out = a[rows.reshape(-1)].reshape(ne, k)
        out = out * cmask
        out = np.concatenate(
            [out, np.full((ne_pad - ne, k), pad_value, np.float32)], axis=0)
        return np.ascontiguousarray(out.T)              # [k, ne_pad]

    mask_t = np.concatenate(
        [cmask.astype(np.float32),
         np.zeros((ne_pad - ne, k), np.float32)], axis=0).T
    loc_chunk = np.asarray(local)[rows.reshape(-1)].reshape(ne, k)
    interp = bool(os.environ.get("CERES_TPU_PALLAS_INTERPRET"))
    loss = program._bucket_loss(bk)     # uniform scalars (gate) or None
    use_scaling = bool(options.jacobi_scaling)
    if hand:
        obsx_t = chunk_t(bk.data["observed_x"])
        obsy_t = chunk_t(bk.data["observed_y"])
        oh_np = (loc_chunk[None, :, :] == np.arange(kf)[:, None, None]
                 ).astype(np.float32) * cmask[None, :, :]
        oh_t = np.concatenate(
            [oh_np, np.zeros((kf, ne_pad - ne, k), np.float32)],
            axis=1).transpose(0, 2, 1)                  # [kf, k, ne_pad]
        kern = functools.partial(_lin_kernel, te=te, tf=tf, kf=kf, k=k,
                                 eo=eo, fo=fo, loss=loss,
                                 use_scaling=use_scaling)
    else:
        # Lane-SAFE fills: masked lanes carry the block's first valid
        # row's data/camera (finite generic jet chains; contributions
        # are zeroed by the masked epilogue planes), pad e-blocks carry
        # row 0's.
        first_lane = np.argmax(cmask > 0, axis=1)       # [ne]
        rowsel = np.arange(ne)

        def chunk_safe(col):
            g = np.asarray(col, np.float32)[
                rows.reshape(-1)].reshape(ne, k)
            fill = g[rowsel, first_lane]
            out = np.where(cmask > 0, g, fill[:, None])
            return np.concatenate(
                [out, np.tile(out[:1], (ne_pad - ne, 1))], axis=0).T

        parts = spec["data_parts"](bk)                  # [n, w] arrays
        dat_cols = [chunk_safe(p[:, i])
                    for p in parts for i in range(p.shape[1])]
        if not dat_cols:
            dat_cols = [np.zeros((k, ne_pad), np.float32)]
        dat_t = np.ascontiguousarray(np.stack(dat_cols))  # [P_dat,k,ne_pad]
        loc_fill = loc_chunk[rowsel, first_lane]
        loc_safe = np.where(cmask > 0, loc_chunk, loc_fill[:, None])
        loc_safe = np.concatenate(
            [loc_safe, np.tile(loc_safe[:1], (ne_pad - ne, 1))], axis=0)
        oh_t = np.ascontiguousarray(
            (loc_safe[None, :, :] == np.arange(kf)[:, None, None]
             ).astype(np.float32).transpose(0, 2, 1))   # [kf, k, ne_pad]
        R = bk.r
        slot_order = []
        var_si = -1
        for sl in bk.slots:
            if sl.variable:
                var_si += 1
                slot_order.append(("e" if var_si == bs.e_slot else "f",
                                   sl.amb_size))
        kern = functools.partial(_lin_kernel_auto, te=te, tf=tf, kf=kf,
                                 k=k, eo=eo, fo=fo, R=R, P_dat=P_dat,
                                 slot_order=tuple(slot_order),
                                 emit_raw=spec["emit_raw"], loss=loss,
                                 use_scaling=use_scaling)

    bspec = lambda shape, imap: pl.BlockSpec(shape, imap,
                                             memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.SMEM)
    accspec = lambda shape: pl.BlockSpec(shape,
                                         lambda i: (0,) * len(shape),
                                         memory_space=pltpu.VMEM)
    if hand:
        data_specs = [
            bspec((k, tile), lambda i: (0, i)),             # obsx
            bspec((k, tile), lambda i: (0, i)),             # obsy
        ]
    else:
        data_specs = [
            bspec((P_dat, k, tile), lambda i: (0, 0, i)),   # data planes
        ]
    raw_lin = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            smem((kf * tf,)),                               # xf
            bspec((te, tile), lambda i: (0, i)),            # xe
            bspec((kf, k, tile), lambda i: (0, 0, i)),      # oh
            bspec((k, tile), lambda i: (0, i)),             # mask
            *data_specs,
            bspec((te, tile), lambda i: (0, i)),            # se carried
            smem((1,)),                                     # first flag
        ],
        out_specs=[
            bspec((te * te, tile), lambda i: (0, i)),       # ete
            bspec((te, tile), lambda i: (0, i)),            # ge
            bspec((te, tile), lambda i: (0, i)),            # se out
            bspec((te, kf * tf, tile), lambda i: (0, 0, i)),  # A_e^T
            accspec((kf, tf * tf)),                         # FtF
            accspec((kf, tf)),                              # g_f
        ],
        out_shape=[
            jax.ShapeDtypeStruct((te * te, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((te, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((te, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((te, kf * tf, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((kf, tf * tf), jnp.float32),
            jax.ShapeDtypeStruct((kf, tf), jnp.float32),
        ],
        interpret=interp,
    )

    ekern = functools.partial(_elim_kernel, te=te, nf=nf)
    raw_elim = pl.pallas_call(
        ekern,
        grid=(grid,),
        in_specs=[
            bspec((te, nf, tile), lambda i: (0, 0, i)),     # A_e^T
            bspec((te * te, tile), lambda i: (0, i)),       # inv planes
            bspec((te, tile), lambda i: (0, i)),            # z planes
        ],
        out_specs=[
            accspec((nf, nf)),
            accspec((nf, 1)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nf, nf), jnp.float32),
            jax.ShapeDtypeStruct((nf, 1), jnp.float32),
        ],
        interpret=interp,
    )

    e2kern = functools.partial(_elim2_kernel, te=te, nf=nf)
    raw_elim2 = pl.pallas_call(
        e2kern,
        grid=(grid,),
        in_specs=[
            bspec((te, nf, tile), lambda i: (0, 0, i)),     # A_e^T
            bspec((te * te, tile), lambda i: (0, i)),       # EtE_s planes
            bspec((te, tile), lambda i: (0, i)),            # g_se planes
            bspec((te, tile), lambda i: (0, i)),            # diag planes
            smem((1,)),                                     # radius
        ],
        out_specs=[
            accspec((nf, nf)),
            accspec((nf, 1)),
            bspec((te * te, tile), lambda i: (0, i)),       # inv planes
            bspec((te, tile), lambda i: (0, i)),            # z planes
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nf, nf), jnp.float32),
            jax.ShapeDtypeStruct((nf, 1), jnp.float32),
            jax.ShapeDtypeStruct((te * te, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((te, ne_pad), jnp.float32),
        ],
        interpret=interp,
    )

    def lin_call(*a):
        # Trace the pallas_call with x64 scoped OFF: under jax_enable_x64
        # the pallas grid/index-map plumbing emits i64 scalars the Mosaic
        # TPU compiler cannot legalize ("failed to legalize operation
        # 'func.return'" on an i64). The kernel itself is pure f32, so
        # scoping x64 off around the bind changes nothing numerically;
        # the surrounding f64 solve is untouched.
        with jax.enable_x64(False):
            return raw_lin(*a)

    def elim_call(*a):
        with jax.enable_x64(False):
            return raw_elim(*a)

    loss_key = (None if loss is None else
                (type(loss).__name__,
                 tuple(sorted(vars(loss).items()))))
    if hand:
        probe_tag = "plin2"
        shape_key = (te, tf, kf, k, tile, ne_pad, loss_key, use_scaling,
                     jax.default_backend())
        data_probe = [jax.ShapeDtypeStruct((k, ne_pad), jnp.float32),
                      jax.ShapeDtypeStruct((k, ne_pad), jnp.float32)]
    else:
        probe_tag = "plin-auto"
        shape_key = (te, tf, kf, k, tile, ne_pad, loss_key, use_scaling,
                     spec.get("digest", ""), bk.r, P_dat,
                     jax.default_backend())
        data_probe = [jax.ShapeDtypeStruct((P_dat, k, ne_pad),
                                           jnp.float32)]
    if not interp:
        probe_lin = [
            jax.ShapeDtypeStruct((kf * tf,), jnp.float32),
            jax.ShapeDtypeStruct((te, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((kf, k, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((k, ne_pad), jnp.float32),
            *data_probe,
            jax.ShapeDtypeStruct((te, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ]
        if not _probe(probe_tag, lin_call, probe_lin, shape_key):
            return None
    elif not hand:
        # Interpret mode: no Mosaic probe runs, but emit-time failures
        # (_Unsupported from the jet interpreter on primitives the
        # name-only validator admits) would crash the solve trace —
        # dry-run the kernel trace and decline (mirror of
        # pallas_linearize's interp-mode probe contract).
        try:
            probe_lin = [
                jax.ShapeDtypeStruct((kf * tf,), jnp.float32),
                jax.ShapeDtypeStruct((te, ne_pad), jnp.float32),
                jax.ShapeDtypeStruct((kf, k, ne_pad), jnp.float32),
                jax.ShapeDtypeStruct((k, ne_pad), jnp.float32),
                *data_probe,
                jax.ShapeDtypeStruct((te, ne_pad), jnp.float32),
                jax.ShapeDtypeStruct((1,), jnp.float32),
            ]
            jax.eval_shape(lin_call, *probe_lin)
        except Exception:
            return None

    program.register_const("plin.mask_t", np.ascontiguousarray(mask_t))
    if hand:
        program.register_const("plin.obsx_t", obsx_t)
        program.register_const("plin.obsy_t", obsy_t)
        program.register_const("plin.oh_t", np.ascontiguousarray(oh_t))
    else:
        program.register_const("plin.auto.dat_t", dat_t)
        program.register_const("plin.auto.oh_t", oh_t)

    def lin(x, s_e, first):
        xe = jax.lax.dynamic_slice(x, (e_slab,), (ne * te,)
                                   ).astype(jnp.float32)
        # pad e-blocks (ne..ne_pad) are all-masked rows; the kernel's
        # valid-lane divisor guard keeps their chain finite.
        xe_t = jnp.pad(xe.reshape(ne, te).T, ((0, 0), (0, ne_pad - ne)),
                       mode="edge" if not hand else "constant")
        xf = jax.lax.dynamic_slice(x, (f_slab,), (kf * tf,)
                                   ).astype(jnp.float32)
        se_t = jnp.asarray(s_e, jnp.float32).T           # [te, ne_pad]
        if first is None:
            first_f = jnp.zeros((1,), jnp.float32)
        else:
            first_f = jnp.where(first, 1.0, 0.0).astype(
                jnp.float32).reshape(1)
        if hand:
            data_args = (program.const("plin.obsx_t"),
                         program.const("plin.obsy_t"))
            oh_arg = program.const("plin.oh_t")
        else:
            data_args = (program.const("plin.auto.dat_t"),)
            oh_arg = program.const("plin.auto.oh_t")
        ete_t, ge_t, se_o, a_t, ftf, gf = lin_call(
            xf, xe_t, oh_arg, program.const("plin.mask_t"),
            *data_args, se_t, first_f)
        return {
            "EtE": ete_t.T.reshape(ne_pad, te, te),
            "g_e": ge_t.T,
            "s_e": se_o.T,
            "A_eT": a_t,                 # [te, kf*tf, ne_pad], e-scaled
            "FtF": ftf.reshape(kf, tf, tf),
            "g_f": gf,
            "ne_pad": ne_pad,
            # raw plane forms (no transposes) for the elim2 solve tail
            "ete_t": ete_t,
            "ge_t": ge_t,
            "se_t": se_o,
        }

    def elim(a_t, inv_t, z_t):
        scorr, rhsa = elim_call(a_t.astype(jnp.float32),
                                inv_t.astype(jnp.float32),
                                z_t.astype(jnp.float32))
        return scorr, rhsa[:, 0]

    def elim2_call(*a):
        with jax.enable_x64(False):
            return raw_elim2(*a)

    def elim2(a_t, etes_t, gse_t, diag_t, rad):
        scorr, rhsa, inv_t, z_t = elim2_call(
            a_t.astype(jnp.float32), etes_t.astype(jnp.float32),
            gse_t.astype(jnp.float32), diag_t.astype(jnp.float32),
            rad.astype(jnp.float32).reshape(1))
        return scorr, rhsa[:, 0], inv_t, z_t

    have_elim = True
    have_elim2 = te <= 3
    if not interp:
        probe_elim = [
            jax.ShapeDtypeStruct((te, nf, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((te * te, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((te, ne_pad), jnp.float32),
        ]
        have_elim = _probe("pelim", elim_call, probe_elim,
                           (te, nf, tile, ne_pad,
                            jax.default_backend()))
        if have_elim2:
            probe_elim2 = [
                jax.ShapeDtypeStruct((te, nf, ne_pad), jnp.float32),
                jax.ShapeDtypeStruct((te * te, ne_pad), jnp.float32),
                jax.ShapeDtypeStruct((te, ne_pad), jnp.float32),
                jax.ShapeDtypeStruct((te, ne_pad), jnp.float32),
                jax.ShapeDtypeStruct((1,), jnp.float32),
            ]
            have_elim2 = _probe("pelim2", elim2_call, probe_elim2,
                                (te, nf, tile, ne_pad,
                                 jax.default_backend()))

    return _PallasLin(lin, elim if have_elim else None, ne_pad,
                      elim2=elim2 if have_elim2 else None)
