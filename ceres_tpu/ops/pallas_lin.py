"""Pallas lin-phase front-end for the fused Schur eliminator.

One TPU kernel computes, per e-block tile, everything the fused
eliminator's linearization phase needs for the Snavely bundle-adjustment
family: the per-row residuals and Jacobians (hand-vectorized sparse
forward-mode "jets" — the reference's Jet<double, 12> design,
autodiff_cost_function.h:156 + jet.h, laid out rows-on-lanes for the
VPU), the per-point Gram blocks E^T E and gradient, and the scaled cross
tensor A = E_s^T F_s — without ever materializing the row Jacobian in
observation order or running XLA's narrow-shaped jvp fusions.

Layout: rows live chunk-grouped [ne, k] (k = chunk width); every per-row
quantity in the kernel is a PLANE [k, TILE] — k on sublanes, e-blocks on
lanes — so all jet arithmetic runs at full VPU lane width. Channel axes
(residual r, tangent t) are unrolled in Python.

The F-side reductions (F^T F block diagonal, f gradient) stay OUTSIDE
the kernel as the measured-fast one-hot matmuls over the kernel's
chunk-layout Jf output (solvers/schur_fused.py); the kernel's job is the
jacfwd chains and the point-indexed tensors.

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
# Sparse forward-mode jets on [k, T] planes.
#
# A jet is (value, {channel: partial}) where missing channels are
# structurally zero — the chain starts with one nonzero partial per
# parameter and sparsity decays naturally, so early rotation math costs
# ~4 active channels instead of 12.

class _Jet:
    __slots__ = ("v", "d")

    def __init__(self, v, d=None):
        self.v = v
        self.d = d if d is not None else {}


def _jc(v):
    return _Jet(v, {})


def _jvar(v, ch):
    return _Jet(v, {ch: None})     # None partial == exactly 1.0 (seed)


def _p(x):
    """Resolve a stored partial (None means the 1.0 seed)."""
    return 1.0 if x is None else x


def _jadd(a, b):
    d = dict(a.d)
    for c, p in b.d.items():
        d[c] = _p(p) if c not in d else _p(d[c]) + _p(p)
    return _Jet(a.v + b.v, d)


def _jsub(a, b):
    d = {c: _p(p) for c, p in a.d.items()}
    for c, p in b.d.items():
        d[c] = -_p(p) if c not in d else d[c] - _p(p)
    return _Jet(a.v - b.v, d)


def _jneg(a):
    return _Jet(-a.v, {c: -_p(p) for c, p in a.d.items()})


def _jmul(a, b):
    d = {c: _p(p) * b.v for c, p in a.d.items()}
    for c, p in b.d.items():
        d[c] = _p(p) * a.v if c not in d else d[c] + _p(p) * a.v
    return _Jet(a.v * b.v, d)


def _jscale(a, s):
    """a * s for a plain scalar/plane s (no partials)."""
    return _Jet(a.v * s, {c: _p(p) * s for c, p in a.d.items()})


def _jshift(a, s):
    """a + s for a plain scalar/plane s."""
    return _Jet(a.v + s, dict(a.d))


def _jdiv(a, b):
    inv = 1.0 / b.v
    v = a.v * inv
    d = {c: _p(p) * inv for c, p in a.d.items()}
    w = v * inv                       # a / b^2
    for c, p in b.d.items():
        d[c] = -_p(p) * w if c not in d else d[c] - _p(p) * w
    return _Jet(v, d)


def _jsqrt(a):
    v = jnp.sqrt(a.v)
    half_inv = 0.5 / v
    return _Jet(v, {c: _p(p) * half_inv for c, p in a.d.items()})


def _jsincos(a):
    s, c0 = jnp.sin(a.v), jnp.cos(a.v)
    js = _Jet(s, {c: _p(p) * c0 for c, p in a.d.items()})
    jc = _Jet(c0, {c: -_p(p) * s for c, p in a.d.items()})
    return js, jc


def _jwhere(cond, a, b):
    d = {}
    for c in set(a.d) | set(b.d):
        pa = _p(a.d[c]) if c in a.d else jnp.float32(0.0)
        pb = _p(b.d[c]) if c in b.d else jnp.float32(0.0)
        d[c] = jnp.where(cond, pa, pb)
    return _Jet(jnp.where(cond, a.v, b.v), d)


def _jdot3(a, b):
    return _jadd(_jadd(_jmul(a[0], b[0]), _jmul(a[1], b[1])),
                 _jmul(a[2], b[2]))


def _jcross(a, b):
    return [
        _jsub(_jmul(a[1], b[2]), _jmul(a[2], b[1])),
        _jsub(_jmul(a[2], b[0]), _jmul(a[0], b[2])),
        _jsub(_jmul(a[0], b[1]), _jmul(a[1], b[0])),
    ]


def _aa_rotate_jets(aa, pt):
    """Rodrigues rotation with jets — mirrors rotation.py
    angle_axis_rotate_point (reference rotation.h:288) including the
    small-angle branch."""
    theta_sq = _jdot3(aa, aa)
    small = theta_sq.v < 1e-6             # rotation.py _small (f32)
    safe_tsq = _Jet(jnp.where(small, 1.0, theta_sq.v), theta_sq.d)
    theta = _jsqrt(safe_tsq)
    sin_t, cos_t = _jsincos(theta)
    inv_theta = _jdiv(_jc(jnp.float32(1.0)), theta)
    w = [_jmul(aa[i], inv_theta) for i in range(3)]
    w_cross_pt = _jcross(w, pt)
    w_dot_pt = _jdot3(w, pt)
    one_minus_cos = _jsub(_jc(jnp.float32(1.0)), cos_t)
    large = [
        _jadd(_jadd(_jmul(pt[i], cos_t), _jmul(w_cross_pt[i], sin_t)),
              _jmul(_jmul(w[i], w_dot_pt), one_minus_cos))
        for i in range(3)
    ]
    aa_cross_pt = _jcross(aa, pt)
    small_res = [_jadd(pt[i], aa_cross_pt[i]) for i in range(3)]
    return [_jwhere(small, small_res[i], large[i]) for i in range(3)]


def _snavely_residual_jets(cam, pt, obs_x, obs_y, valid):
    """Snavely 9-param reprojection with jets (examples/snavely.py;
    reference snavely_reprojection_error.h:53). cam/pt: lists of jets;
    obs: plain planes; valid: bool plane — inactive (masked/pad) lanes
    get a benign z=1 divisor so their garbage stays FINITE (NaN would
    survive the output mask: NaN*0=NaN and poison the lane reductions).
    Active lanes keep the true divisor: a genuinely degenerate
    observation must still produce non-finite values so the solver's
    invalid-step handling sees it (residual_block_utils.h:64 role).
    Returns (rx, ry) jets."""
    p = _aa_rotate_jets(cam[0:3], pt)
    p = [_jadd(p[i], cam[3 + i]) for i in range(3)]
    z = _jwhere(valid, p[2], _jc(jnp.float32(1.0)))
    xp = _jneg(_jdiv(p[0], z))
    yp = _jneg(_jdiv(p[1], z))
    r2 = _jadd(_jmul(xp, xp), _jmul(yp, yp))
    distortion = _jshift(_jmul(r2, _jadd(cam[7], _jmul(cam[8], r2))),
                         jnp.float32(1.0))
    fd = _jmul(cam[6], distortion)
    rx = _jshift(_jmul(fd, xp), -obs_x)
    ry = _jshift(_jmul(fd, yp), -obs_y)
    return rx, ry


def _correct_jets(jets, loss, valid):
    """Triggs robust-loss correction of one residual block's jets
    (loss.py correct_residuals_and_jacobian / reference corrector.cc on
    [k, T] planes): r~ = residual_scaling * r,
    J~ = sqrt(rho') (J - (alpha/||r||^2) r r^T J). The r r^T J term
    creates channel fill-in (a row gains every channel any row has).
    Inactive lanes get sq=0 (the simple branch) so pathological loss
    curvature never produces non-finite values that would survive the
    output mask."""
    sq = None
    for j in jets:
        t = j.v * j.v
        sq = t if sq is None else sq + t
    sq = jnp.where(valid, sq, 0.0)
    _, rho1, rho2 = loss.evaluate(sq)
    sqrt_rho1 = jnp.sqrt(jnp.maximum(rho1, 0.0))
    simple = (sq == 0.0) | (rho2 <= 0.0)
    safe_sq = jnp.where(sq == 0.0, 1.0, sq)
    safe_rho1 = jnp.where(rho1 == 0.0, 1.0, rho1)
    D = 1.0 + 2.0 * sq * rho2 / safe_rho1
    alpha = 1.0 - jnp.sqrt(jnp.maximum(D, 0.0))
    rs = jnp.where(simple, sqrt_rho1, sqrt_rho1 / (1.0 - alpha))
    asn = jnp.where(simple, 0.0, alpha / safe_sq)

    chans = set()
    for j in jets:
        chans |= set(j.d)
    rtj = {}
    for c in chans:
        acc = None
        for j in jets:
            if c in j.d:
                t = j.v * _p(j.d[c])
                acc = t if acc is None else acc + t
        rtj[c] = acc
    out = []
    for j in jets:
        d = {}
        for c in chans:
            corr = asn * j.v * rtj[c]
            if c in j.d:
                d[c] = sqrt_rho1 * (_p(j.d[c]) - corr)
            else:
                d[c] = -sqrt_rho1 * corr
        out.append(_Jet(j.v * rs, d))
    return out


def _jet_planes(jet, mask, nt):
    """Dense [nt] list of masked partial planes + masked value plane."""
    cols = []
    for c in range(nt):
        if c in jet.d:
            cols.append(_p(jet.d[c]) * mask)
        else:
            cols.append(None)
    return jet.v * mask, cols


# ----------------------------------------------------------------------
# Kernel

def _lin_kernel(xf_ref, xe_ref, oh_ref, mask_ref,
                obsx_ref, obsy_ref,
                ete_ref, ge_ref, a_ref, jf_ref, rc_ref,
                *, te, tf, kf, k, eo, fo, loss=None):
    """One e-block tile: jets -> EtE, g_e, cross A, chunk Jf, chunk r.

    All refs hold planes with rows-on-lanes:
      xf  [kf*tf]      camera parameter values (SMEM scalars)
      xe  [te, T]      point parameter values
      oh  [kf, k, T]   one-hot camera membership (masked)
      mask [k, T]
      obsx/obsy [k, T]
    outs (ALL unscaled — Jacobi scaling is a rank-1 congruence applied
    by the caller, so the iteration-0 scale can be derived from these
    Gram diagonals without a separate linearize):
      ete [te*te, T]   E^T E (row-major a*te+b)
      ge  [te, T]      e gradient
      a   [te, kf*tf, T]  cross tensor A^T
      jf  [2*tf, k, T] chunk-layout masked Jf (row-major r*tf+t)
      rc  [2, k, T]    chunk-layout masked residuals
    """
    nt = tf + te
    mask = mask_ref[...]                              # [k, T]

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

    # residuals + Jf chunk outputs
    for r in range(2):
        rc_ref[r, :, :] = rvals[r]
        for t in range(tf):
            col = rcols[r][fo + t]
            jf_ref[r * tf + t, :, :] = (jnp.zeros_like(mask)
                                        if col is None else col)

    # E^T E, g_e (sum over r and k)
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

    # A^T: A[a, c*tf+t, :] = sum_k oh[c] * Ge[a,t]
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
                a_ref[a, c * tf + t, :] = (gp * ohc).sum(axis=0)


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
    try:
        from ..examples.snavely import SnavelyReprojectionError
        if type(bk.cost.functor) is not SnavelyReprojectionError:
            return False
    except Exception:
        return False
    slots = [sl for sl in bk.slots if sl.variable]
    if len(slots) != 2 or any(sl.manifold is not None for sl in slots):
        return False
    grp = meta.f_groups[0]
    if grp["t"] != 9 or meta.te != 3 or bk.r != 2:
        return False
    if grp["kf"] > 64:     # VPU A-assembly cost grows linearly in kf
        return False
    from ..solvers.schur_fused import _slab_of
    if _slab_of(meta.e_cols) is None:
        return False
    fpos = meta.f_global_cols[grp["cols"]].reshape(grp["kf"], grp["t"])
    if _slab_of(fpos) is None:
        return False
    if not isinstance(bk.data, dict) or \
            set(bk.data.keys()) != {"observed_x", "observed_y"}:
        return False
    return True


# Mosaic probe-compile results per kernel shape (process-wide): the same
# shape never pays a second probe, and a rejected shape never re-probes.
_PROBE_CACHE: dict = {}


def make_pallas_lin(program, options, meta, tile: int = 512):
    """Returns lin(x) -> dict with keys
    EtE [ne_pad, te, te], g_e [ne_pad, te], A_T [te, kf*tf, ne_pad]
    (UNSCALED — the caller applies the s_e/s_f Jacobi congruence, see
    _lin_phase_pallas), Jf [ne_pad, k, 2, tf], rg [ne_pad, k, 2], oh_t
    [kf, k, ne_pad], ne_pad — all f32, chunk layout, pad rows masked to
    zero. Returns None when the kernel's VMEM blocks cannot fit at any
    tile width or the Mosaic TPU compiler rejects the kernel (probed at
    build time so BOTH the fused and host-loop paths fall back to the
    generic lin phase cleanly)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..solvers.schur_fused import _slab_of

    bk, bs = program.buckets[0], meta.buckets[0]
    grp = meta.f_groups[0]
    kf, tf, te, ne = grp["kf"], grp["t"], meta.te, meta.ne
    k = bs.chunk_rows.shape[1]
    e_slab = _slab_of(meta.e_cols)
    fpos = meta.f_global_cols[grp["cols"]].reshape(kf, tf)
    f_slab = _slab_of(fpos)

    # VMEM fit: per-lane bytes across all blocks (in/out refs) plus a
    # generous allowance for the live jet planes the kernel body keeps
    # (~40 [k, tile] planes through the unrolled channel loops). Shrink
    # the tile until the estimate fits a conservative VMEM budget; give
    # up below the minimum lane tile.
    per_lane = 4 * (kf * k                 # oh
                    + 5 * k                # mask/obsx/obsy/rc
                    + 2 * tf * k           # jf
                    + 2 * te + te * te + te
                    + te * kf * tf         # A_sT
                    + 40 * k)              # jet-plane working set
    budget = 6 * 1024 * 1024
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
    obsx_t = chunk_t(bk.data["observed_x"])
    obsy_t = chunk_t(bk.data["observed_y"])
    loc_chunk = np.asarray(local)[rows.reshape(-1)].reshape(ne, k)
    oh_np = (loc_chunk[None, :, :] == np.arange(kf)[:, None, None]
             ).astype(np.float32) * cmask[None, :, :]
    oh_t = np.concatenate(
        [oh_np, np.zeros((kf, ne_pad - ne, k), np.float32)],
        axis=1).transpose(0, 2, 1)                      # [kf, k, ne_pad]
    interp = bool(os.environ.get("CERES_TPU_PALLAS_INTERPRET"))
    loss = program._bucket_loss(bk)     # uniform scalars (gate) or None
    kern = functools.partial(_lin_kernel, te=te, tf=tf, kf=kf, k=k,
                             eo=eo, fo=fo, loss=loss)

    bspec = lambda shape, imap: pl.BlockSpec(shape, imap,
                                             memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.SMEM)
    raw_call = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            smem((kf * tf,)),                               # xf
            bspec((te, tile), lambda i: (0, i)),            # xe
            bspec((kf, k, tile), lambda i: (0, 0, i)),      # oh
            bspec((k, tile), lambda i: (0, i)),             # mask
            bspec((k, tile), lambda i: (0, i)),             # obsx
            bspec((k, tile), lambda i: (0, i)),             # obsy
        ],
        out_specs=[
            bspec((te * te, tile), lambda i: (0, i)),       # ete
            bspec((te, tile), lambda i: (0, i)),            # ge
            bspec((te, kf * tf, tile), lambda i: (0, 0, i)),  # A^T
            bspec((2 * tf, k, tile), lambda i: (0, 0, i)),  # jf
            bspec((2, k, tile), lambda i: (0, 0, i)),       # rc
        ],
        out_shape=[
            jax.ShapeDtypeStruct((te * te, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((te, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((te, kf * tf, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((2 * tf, k, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((2, k, ne_pad), jnp.float32),
        ],
        interpret=interp,
    )

    def call(*a):
        # Trace the pallas_call with x64 scoped OFF: under jax_enable_x64
        # the pallas grid/index-map plumbing emits i64 scalars the Mosaic
        # TPU compiler cannot legalize ("failed to legalize operation
        # 'func.return'" on an i64). The kernel itself is pure f32, so
        # scoping x64 off around the bind changes nothing numerically;
        # the surrounding f64 solve is untouched.
        with jax.enable_x64(False):
            return raw_call(*a)

    # Probe-compile the kernel through the real Mosaic backend ONCE per
    # shape: a front-end that traces fine can still be rejected by the
    # TPU kernel compiler (layout/op support varies by generation), and
    # the rejection must surface HERE — at build time, where both the
    # fused and host-loop minimizers can fall back to the generic lin
    # phase — not inside a compiled solve.
    if not interp:
        loss_key = (None if loss is None else
                    (type(loss).__name__,
                     tuple(sorted(vars(loss).items()))))
        shape_key = (te, tf, kf, k, tile, ne_pad, loss_key,
                     jax.default_backend())
        ok = _PROBE_CACHE.get(shape_key)
        if ok is None:
            try:
                probe_args = [
                    jax.ShapeDtypeStruct((kf * tf,), jnp.float32),
                    jax.ShapeDtypeStruct((te, ne_pad), jnp.float32),
                    jax.ShapeDtypeStruct((kf, k, ne_pad), jnp.float32),
                    jax.ShapeDtypeStruct((k, ne_pad), jnp.float32),
                    jax.ShapeDtypeStruct((k, ne_pad), jnp.float32),
                    jax.ShapeDtypeStruct((k, ne_pad), jnp.float32),
                ]
                jax.jit(call).lower(*probe_args).compile()
                ok = True
            except Exception as e:
                import sys
                print("ceres_tpu: pallas lin-phase kernel rejected by the "
                      f"TPU kernel compiler ({type(e).__name__}); using "
                      "the generic fused lin phase", file=sys.stderr)
                if os.environ.get("CERES_TPU_PALLAS_DEBUG"):
                    import traceback
                    traceback.print_exc()
                ok = False
            _PROBE_CACHE[shape_key] = ok
        if not ok:
            return None

    program.register_const("plin.mask_t", np.ascontiguousarray(mask_t))
    program.register_const("plin.obsx_t", obsx_t)
    program.register_const("plin.obsy_t", obsy_t)
    program.register_const("plin.oh_t", np.ascontiguousarray(oh_t))

    def lin(x):
        xe = jax.lax.dynamic_slice(x, (e_slab,), (ne * te,)
                                   ).astype(jnp.float32)
        # pad e-blocks (ne..ne_pad) are all-masked rows; the kernel's
        # valid-lane divisor guard keeps their chain finite.
        xe_t = jnp.pad(xe.reshape(ne, te).T, ((0, 0), (0, ne_pad - ne)))
        xf = jax.lax.dynamic_slice(x, (f_slab,), (kf * tf,)
                                   ).astype(jnp.float32)
        ete_t, ge_t, a_t, jf_t, rc_t = call(
            xf, xe_t,
            program.const("plin.oh_t"), program.const("plin.mask_t"),
            program.const("plin.obsx_t"), program.const("plin.obsy_t"))
        return {
            "EtE": ete_t.T.reshape(ne_pad, te, te),
            "g_e": ge_t.T,
            "A_T": a_t,                  # UNSCALED [te, kf*tf, ne_pad]
            "Jf": jf_t.transpose(2, 1, 0).reshape(ne_pad, k, 2, tf),
            "rg": rc_t.transpose(2, 1, 0),
            "oh_t": program.const("plin.oh_t"),
            "ne_pad": ne_pad,
        }

    lin.ne_pad = ne_pad
    return lin
