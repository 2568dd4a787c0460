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
# Jet algebra: shared with ops/pallas_linearize.py (see ops/jetlib.py).

from .jetlib import (_Jet, _jc, _jvar, _p, _jadd, _jsub, _jneg, _jmul,
                     _jscale, _jshift, _jdiv, _jsqrt, _jsincos, _jwhere,
                     _jdot3, _jcross, _aa_rotate_jets,
                     _snavely_residual_jets, _correct_jets, _jet_planes)


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
            # disk-backed result (warm starts skip the probe compile,
            # which costs seconds through the remote compile helper)
            from ..utils import probecache
            ok = probecache.get(("plin",) + shape_key)
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
                probe_err = e
            from ..utils import probecache
            probecache.put(("plin",) + shape_key, ok,
                           transient=(not ok and probecache
                                      .is_transient_error(probe_err)))
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
