"""Double-single (two-float32) candidate-cost kernel for the Snavely
bundle-adjustment shape.

The fused LM loop needs the TOTAL COST at every candidate point to f64
accuracy (the function-tolerance test compares cost DIFFERENCES at
ftol * cost, reference trust_region_minimizer.cc:110) — but a full f64
residual pass is software-emulated on TPU and measured ~0.95 ms per
iteration at BAL-16 scale, as much as the entire linearize+eliminate
pipeline. This kernel evaluates the Snavely residuals in DOUBLE-SINGLE
arithmetic (each value carried as an unevaluated f32 hi+lo pair,
~2^-48 relative accuracy — beyond what the ftol test needs) on VPU
planes, with the per-camera trigonometry (cos t, sin t / t,
(1 - cos t)/t^2) computed EXACTLY in f64 outside the kernel (16-ish
values) and fed in as double-single scalars — so the kernel body is
pure polynomial + divide arithmetic where the error-free
transformations (Dekker/Knuth: two_sum, Veltkamp split, two_prod) are
exact.

Outputs per-row squared block norms as (hi, lo) planes; the caller sums
them in f64 and applies the robust loss rho there (f64, masked), so
every LossFunction the lin-phase kernel's gate admits is supported
bit-consistently with loss.py's cost convention
(cost = 0.5 * rho(||r||^2) per block, corrector.cc role).

Reference roles: residual evaluation inside TrustRegionMinimizer's
candidate evaluation (trust_region_minimizer.cc:479 EvaluateCandidate),
snavely_reprojection_error.h:53, rotation.h:288 AngleAxisRotatePoint
(including its small-angle branch, mirrored exactly in the f64
precompute so the kernel needs no branch).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_pallas_cost"]


# ----------------------------------------------------------------------
# Double-single helpers (error-free transformations; Dekker 1971,
# Knuth TAOCP 4.2.2). A ds number is a tuple (hi, lo) of f32 values
# (arrays) with |lo| <= ulp(hi)/2.

_SPLITTER = 4097.0            # 2^12 + 1 for the 24-bit f32 mantissa


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _quick_two_sum(a, b):     # requires |a| >= |b|
    s = a + b
    return s, b - (s - a)


def _vsplit(a):
    c = _SPLITTER * a
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _vsplit(a)
    bh, bl = _vsplit(b)
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def ds(hi, lo=None):
    return (hi, jnp.zeros_like(hi) if lo is None else lo)


def ds_add(a, b):
    # Full-accuracy ("ieee") double-single add: the sloppy one-two_sum
    # variant loses to O(eps) under CANCELLATION (measured 2.6e-9
    # relative on r = predicted - observed, exactly the BA residual
    # pattern); this QD-library form keeps O(eps^2) everywhere.
    s1, s2 = _two_sum(a[0], b[0])
    t1, t2 = _two_sum(a[1], b[1])
    s1, s2 = _quick_two_sum(s1, s2 + t1)
    return _quick_two_sum(s1, s2 + t2)


def ds_sub(a, b):
    return ds_add(a, (-b[0], -b[1]))


def ds_neg(a):
    return (-a[0], -a[1])


def ds_mul(a, b):
    p, e = _two_prod(a[0], b[0])
    return _quick_two_sum(p, e + a[0] * b[1] + a[1] * b[0])


def ds_div(a, b):
    q1 = a[0] / b[0]
    r = ds_sub(a, ds_mul((q1, jnp.zeros_like(q1)), b))
    return _quick_two_sum(q1, (r[0] + r[1]) / b[0])


def ds_where(cond, a, b):
    return (jnp.where(cond, a[0], b[0]), jnp.where(cond, a[1], b[1]))


def ds_cross(a, b):
    """3-vector cross product of ds triples."""
    return [
        ds_sub(ds_mul(a[1], b[2]), ds_mul(a[2], b[1])),
        ds_sub(ds_mul(a[2], b[0]), ds_mul(a[0], b[2])),
        ds_sub(ds_mul(a[0], b[1]), ds_mul(a[1], b[0])),
    ]


def ds_dot3(a, b):
    return ds_add(ds_add(ds_mul(a[0], b[0]), ds_mul(a[1], b[1])),
                  ds_mul(a[2], b[2]))


def split_f64(v, dtype=np.float32):
    """f64 array -> (hi, lo) f32 arrays with hi + lo == v exactly
    (up to f32 range)."""
    v = np.asarray(v, np.float64)
    hi = v.astype(dtype)
    lo = (v - hi.astype(np.float64)).astype(dtype)
    return hi, lo


def split_f64_jnp(v):
    hi = v.astype(jnp.float32)
    lo = (v - hi.astype(v.dtype)).astype(jnp.float32)
    return hi, lo


# ----------------------------------------------------------------------
# Kernel

def _cost_kernel(xfh_ref, xfl_ref, trig_ref,
                 xeh_ref, xel_ref, oh_ref, mask_ref,
                 oxh_ref, oxl_ref, oyh_ref, oyl_ref,
                 sqh_ref, sql_ref, *, te, tf, kf, k):
    """One e-block tile of Snavely squared block norms in double-single.

      xfh/xfl [kf*tf]  camera parameters, ds split (SMEM)
      trig    [6, kf]  per-camera cos/s1/s2 hi+lo (SMEM; rows:
                       cos_hi, cos_lo, s1_hi, s1_lo, s2_hi, s2_lo)
      xeh/xel [te, T]  point parameters, ds split
      oh      [kf, k, T] one-hot camera membership (masked)
      mask    [k, T]
      oxh/... [k, T]   observed x/y, ds split
    outs:
      sqh/sql [k, T]   per-row ||r||^2 as ds pair, masked
    """
    mask = mask_ref[...]
    valid = mask > 0.5

    def sel(scalar_ref, idx_fn):
        """One-hot contraction of SMEM scalars into a [k, T] plane."""
        plane = None
        for c in range(kf):
            term = oh_ref[c, :, :] * idx_fn(scalar_ref, c)
            plane = term if plane is None else plane + term
        return plane

    cam = []
    for a in range(tf):
        hi = sel(xfh_ref, lambda r, c, a=a: r[c * tf + a])
        lo = sel(xfl_ref, lambda r, c, a=a: r[c * tf + a])
        cam.append((hi, lo))
    trig = []
    for j in range(3):
        hi = sel(trig_ref, lambda r, c, j=j: r[2 * j, c])
        lo = sel(trig_ref, lambda r, c, j=j: r[2 * j + 1, c])
        trig.append((hi, lo))
    cos_t, s1, s2 = trig

    pt = [(xeh_ref[a, :][None, :], xel_ref[a, :][None, :])
          for a in range(te)]
    aa = cam[0:3]

    # R(aa) p = p cos t + (aa x p) s1 + aa (aa . p) s2, with
    # s1 = sin t / t, s2 = (1 - cos t)/t^2 precomputed per camera in f64
    # (small-angle branch folded into the precompute: cos->1, s1->1,
    # s2->0 reproduces rotation.h:306's p + aa x p exactly).
    axp = ds_cross(aa, pt)
    adp = ds_dot3(aa, pt)
    p = []
    for i in range(3):
        r = ds_add(ds_add(ds_mul(pt[i], cos_t), ds_mul(axp[i], s1)),
                   ds_mul(ds_mul(aa[i], adp), s2))
        p.append(ds_add(r, cam[3 + i]))

    one = ds(jnp.ones_like(mask))
    z = ds_where(valid, p[2], one)
    xp = ds_neg(ds_div(p[0], z))
    yp = ds_neg(ds_div(p[1], z))
    r2 = ds_add(ds_mul(xp, xp), ds_mul(yp, yp))
    distortion = ds_add(one, ds_mul(r2, ds_add(cam[7],
                                               ds_mul(cam[8], r2))))
    fd = ds_mul(cam[6], distortion)
    rx = ds_sub(ds_mul(fd, xp), (oxh_ref[...], oxl_ref[...]))
    ry = ds_sub(ds_mul(fd, yp), (oyh_ref[...], oyl_ref[...]))
    sq = ds_add(ds_mul(rx, rx), ds_mul(ry, ry))
    sqh_ref[...] = sq[0] * mask
    sql_ref[...] = sq[1] * mask


def make_pallas_cost(program, options, meta, tile: int = 512):
    """Returns cost_fn(x) -> f64 total cost (fixed_cost included), or
    None when the kernel cannot fit VMEM / is rejected by Mosaic.
    Gate: the caller must have validated the Snavely bucket structure
    (ops/pallas_lin.pallas_lin_supported); loss None or uniform scalars
    is applied OUTSIDE the kernel in f64."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..solvers.schur_fused import _slab_of
    from .pallas_lin import _probe

    bk, bs = program.buckets[0], meta.buckets[0]
    # The double-single chain is hand-written for the Snavely functor;
    # auto-LIN buckets (any functor) keep the f64 cost pass.
    from .pallas_lin import _is_snavely
    if not _is_snavely(bk):
        return None
    grp = meta.f_groups[0]
    kf, tf, te, ne = grp["kf"], grp["t"], meta.te, meta.ne
    k = bs.chunk_rows.shape[1]
    e_slab = _slab_of(meta.e_cols)
    fpos = meta.f_global_cols[grp["cols"]].reshape(kf, tf)
    f_slab = _slab_of(fpos)
    if e_slab is None or f_slab is None:
        return None

    per_lane = 4 * (kf * k + 9 * k + 4 * te + 40 * k)
    budget = 6 * 1024 * 1024
    tile = min(tile, max(128, 1 << (ne - 1).bit_length()))
    while tile > 128 and per_lane * tile > budget:
        tile //= 2
    if per_lane * tile > 2 * budget:
        return None
    ne_pad = int(math.ceil(ne / tile) * tile)
    grid = ne_pad // tile

    rows, cmask = bs.chunk_rows, bs.chunk_mask
    (_, f_si, local) = [s for s in grp["slots"] if s[0] == 0][0]

    def chunk_split(a):
        a = np.asarray(a, np.float64)
        out = a[rows.reshape(-1)].reshape(ne, k) * cmask
        out = np.concatenate(
            [out, np.zeros((ne_pad - ne, k), np.float64)], axis=0)
        hi, lo = split_f64(np.ascontiguousarray(out.T))
        return np.ascontiguousarray(hi), np.ascontiguousarray(lo)

    mask_t = np.concatenate(
        [cmask.astype(np.float32),
         np.zeros((ne_pad - ne, k), np.float32)], axis=0).T
    oxh, oxl = chunk_split(bk.data["observed_x"])
    oyh, oyl = chunk_split(bk.data["observed_y"])
    loc_chunk = np.asarray(local)[rows.reshape(-1)].reshape(ne, k)
    oh_np = (loc_chunk[None, :, :] == np.arange(kf)[:, None, None]
             ).astype(np.float32) * cmask[None, :, :]
    oh_t = np.ascontiguousarray(np.concatenate(
        [oh_np, np.zeros((kf, ne_pad - ne, k), np.float32)],
        axis=1).transpose(0, 2, 1))
    interp = bool(os.environ.get("CERES_TPU_PALLAS_INTERPRET"))
    loss = program._bucket_loss(bk)

    kern = functools.partial(_cost_kernel, te=te, tf=tf, kf=kf, k=k)
    bspec = lambda shape, imap: pl.BlockSpec(shape, imap,
                                             memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.SMEM)
    raw_call = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            smem((kf * tf,)),                               # xf hi
            smem((kf * tf,)),                               # xf lo
            smem((6, kf)),                                  # trig
            bspec((te, tile), lambda i: (0, i)),            # xe hi
            bspec((te, tile), lambda i: (0, i)),            # xe lo
            bspec((kf, k, tile), lambda i: (0, 0, i)),      # oh
            bspec((k, tile), lambda i: (0, i)),             # mask
            bspec((k, tile), lambda i: (0, i)),             # obsx hi
            bspec((k, tile), lambda i: (0, i)),             # obsx lo
            bspec((k, tile), lambda i: (0, i)),             # obsy hi
            bspec((k, tile), lambda i: (0, i)),             # obsy lo
        ],
        out_specs=[
            bspec((k, tile), lambda i: (0, i)),
            bspec((k, tile), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((k, ne_pad), jnp.float32),
        ],
        interpret=interp,
    )

    def call(*a):
        with jax.enable_x64(False):
            return raw_call(*a)

    if not interp:
        probe_args = [
            jax.ShapeDtypeStruct((kf * tf,), jnp.float32),
            jax.ShapeDtypeStruct((kf * tf,), jnp.float32),
            jax.ShapeDtypeStruct((6, kf), jnp.float32),
            jax.ShapeDtypeStruct((te, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((te, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((kf, k, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((k, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((k, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((k, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((k, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((k, ne_pad), jnp.float32),
        ]
        if not _probe("pcost", call, probe_args,
                      (te, tf, kf, k, tile, ne_pad,
                       jax.default_backend())):
            return None

    program.register_const("pcost.mask_t", mask_t)
    program.register_const("pcost.oxh", oxh)
    program.register_const("pcost.oxl", oxl)
    program.register_const("pcost.oyh", oyh)
    program.register_const("pcost.oyl", oyl)
    program.register_const("pcost.oh_t", oh_t)

    dtype = program.dtype
    # f64 small-angle threshold, mirroring rotation.py _small exactly so
    # the kernel's trig matches cost_fn's branch decisions.
    from ..rotation import _EPS_BY_DTYPE
    eps64 = _EPS_BY_DTYPE.get(jnp.dtype(dtype), 1e-12)

    def cost_fn(x):
        xe = jax.lax.dynamic_slice(x, (e_slab,), (ne * te,))
        xe_t = jnp.pad(xe.reshape(ne, te).T, ((0, 0), (0, ne_pad - ne)))
        xeh, xel = split_f64_jnp(xe_t)
        xf = jax.lax.dynamic_slice(x, (f_slab,), (kf * tf,))
        xfh, xfl = split_f64_jnp(xf)

        # per-camera trig in f64 (exact values + exact small-angle
        # branch), ds-split into SMEM scalars
        aa = xf.reshape(kf, tf)[:, :3]
        tsq = jnp.sum(aa * aa, axis=1)
        small = tsq < eps64
        theta = jnp.sqrt(jnp.where(small, 1.0, tsq))
        cos_t = jnp.where(small, 1.0, jnp.cos(theta))
        s1 = jnp.where(small, 1.0, jnp.sin(theta) / theta)
        s2 = jnp.where(small, 0.0, (1.0 - jnp.cos(theta)) / tsq)
        trig = jnp.stack([cos_t, s1, s2])                 # [3, kf] f64
        th, tl = split_f64_jnp(trig)
        trig6 = jnp.stack([th[0], tl[0], th[1], tl[1], th[2], tl[2]])

        sqh, sql = call(xfh, xfl, trig6, xeh, xel,
                        program.const("pcost.oh_t"),
                        program.const("pcost.mask_t"),
                        program.const("pcost.oxh"),
                        program.const("pcost.oxl"),
                        program.const("pcost.oyh"),
                        program.const("pcost.oyl"))
        s = sqh.astype(dtype) + sql.astype(dtype)         # [k, ne_pad]
        if loss is None:
            rho0 = s
        else:
            rho0, _, _ = loss.evaluate(s)
        maskc = program.const("pcost.mask_t").astype(dtype)
        total = 0.5 * jnp.sum(jnp.where(maskc > 0.5, rho0, 0.0))
        return jnp.asarray(program.fixed_cost, dtype=dtype) + total

    def sq_planes(x):
        """Per-row squared block norms [k, ne_pad] as (hi, lo) f32 —
        chunk layout, masked. Exposed for parity tests."""
        xe = jax.lax.dynamic_slice(x, (e_slab,), (ne * te,))
        xe_t = jnp.pad(xe.reshape(ne, te).T, ((0, 0), (0, ne_pad - ne)))
        xeh, xel = split_f64_jnp(xe_t)
        xf = jax.lax.dynamic_slice(x, (f_slab,), (kf * tf,))
        xfh, xfl = split_f64_jnp(xf)
        aa = xf.reshape(kf, tf)[:, :3]
        tsq = jnp.sum(aa * aa, axis=1)
        small = tsq < eps64
        theta = jnp.sqrt(jnp.where(small, 1.0, tsq))
        cos_t = jnp.where(small, 1.0, jnp.cos(theta))
        s1 = jnp.where(small, 1.0, jnp.sin(theta) / theta)
        s2 = jnp.where(small, 0.0, (1.0 - jnp.cos(theta)) / tsq)
        trig = jnp.stack([cos_t, s1, s2])
        th, tl = split_f64_jnp(trig)
        trig6 = jnp.stack([th[0], tl[0], th[1], tl[1], th[2], tl[2]])
        return call(xfh, xfl, trig6, xeh, xel,
                    program.const("pcost.oh_t"),
                    program.const("pcost.mask_t"),
                    program.const("pcost.oxh"), program.const("pcost.oxl"),
                    program.const("pcost.oyh"), program.const("pcost.oyl"))

    cost_fn.sq_planes = sq_planes
    cost_fn.chunk_rows = rows
    cost_fn.chunk_mask = cmask
    return cost_fn
