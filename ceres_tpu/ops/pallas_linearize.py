"""Shape-driven Pallas bucket-linearize specializations.

The reference ships 44 generated template specializations for its hot
shapes, selected at runtime (internal/ceres/generated/,
generate_template_specializations.py:55, schur_templates.cc:227). This is
the TPU analog for the GENERIC evaluation path: a registry of hand-jetted
residual programs keyed by functor class. Each program computes one
bucket's residuals [n, r] and TANGENT-space Jacobian [n, r, t] — manifold
Plus chain included, seeded directly into the jet channels — in a single
VMEM pass over rows-on-lanes planes (ops/jetlib.py), replacing the
hundreds of narrow vmap(jacfwd) fusions XLA compiles for the same math.

Registered shapes:
  * SE3 pose graph (pose_graph_3d_error_term.h:71): r=6, blocks
    [3, 4(quat), 3, 4(quat)] -> tangent 12, EigenQuaternionManifold
    seeding d(exp(delta) * q)/d(delta) at 0.
  * SE2 pose graph (pose_graph_2d_error_term.h:60): r=3, blocks
    [2, 1(angle), 2, 1(angle)] -> tangent 6; the angle manifold's Plus
    has derivative 1, so its slots seed like Euclidean ones.
The Snavely BA family has a deeper Schur-fused specialization in
ops/pallas_lin.py (it also emits the eliminator tensors); this module
serves solvers that consume the plain bucket Jacobian (CGNR,
SPARSE_NORMAL_CHOLESKY, pose graphs).

Layout: rows live on (sublane, lane) tiles: every per-row scalar is an
[S, T] f32 plane (S=8 sublanes, T lanes), arrays are [P, G*S, T] with the
grid over G. Clean fallback: unsupported buckets, Mosaic rejection
(probe-compiled at build), or CERES_TPU_NO_PALLAS keep the jacfwd path.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from .jetlib import (_Jet, _jc, _jvar, _p, _jadd, _jsub, _jneg, _jmul,
                     _jsincos)

__all__ = ["pallas_linearize_supported", "make_pallas_bucket_linearize"]

_SUB = 8          # sublanes per tile


# ----------------------------------------------------------------------
# quaternion jet helpers (Eigen [x,y,z,w] storage, the functor's order)

def _q_mul_eigen_jets(q1, q2):
    """Mirrors PoseGraph3dErrorTerm._q_mul (Eigen xyzw) on jets."""
    x1, y1, z1, w1 = q1
    x2, y2, z2, w2 = q2
    return [
        _jsub(_jadd(_jadd(_jmul(w1, x2), _jmul(x1, w2)), _jmul(y1, z2)),
              _jmul(z1, y2)),
        _jadd(_jadd(_jsub(_jmul(w1, y2), _jmul(x1, z2)), _jmul(y1, w2)),
              _jmul(z1, x2)),
        _jadd(_jsub(_jadd(_jmul(w1, z2), _jmul(x1, y2)), _jmul(y1, x2)),
              _jmul(z1, w2)),
        _jsub(_jsub(_jsub(_jmul(w1, w2), _jmul(x1, x2)), _jmul(y1, y2)),
              _jmul(z1, z2)),
    ]


def _q_conj_eigen_jets(q):
    return [_jneg(q[0]), _jneg(q[1]), _jneg(q[2]), q[3]]


def _q_rot_eigen_jets(q, v):
    """Rotate the 3-jet v by the Eigen-order quaternion jet q."""
    qv = [v[0], v[1], v[2], _jc(jnp.float32(0.0))]
    return _q_mul_eigen_jets(_q_mul_eigen_jets(q, qv),
                             _q_conj_eigen_jets(q))[:3]


def _seed_eigen_quaternion(vals, ch0):
    """Jet quaternion for an EigenQuaternionManifold slot: value planes
    [qx,qy,qz,qw] with tangent channels ch0..ch0+2 seeded through
    Plus(q, delta) = exp(delta) * q (manifolds.py QuaternionManifold.plus,
    LEFT Hamilton product in wxyz). exp(delta) at delta=0 is the jet
    quaternion [w=1, v=delta], so the product gives exactly the manifold's
    PlusJacobian chain with no separate chain-rule matmul."""
    qx, qy, qz, qw = vals
    # exp(delta) as jets, wxyz: w = 1 (no first-order dependence),
    # v_i = delta_i (seed channels)
    one = jnp.ones_like(qw)
    zero = jnp.zeros_like(qw)
    ew = _jc(one)
    ev = [_Jet(zero, {ch0 + i: None}) for i in range(3)]
    # Hamilton product (exp ⊗ q) in wxyz with q constant:
    # (w1w2 - v1.v2, w1 v2 + w2 v1 + v1 x v2)
    xw, xx, xy, xz = _jc(qw), _jc(qx), _jc(qy), _jc(qz)
    rw = _jsub(_jmul(ew, xw),
               _jadd(_jadd(_jmul(ev[0], xx), _jmul(ev[1], xy)),
                     _jmul(ev[2], xz)))
    rx = _jadd(_jadd(_jmul(ew, xx), _jmul(ev[0], xw)),
               _jsub(_jmul(ev[1], xz), _jmul(ev[2], xy)))
    ry = _jadd(_jadd(_jmul(ew, xy), _jmul(ev[1], xw)),
               _jsub(_jmul(ev[2], xx), _jmul(ev[0], xz)))
    rz = _jadd(_jadd(_jmul(ew, xz), _jmul(ev[2], xw)),
               _jsub(_jmul(ev[0], xy), _jmul(ev[1], xx)))
    return [rx, ry, rz, rw]          # back to Eigen xyzw order


# ----------------------------------------------------------------------
# registered jet programs

def _pose3d_emit(slot_jets, data):
    """PoseGraph3dErrorTerm with jets (examples/slam.py; reference
    pose_graph_3d_error_term.h:71):
      r = sqrt_info * [ R(q_a)^-1 (p_b - p_a) - t_ab ; 2 vec(q_ab^-1
          (q_a^-1 q_b)) ]."""
    p_a, q_a, p_b, q_b = slot_jets
    t_ab = data["t_ab"]               # 3 planes
    q_ab = data["q_ab"]               # 4 planes (xyzw)
    sqrt_info = data["sqrt_information"]   # 36 planes row-major
    qa_inv = _q_conj_eigen_jets(q_a)
    d = [_jsub(p_b[i], p_a[i]) for i in range(3)]
    p_ab_est = _q_rot_eigen_jets(qa_inv, d)
    q_ab_est = _q_mul_eigen_jets(qa_inv, q_b)
    q_ab_c = [_jc(q_ab[0]), _jc(q_ab[1]), _jc(q_ab[2]), _jc(q_ab[3])]
    dq = _q_mul_eigen_jets(_q_conj_eigen_jets(q_ab_c), q_ab_est)
    two = jnp.float32(2.0)
    r6 = ([_jsub(p_ab_est[i], _jc(t_ab[i])) for i in range(3)]
          + [_Jet(dq[i].v * two, {c: _p(pp) * two
                                  for c, pp in dq[i].d.items()})
             for i in range(3)])
    # r = sqrt_information @ r6 (per-row 6x6 data planes)
    out = []
    for i in range(6):
        acc = None
        for j in range(6):
            term = _jmul(_jc(sqrt_info[i * 6 + j]), r6[j])
            acc = term if acc is None else _jadd(acc, term)
        out.append(acc)
    return out


def _pose3d_match(program, bk):
    sizes = [sl.amb_size for sl in bk.slots]
    if bk.r != 6 or sizes != [3, 4, 3, 4]:
        return False
    from ..manifolds import EigenQuaternionManifold
    for i, sl in enumerate(bk.slots):
        if not sl.variable:
            return False
        want_q = (i % 2 == 1)
        if want_q and type(sl.manifold) is not EigenQuaternionManifold:
            return False
        if not want_q and sl.manifold is not None:
            return False
    if set(bk.data.keys()) != {"t_ab", "q_ab", "sqrt_information"}:
        return False
    return True


def _jnormangle(jet):
    """normalize_angle with jets (examples/slam.py; reference
    normalize_angle.h): value wrapped to [-pi, pi], derivative 1.
    Branchless mod form, NOT arctan2(sin, cos): Mosaic has no atan2
    lowering ("Unimplemented primitive ... atan2" — this rejection sent
    every SE2 pose-graph bucket back to jacfwd in rounds 3-5). The two
    forms agree except at exact odd multiples of pi (measure zero), and
    the derivative of the round term is 0, so the partials are
    untouched."""
    two_pi = 2.0 * np.pi
    v = jet.v - two_pi * jnp.round(jet.v / two_pi)
    return _Jet(v, dict(jet.d))


def _pose2d_emit(slot_jets, data):
    """PoseGraph2dErrorTerm with jets (examples/slam.py; reference
    pose_graph_2d_error_term.h:60):
      r = sqrt_info * [ R(yaw_a)^T (p_b - p_a) - t_ab ;
                        normalize(yaw_b - yaw_a - yaw_ab) ]."""
    p_a, yaw_a, p_b, yaw_b = slot_jets
    t_ab = data["t_ab"]                    # 2 planes
    yaw_ab = data["yaw_ab"][0]             # 1 plane
    sqrt_info = data["sqrt_information"]   # 9 planes row-major
    s, c = _jsincos(yaw_a[0])
    d = [_jsub(p_b[i], p_a[i]) for i in range(2)]
    local = [_jadd(_jmul(c, d[0]), _jmul(s, d[1])),
             _jsub(_jmul(c, d[1]), _jmul(s, d[0]))]
    dyaw = _jsub(_jsub(yaw_b[0], yaw_a[0]), _jc(yaw_ab))
    r3 = [_jsub(local[0], _jc(t_ab[0])),
          _jsub(local[1], _jc(t_ab[1])),
          _jnormangle(dyaw)]
    out = []
    for i in range(3):
        acc = None
        for j in range(3):
            term = _jmul(_jc(sqrt_info[i * 3 + j]), r3[j])
            acc = term if acc is None else _jadd(acc, term)
        out.append(acc)
    return out


def _is_angle_manifold(m) -> bool:
    """Behavioral probe (host, concrete numpy): an AutoDiffManifold whose
    plus is normalize_angle(x + d). Lambda identity cannot be checked
    structurally, so check the 2-pi wrapping on sample points."""
    from ..manifolds import AutoDiffManifold
    if type(m) is not AutoDiffManifold or m.ambient_size != 1 \
            or m.tangent_size != 1:
        return False
    try:
        rng = np.random.default_rng(0)
        for _ in range(4):
            x = rng.uniform(-10, 10, size=1)
            d = rng.uniform(-10, 10, size=1)
            # escape any AMBIENT trace: this probe runs during the
            # solve's jit tracing, where a jitted plus would hand back a
            # tracer (TracerArrayConversionError) and the except-clause
            # silently demoted every SE2 bucket to the auto spec (whose
            # atan2 Mosaic cannot lower) and from there to jacfwd
            with jax.ensure_compile_time_eval():
                got = np.asarray(m.plus(jnp.asarray(x), jnp.asarray(d)),
                                 dtype=np.float64)
            want = np.arctan2(np.sin(x + d), np.cos(x + d))
            # CIRCULAR distance, loose tolerance: this probe can run
            # inside an x64-disabled trace scope where plus evaluates in
            # f32 — a sum landing near an odd multiple of pi then wraps
            # to the OPPOSITE branch (+pi vs -pi) and a plain allclose
            # spuriously failed, silently demoting the SE2 bucket to the
            # auto spec (whose atan2 Mosaic cannot lower) and from there
            # to jacfwd.
            diff = got - want
            diff = diff - 2.0 * np.pi * np.round(diff / (2.0 * np.pi))
            if not np.allclose(diff, 0.0, atol=1e-4):
                return False
        return True
    except Exception:
        return False


def _pose2d_match(program, bk):
    sizes = [sl.amb_size for sl in bk.slots]
    if bk.r != 3 or sizes != [2, 1, 2, 1]:
        return False
    for i, sl in enumerate(bk.slots):
        if not sl.variable:
            return False
        if i % 2 == 1:
            if not _is_angle_manifold(sl.manifold):
                return False
        elif sl.manifold is not None:
            return False
    if set(bk.data.keys()) != {"t_ab", "yaw_ab", "sqrt_information"}:
        return False
    return True


_REGISTRY = {
    "PoseGraph3dErrorTerm": dict(match=_pose3d_match, emit=_pose3d_emit,
                                 data_fields=(("t_ab", 3), ("q_ab", 4),
                                              ("sqrt_information", 36))),
    # the angle manifold's Plus has derivative 1, so its slots seed like
    # Euclidean ones (the kernel's value chain re-normalizes via
    # _jnormangle inside the residual)
    "PoseGraph2dErrorTerm": dict(match=_pose2d_match, emit=_pose2d_emit,
                                 data_fields=(("t_ab", 2), ("yaw_ab", 1),
                                              ("sqrt_information", 9)),
                                 seed_kinds=("euclid", "euclid",
                                             "euclid", "euclid")),
}


def _spec_for(program, bk):
    try:
        name = type(bk.cost.functor).__name__
    except Exception:
        name = None
    if name is not None:
        spec = _REGISTRY.get(name)
        if spec is not None and spec["match"](program, bk):
            return spec
    # Fully generic fallback: the jaxpr->jetlib auto-compiler
    # (ops/jet_compile.py) — hand entries above are overrides. Tiny
    # buckets keep the jacfwd path on real hardware (kernel dispatch
    # overhead beats the fusion win below ~64 rows); interpret mode
    # (tests) has no such floor.
    from .jet_compile import make_auto_spec, autojet_enabled
    if not autojet_enabled():
        return None
    interp = bool(os.environ.get("CERES_TPU_PALLAS_INTERPRET")) or \
        jax.default_backend() == "cpu"
    if not interp and bk.n < int(os.environ.get(
            "CERES_TPU_AUTOJET_MIN_ROWS", "64")):
        return None
    # Few-tangent buckets keep jacfwd on real hardware: the jet kernel's
    # win comes from column SPARSITY of wide tangent spaces; round-5
    # device A/B (hw_r5/ab_pallas_shapes2.log) measured circle-fit
    # (nt=3) at 0.83x (a loss) and the dynamic range-constraint (nt=3)
    # at 1.00x, vs Snavely (nt=12) 1.10-1.40x and SE3 (nt=12) wins.
    nt_total = sum(sl.tangent_size for sl in bk.slots if sl.variable)
    if not interp and nt_total < int(os.environ.get(
            "CERES_TPU_AUTOJET_MIN_TANGENT", "6")):
        return None
    return make_auto_spec(program, bk)


def pallas_linearize_supported(program, bk) -> bool:
    """Structural gate; cheap (no compile)."""
    if os.environ.get("CERES_TPU_NO_PALLAS") or \
            os.environ.get("CERES_TPU_NO_PALLAS_LINEARIZE"):
        return False
    interp = bool(os.environ.get("CERES_TPU_PALLAS_INTERPRET"))
    if jax.default_backend() == "cpu" and not interp:
        return False
    if bk.jac_mode != "ad":
        return False
    if getattr(bk, "loss_attrs", None) or getattr(bk, "loss_attr_consts",
                                                  None):
        return False
    return _spec_for(program, bk) is not None


# ----------------------------------------------------------------------
# kernel

def _lin_kernel(xin_ref, dat_ref, mask_ref, r_ref, j_ref, *,
                spec, slot_meta, nt, R):
    """One row tile: seed slot jets -> emit residual jets -> write planes.

    xin_ref [P_in, S, T]   per-row parameter values (slot-concatenated)
    dat_ref [P_dat, S, T]  per-row functor data (field-concatenated)
    mask_ref [S, T]        1.0 on real rows, 0.0 on padding
    r_ref  [R, S, T]       residual planes
    j_ref  [R*nt, S, T]    tangent Jacobian planes (row-major r*nt + c)
    """
    mask = mask_ref[...]
    if "emit_raw" in spec:
        # auto-compiled spec (ops/jet_compile.py): seeding happens inside
        # the jet interpreter (deltas are the seeded variables; slot
        # params are constant planes — manifold Plus is part of the
        # traced jaxpr).
        P_in = sum(amb for _, _, amb, _ in slot_meta)
        xin_planes = [xin_ref[p, :, :] for p in range(P_in)]
        P_dat = dat_ref.shape[0]
        dat_planes = [dat_ref[p, :, :] for p in range(P_dat)]
        res = spec["emit_raw"](xin_planes, dat_planes, mask)
    else:
        slot_jets = []
        for (kind, p0, amb, ch0) in slot_meta:
            vals = [xin_ref[p0 + a, :, :] for a in range(amb)]
            if kind == "euclid":
                slot_jets.append([_jvar(vals[a], ch0 + a)
                                  for a in range(amb)])
            else:   # eigen_quaternion
                slot_jets.append(_seed_eigen_quaternion(vals, ch0))
        data = {}
        off = 0
        for field, width in spec["data_fields"]:
            data[field] = [dat_ref[off + i, :, :] for i in range(width)]
            off += width
        res = spec["emit"](slot_jets, data)
    zero = jnp.zeros_like(mask)
    for r in range(R):
        jet = res[r]
        r_ref[r, :, :] = jet.v * mask
        for c in range(nt):
            p = jet.d.get(c)
            j_ref[r * nt + c, :, :] = (zero if p is None
                                        else _p(p) * mask)


_PROBE_CACHE: dict = {}
_BLIN_KVER = 2


def make_pallas_bucket_linearize(program, bk, tile: int = 512):
    """Build lin(x) -> (r [n, R] f32, J [n, R, nt] f32) for a registered
    bucket, or None on VMEM misfit / Mosaic rejection (probe-compiled at
    build time, same clean-fallback contract as ops/pallas_lin.py)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = _spec_for(program, bk)
    if spec is None:
        return None
    n, R = bk.n, bk.r
    slot_meta, p0, ch0 = [], 0, 0
    seed_kinds = spec.get("seed_kinds")
    for i, sl in enumerate(bk.slots):
        from ..manifolds import EigenQuaternionManifold
        if seed_kinds is not None:
            kind = seed_kinds[i]
        else:
            kind = ("eigen_quaternion"
                    if type(sl.manifold) is EigenQuaternionManifold
                    else "euclid")
        slot_meta.append((kind, p0, sl.amb_size, ch0))
        p0 += sl.amb_size
        ch0 += sl.tangent_size
    P_in, nt = p0, ch0
    if "nt" in spec:
        nt = spec["nt"]          # auto specs: var-slot tangent only

    if "data_parts" in spec:
        raw_parts = spec["data_parts"](bk)         # list of [n, w] f32
        data_fields = None
        P_dat = sum(p.shape[1] for p in raw_parts)
    else:
        data_fields = spec["data_fields"]
        P_dat = sum(w for _, w in data_fields)

    # VMEM fit: input + data + output planes + jet working set
    per_cell = 4 * (P_in + P_dat + 1 + R + R * nt + 24 * nt)
    budget = 6 * 1024 * 1024
    while tile > 128 and per_cell * _SUB * tile > budget:
        tile //= 2
    if per_cell * _SUB * tile > 2 * budget:
        return None
    span = _SUB * tile
    n_pad = int(math.ceil(n / span) * span)
    grid = n_pad // span
    GS = grid * _SUB

    # host-side data planes [P_dat, GS, T]. Auto specs pad by REPLICATING
    # the last real row (edge mode) so pad lanes compute the same finite
    # values as a real row — the generic masked-lane NaN discipline
    # (jet_compile.py module doc); hand specs keep zero padding (their
    # emit programs handle inactive lanes per shape).
    pad_mode = spec.get("pad_mode", "zero")
    if data_fields is None:
        parts = [p.T for p in raw_parts]
    else:
        parts = []
        for field, width in data_fields:
            a = np.asarray(bk.data[field], np.float32).reshape(n, width)
            parts.append(a.T)
    if parts and P_dat > 0:
        dat = np.concatenate(parts, axis=0)                 # [P_dat, n]
    else:
        P_dat = 1                     # dummy plane: Mosaic dislikes empty
        dat = np.zeros((1, n), np.float32)
    if pad_mode == "edge":
        dat = np.pad(dat, ((0, 0), (0, n_pad - n)), mode="edge")
    else:
        dat = np.concatenate(
            [dat, np.zeros((dat.shape[0], n_pad - n), np.float32)], axis=1)
    dat = np.ascontiguousarray(dat.reshape(P_dat, GS, tile))
    maskp = np.concatenate([np.ones(n, np.float32),
                            np.zeros(n_pad - n, np.float32)])
    maskp = maskp.reshape(GS, tile)

    interp = bool(os.environ.get("CERES_TPU_PALLAS_INTERPRET")) or \
        jax.default_backend() == "cpu"
    kern = functools.partial(_lin_kernel, spec=spec, slot_meta=slot_meta,
                             nt=nt, R=R)
    bspec = lambda shape, imap: pl.BlockSpec(shape, imap,   # noqa: E731
                                             memory_space=pltpu.VMEM)
    raw_call = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            bspec((P_in, _SUB, tile), lambda i: (0, i, 0)),
            bspec((P_dat, _SUB, tile), lambda i: (0, i, 0)),
            bspec((_SUB, tile), lambda i: (i, 0)),
        ],
        out_specs=[
            bspec((R, _SUB, tile), lambda i: (0, i, 0)),
            bspec((R * nt, _SUB, tile), lambda i: (0, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, GS, tile), jnp.float32),
            jax.ShapeDtypeStruct((R * nt, GS, tile), jnp.float32),
        ],
        interpret=interp,
    )

    def call(*a):
        # x64 scoped OFF only when actually targeting Mosaic (i64 grid
        # scalars fail to legalize); interpret mode keeps the caller's
        # x64 scope — all refs here are f32 either way.
        if interp:
            return raw_call(*a)
        with jax.enable_x64(False):
            return raw_call(*a)

    if interp:
        # The Mosaic probe below only runs when targeting real hardware;
        # in interpret mode nothing compiles ahead of time, so emit-time
        # failures (_Unsupported: gathers with traced indices, select_n
        # with >2 cases, interior padding) that _validate's name-only
        # pre-flight cannot catch would otherwise crash the solve trace.
        # Dry-run the kernel trace abstractly and fall back to jacfwd on
        # any failure, mirroring the non-interp probe contract.
        try:
            probe = [
                jax.ShapeDtypeStruct((P_in, GS, tile), jnp.float32),
                jax.ShapeDtypeStruct((P_dat, GS, tile), jnp.float32),
                jax.ShapeDtypeStruct((GS, tile), jnp.float32),
            ]
            jax.eval_shape(call, *probe)
        except Exception as e:
            import sys
            print("ceres_tpu: pallas bucket-linearize kernel rejected at "
                  f"emit time ({type(e).__name__}: {e}); using the jacfwd "
                  "path", file=sys.stderr)
            if os.environ.get("CERES_TPU_PALLAS_DEBUG"):
                import traceback
                traceback.print_exc()
            return None

    if not interp:
        # _BLIN_KVER invalidates persisted probe results when the hand
        # jet code changes (digest covers only AUTO specs' jaxprs; a
        # stale False for a hand spec would disable it forever — the
        # SE2 atan2 fix is exactly such a change)
        shape_key = ("blin", _BLIN_KVER, spec.get("name") or
                     type(bk.cost.functor).__name__,
                     spec.get("digest", ""), P_in, P_dat,
                     R, nt, tile, GS, jax.default_backend())
        ok = _PROBE_CACHE.get(shape_key)
        if ok is None:
            from ..utils import probecache
            ok = probecache.get(shape_key)
        if ok is None:
            try:
                probe = [
                    jax.ShapeDtypeStruct((P_in, GS, tile), jnp.float32),
                    jax.ShapeDtypeStruct((P_dat, GS, tile), jnp.float32),
                    jax.ShapeDtypeStruct((GS, tile), jnp.float32),
                ]
                jax.jit(call).lower(*probe).compile()
                ok = True
            except Exception as e:
                import sys
                print("ceres_tpu: pallas bucket-linearize kernel rejected "
                      f"by the TPU kernel compiler ({type(e).__name__}); "
                      "using the jacfwd path", file=sys.stderr)
                if os.environ.get("CERES_TPU_PALLAS_DEBUG"):
                    import traceback
                    traceback.print_exc()
                ok = False
                probe_err = e
            from ..utils import probecache
            probecache.put(shape_key, ok,
                           transient=(not ok and probecache
                                      .is_transient_error(probe_err)))
        _PROBE_CACHE[shape_key] = ok
        if not ok:
            return None

    bi = program.buckets.index(bk)
    program.register_const(f"plinz.b{bi}.dat", dat)
    program.register_const(f"plinz.b{bi}.mask",
                           np.ascontiguousarray(maskp))

    def lin(x):
        params = program._bucket_params(bk, x)         # [n, amb] per slot
        xin = jnp.concatenate(
            [p.astype(jnp.float32).T for p in params], axis=0)  # [P_in, n]
        xin = jnp.pad(xin, ((0, 0), (0, n_pad - n)),
                      mode="edge" if pad_mode == "edge" else "constant")
        xin = xin.reshape(P_in, GS, tile)
        r_pl, j_pl = call(xin, program.const(f"plinz.b{bi}.dat"),
                          program.const(f"plinz.b{bi}.mask"))
        r = r_pl.reshape(R, n_pad).T[:n]                       # [n, R]
        J = j_pl.reshape(R, nt, n_pad).transpose(2, 0, 1)[:n]  # [n, R, nt]
        return r, J

    return lin
