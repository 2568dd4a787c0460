"""jaxpr -> jetlib auto-compiler: the fully generic fast-autodiff path.

The reference's Jet machinery delivers compiled-native forward-mode AD for
ANY user functor (include/ceres/internal/autodiff.h:307, jet.h:211). The
hand-written Pallas specializations (ops/pallas_linearize.py _REGISTRY)
cover three functor classes; this module generalizes them to arbitrary
functors: the bucket's composed residual program (manifold Plus included,
exactly the jacfwd path's g(deltas) closure in program.py
_bucket_linearize) is traced ONCE to a jaxpr, and that jaxpr is then
re-evaluated inside the Pallas kernel with sparse jets on [S, T] VPU
planes (ops/jetlib.py) instead of scalars. Tracing happens at build time
on the host; the interpreter runs at kernel-trace time, so the emitted
Mosaic kernel is exactly what a hand-written jet program would be — the
hand entries in _REGISTRY remain as overrides.

Representation: every jaxpr value is a numpy object-ndarray of _Jet
(rank 0..k). Elementwise primitives map through jetlib's chain rules via
numpy broadcasting (the _Jet operator overloads make np.dot /
np.add.reduce work directly); structural primitives (reshape, slice,
concatenate, transpose, broadcast_in_dim) are plain numpy object-array
manipulations — free at kernel-trace time. Unsupported primitives
(data-dependent control flow, gathers) make the bucket fall back to the
jacfwd path; the failure is reported once per functor class.

Masked-lane NaN discipline: padding rows REPLICATE the last real row
(edge padding, set up by ops/pallas_linearize.py for auto specs) so pad
lanes compute the same finite values as a real row and the output mask
zeroes them — the generic analog of the hand kernels' per-shape valid
masking (jetlib.py:152-161 rationale).
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax.extend import core as jcore          # jax >= 0.4.33
except ImportError:                               # pragma: no cover
    from jax import core as jcore

from .jetlib import (
    _Jet, _jc, _p, _jadd, _jsub, _jneg, _jmul, _jdiv, _jsqrt, _jwhere,
    _jexp, _jlog, _jlog1p, _jexpm1, _jrsqrt, _jcbrt, _jtan, _jasin,
    _jacos, _jatan, _jsinh, _jcosh, _jtanh, _jasinh, _jacosh, _jatanh,
    _jerf, _jerfc, _jlogistic, _jabs, _jatan2, _jpow, _jintpow, _jmax,
    _jmin, _jchain,
)

__all__ = ["make_auto_spec"]

_WARNED: set = set()


def _warn_once(key, msg):
    if key not in _WARNED:
        _WARNED.add(key)
        print(f"ceres_tpu: {msg}", file=sys.stderr)


# ----------------------------------------------------------------------
# object-array helpers

def _obj0(jet):
    a = np.empty((), dtype=object)
    a[()] = jet
    return a


def _as_obj(x):
    return x if isinstance(x, np.ndarray) else _obj0(x)


def _map(f, *arrs):
    """Elementwise-with-broadcast over object arrays."""
    out = np.frompyfunc(f, len(arrs), 1)(*[_as_obj(a) for a in arrs])
    return _as_obj(out)


def _const_to_obj(val):
    """Wrap a concrete constant (jaxpr const / literal) as constant jets.

    Float entries become f32 scalars; values stay NUMPY scalars (not jnp)
    so chains of constant arithmetic remain concrete even inside the
    Pallas kernel trace (stackless JAX traces jnp ops on concrete values
    too) — gather/dynamic_slice indices must reach _concrete_ints
    un-traced."""
    a = np.asarray(val)
    if a.dtype.kind == "f":
        a = a.astype(np.float32)
    out = np.empty(a.shape, dtype=object)
    flat, of = a.reshape(-1), out.reshape(-1)
    for i in range(flat.size):
        of[i] = _Jet(flat[i])
    return out


def _try_np(v):
    """Concrete numpy view of a value, or None if traced."""
    try:
        return np.asarray(v)
    except Exception:
        return None


def _v(jet):
    return jet.v


# ----------------------------------------------------------------------
# primitive rules: rule(params, *in_obj_arrays) -> obj array (or list)

def _ew(f):
    return lambda params, *a: _map(f, *a)


def _cmp(op):
    return lambda params, a, b: _map(
        lambda x, y: _Jet(op(x.v, y.v)), a, b)


def _rule_integer_pow(params, a):
    n = params["y"]
    return _map(lambda x: _jintpow(x, n), a)


def _rule_select_n(params, which, *cases):
    if len(cases) != 2:
        raise _Unsupported("select_n with >2 cases")

    def sel(c, f, t):
        if not (c.d or f.d or t.d):
            cn, fn, tn = _try_np(c.v), _try_np(f.v), _try_np(t.v)
            if cn is not None and fn is not None and tn is not None:
                return _Jet(np.where(cn, tn, fn)[()])
        return _jwhere(c.v, t, f)

    return _map(sel, which, *cases)


def _rule_clamp(params, lo, x, hi):
    return _map(lambda l, v, h: _jmin(_jmax(v, l), h), lo, x, hi)


def _rule_convert(params, a):
    tgt = np.dtype(params["new_dtype"])
    if tgt.kind == "f":
        def cv(j):
            v = j.v
            nv = None if j.d else _try_np(v)
            if nv is not None:
                return _Jet(nv.astype(np.float32)[()])
            if getattr(v, "dtype", None) is not None and v.dtype.kind == "b":
                v = jnp.where(v, jnp.float32(1.0), jnp.float32(0.0))
            else:
                v = jnp.asarray(v, jnp.float32)
            return _Jet(v, dict(j.d))
    else:
        def cv(j):
            nv = _try_np(j.v)
            if nv is not None:
                return _Jet(nv.astype(tgt)[()])
            return _Jet(jnp.asarray(j.v, tgt))
    return _map(cv, a)


def _rule_broadcast_in_dim(params, a):
    a = _as_obj(a)
    shape = tuple(params["shape"])
    bdims = tuple(params["broadcast_dimensions"])
    interim = [1] * len(shape)
    for src, dst in enumerate(bdims):
        interim[dst] = a.shape[src]
    return np.broadcast_to(a.reshape(interim), shape).copy()


def _rule_reshape(params, a):
    a = _as_obj(a)
    dims = params.get("dimensions")
    if dims is not None:
        a = a.transpose(dims)
    return a.reshape(tuple(params["new_sizes"]))


def _rule_transpose(params, a):
    return _as_obj(a).transpose(tuple(params["permutation"]))


def _rule_squeeze(params, a):
    return np.squeeze(_as_obj(a), axis=tuple(params["dimensions"]))


def _rule_slice(params, a):
    a = _as_obj(a)
    st = params.get("strides") or (1,) * a.ndim
    idx = tuple(slice(s, l, t) for s, l, t in
                zip(params["start_indices"], params["limit_indices"], st))
    return a[idx]


def _rule_concatenate(params, *arrs):
    return np.concatenate([_as_obj(a) for a in arrs],
                          axis=params["dimension"])


def _rule_rev(params, a):
    return np.flip(_as_obj(a), axis=tuple(params["dimensions"]))


def _rule_reduce_sum(params, a):
    a = _as_obj(a)
    for ax in sorted(params["axes"], reverse=True):
        a = _as_obj(np.add.reduce(a, axis=ax))
    return a


def _rule_reduce_prod(params, a):
    a = _as_obj(a)
    for ax in sorted(params["axes"], reverse=True):
        a = _as_obj(np.multiply.reduce(a, axis=ax))
    return a


def _fold_reduce(a, axes, f):
    a = _as_obj(a)
    for ax in sorted(axes, reverse=True):
        parts = np.moveaxis(a, ax, 0)
        acc = parts[0]
        for i in range(1, parts.shape[0]):
            acc = _map(f, acc, parts[i])
        a = _as_obj(acc)
    return a


def _rule_reduce_max(params, a):
    return _fold_reduce(a, params["axes"], _jmax)


def _rule_reduce_min(params, a):
    return _fold_reduce(a, params["axes"], _jmin)


def _rule_dot_general(params, a, b):
    (lc, rc), (lb, rb) = params["dimension_numbers"]
    a, b = _as_obj(a), _as_obj(b)
    if not lb:
        return _as_obj(np.tensordot(a, b, axes=(tuple(lc), tuple(rc))))
    # batch dims: loop (functor-sized shapes; host trace time only)
    a_bt = np.moveaxis(a, lb, range(len(lb)))
    b_bt = np.moveaxis(b, rb, range(len(rb)))
    lc2 = [d - sum(1 for x in lb if x < d) for d in lc]
    rc2 = [d - sum(1 for x in rb if x < d) for d in rc]
    bshape = a_bt.shape[:len(lb)]
    outs = [np.tensordot(a_bt[i], b_bt[i], axes=(tuple(lc2), tuple(rc2)))
            for i in np.ndindex(bshape)]
    out0 = _as_obj(outs[0])
    res = np.empty(bshape + out0.shape, dtype=object)
    for i, o in zip(np.ndindex(bshape), outs):
        res[i] = o
    return res


def _rule_iota(params, *_):
    n = int(np.prod(params["shape"]))
    dim = params["dimension"]
    shape = tuple(params["shape"])
    out = np.empty(shape, dtype=object)
    for idx in np.ndindex(shape):
        out[idx] = _Jet(np.float32(idx[dim]))
    del n
    return out


def _rule_pad(params, a, pv):
    cfg = params["padding_config"]
    a = _as_obj(a)
    pad_jet = _as_obj(pv).reshape(-1)[0]
    if any(lo < 0 or hi < 0 or interior != 0 for lo, hi, interior in cfg):
        raise _Unsupported("pad with negative/interior padding")
    out_shape = tuple(d + lo + hi for d, (lo, hi, _) in zip(a.shape, cfg))
    out = np.empty(out_shape, dtype=object)
    out[...] = pad_jet
    idx = tuple(slice(lo, lo + d) for d, (lo, hi, _) in zip(a.shape, cfg))
    out[idx] = a
    return out


def _rule_stop_gradient(params, a):
    return _map(lambda j: _Jet(j.v), a)


def _concrete_ints(obj_arr):
    """Extract a concrete integer numpy array from an object array of
    constant jets; raises _Unsupported on traced values."""
    obj_arr = _as_obj(obj_arr)
    out = np.empty(obj_arr.shape, dtype=np.int64)
    for idx in np.ndindex(obj_arr.shape):
        try:
            out[idx] = int(obj_arr[idx].v)
        except Exception:
            raise _Unsupported("selection with traced indices")
    return out


def _selection_rule(prim):
    """Generic rule for pure-selection primitives (gather, dynamic_slice,
    take): every output element is exactly one input element, so running
    the primitive on an arange-of-positions array (concrete, at kernel-
    trace time) yields the input->output permutation to apply to the
    object array. Requires concrete (constant) indices."""

    def rule(eqn_params, operand, *index_ops):
        operand = _as_obj(operand)
        idx_concrete = [_concrete_ints(io) for io in index_ops]
        pos = np.arange(operand.size, dtype=np.int32).reshape(operand.shape)
        # eval_context: escape the ambient (kernel) trace so this concrete
        # index computation runs eagerly instead of being traced
        with jax.core.eval_context():
            out_pos = np.asarray(prim.bind(
                jnp.asarray(pos), *[jnp.asarray(i, jnp.int32)
                                    for i in idx_concrete], **eqn_params))
        return operand.reshape(-1)[out_pos.reshape(-1)].reshape(
            out_pos.shape)

    return rule


def _drop(fname):
    """Zero-derivative unary (floor/ceil/round/sign/is_finite)."""
    f = getattr(jnp, fname)
    return lambda params, a: _map(lambda j: _Jet(f(j.v)), a)


def _logical(op):
    return lambda params, *a: _map(
        lambda *js: _Jet(op(*[j.v for j in js])), *a)


class _Unsupported(Exception):
    pass


_RULES = {
    "add": _ew(_jadd), "sub": _ew(_jsub), "mul": _ew(_jmul),
    "div": _ew(_jdiv), "neg": _ew(_jneg), "pow": _ew(_jpow),
    "max": _ew(_jmax), "min": _ew(_jmin), "atan2": _ew(_jatan2),
    "sqrt": _ew(_jsqrt), "rsqrt": _ew(_jrsqrt), "cbrt": _ew(_jcbrt),
    "exp": _ew(_jexp), "log": _ew(_jlog), "log1p": _ew(_jlog1p),
    "expm1": _ew(_jexpm1), "sin": _ew(lambda a: _jchain(
        a, jnp.sin(a.v), jnp.cos(a.v))),
    "cos": _ew(lambda a: _jchain(a, jnp.cos(a.v), -jnp.sin(a.v))),
    "tan": _ew(_jtan), "asin": _ew(_jasin), "acos": _ew(_jacos),
    "atan": _ew(_jatan), "sinh": _ew(_jsinh), "cosh": _ew(_jcosh),
    "tanh": _ew(_jtanh), "asinh": _ew(_jasinh), "acosh": _ew(_jacosh),
    "atanh": _ew(_jatanh), "erf": _ew(_jerf), "erfc": _ew(_jerfc),
    "logistic": _ew(_jlogistic), "abs": _ew(_jabs),
    "square": _ew(lambda a: _jintpow(a, 2)),
    "integer_pow": _rule_integer_pow,
    "sign": _drop("sign"), "floor": _drop("floor"),
    "ceil": _drop("ceil"), "round": _drop("rint"),
    "is_finite": _drop("isfinite"),
    # operator forms preserve concreteness (stackless-trace safe)
    "not": _logical(lambda x: ~np.asarray(x) if _try_np(x) is not None
                    else jnp.logical_not(x)),
    "and": _logical(lambda x, y: x & y), "or": _logical(lambda x, y: x | y),
    "xor": _logical(lambda x, y: x ^ y),
    "lt": _cmp(lambda x, y: x < y), "le": _cmp(lambda x, y: x <= y),
    "gt": _cmp(lambda x, y: x > y), "ge": _cmp(lambda x, y: x >= y),
    "eq": _cmp(lambda x, y: x == y), "ne": _cmp(lambda x, y: x != y),
    "select_n": _rule_select_n, "clamp": _rule_clamp,
    "convert_element_type": _rule_convert,
    "broadcast_in_dim": _rule_broadcast_in_dim,
    "reshape": _rule_reshape, "transpose": _rule_transpose,
    "squeeze": _rule_squeeze, "slice": _rule_slice,
    "concatenate": _rule_concatenate, "rev": _rule_rev,
    "reduce_sum": _rule_reduce_sum, "reduce_prod": _rule_reduce_prod,
    "reduce_max": _rule_reduce_max, "reduce_min": _rule_reduce_min,
    "dot_general": _rule_dot_general, "iota": _rule_iota,
    "pad": _rule_pad, "stop_gradient": _rule_stop_gradient,
    "copy": lambda params, a: a,
}

# primitives inlined by evaluating their inner jaxpr with the same jets.
# custom_jvp_call is deliberately NOT here: inlining its primal jaxpr
# would jet-differentiate the primal and IGNORE the user-supplied JVP
# rule (edge-point safety, intentional gradient overrides), a silent
# parity divergence vs the jacfwd path — _validate marks it unsupported
# and the bucket falls back to jacfwd, which honors the custom rule.
# custom_vjp's primal IS inlined: it overrides only reverse-mode, and
# the forward-mode fallback (jacfwd) cannot differentiate it at all.
_INLINE = {"pjit", "jit", "closed_call", "core_call", "remat", "checkpoint",
           "custom_vjp_call_jaxpr", "custom_vjp_call"}

# pure-selection primitives handled by the arange-position trick
# (_selection_rule); indices must be compile-time constants
_SELECTION = {"gather", "dynamic_slice", "take"}


def _inner_jaxpr(eqn):
    p = eqn.params
    for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
        if key in p and p[key] is not None:
            return p[key]
    return None


def _eval_jaxpr_jets(jaxpr, consts, args):
    """Interpret a jaxpr with object-arrays of _Jet."""
    env = {}

    def read(var):
        if isinstance(var, jcore.Literal):
            return _const_to_obj(var.val)
        return env[var]

    for v, c in zip(jaxpr.constvars, consts):
        env[v] = _const_to_obj(c)
    for v, a in zip(jaxpr.invars, args):
        env[v] = _as_obj(a)
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        invals = [read(v) for v in eqn.invars]
        if name in _INLINE:
            inner = _inner_jaxpr(eqn)
            if inner is None:
                raise _Unsupported(name)
            cj = inner if hasattr(inner, "jaxpr") else None
            nc = eqn.params.get("num_consts", 0)
            if cj is not None:
                outs = _eval_jaxpr_jets(cj.jaxpr, cj.consts, invals[nc:])
            else:
                outs = _eval_jaxpr_jets(inner, [], invals[nc:])
        elif name in _SELECTION:
            outs = [_selection_rule(eqn.primitive)(eqn.params, *invals)]
        else:
            rule = _RULES.get(name)
            if rule is None:
                raise _Unsupported(name)
            out = rule(eqn.params, *invals)
            outs = out if eqn.primitive.multiple_results else [out]
        for v, o in zip(eqn.outvars, outs):
            env[v] = _as_obj(o)
    return [read(v) for v in jaxpr.outvars]


def _validate(jaxpr):
    """Pre-flight walk: every primitive supported (recursing into inlined
    calls). Returns the sorted set of unsupported names (empty = ok)."""
    bad = set()
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in _INLINE:
            inner = _inner_jaxpr(eqn)
            if inner is None:
                bad.add(name)
            else:
                bad |= _validate(inner.jaxpr
                                 if hasattr(inner, "jaxpr") else inner)
        elif name not in _RULES and name not in _SELECTION:
            bad.add(name)
    return bad


# ----------------------------------------------------------------------
# bucket tracing

def make_auto_spec(program, bk):
    """Trace bk's composed residual program (functor + manifold Plus, the
    exact g(deltas) closure of program.py _bucket_linearize's jacfwd path)
    to a jaxpr and return a pallas_linearize-compatible auto spec, or
    None when the functor uses primitives outside the jet interpreter
    (data-dependent control flow, gathers, ...) — the caller falls back
    to jacfwd. Cached per (program, bucket)."""
    cache = getattr(program, "_autojet_specs", None)
    if cache is None:
        cache = program._autojet_specs = {}
    if id(bk) in cache:
        return cache[id(bk)]
    spec = _build_auto_spec(program, bk)
    cache[id(bk)] = spec
    return spec


def _build_auto_spec(program, bk):
    fn = bk.residual_fn
    leaves, treedef = jax.tree_util.tree_flatten(bk.data)
    n = bk.n
    leaf_shapes = []
    for leaf in leaves:
        a = np.asarray(leaf)
        if a.dtype.kind != "f" or a.shape[:1] != (n,):
            return None
        leaf_shapes.append(a.shape[1:])
    var_slots = [(i, sl) for i, sl in enumerate(bk.slots) if sl.variable]
    if not var_slots:
        return None
    nt = sum(sl.tangent_size for _, sl in var_slots)
    L, S = len(leaves), len(bk.slots)

    def per_row(*flat):
        data = jax.tree_util.tree_unflatten(treedef, flat[:L])
        ps = list(flat[L:L + S])
        deltas = flat[L + S:]
        for k, (i, sl) in enumerate(var_slots):
            if sl.manifold is None:
                ps[i] = ps[i] + deltas[k]
            else:
                ps[i] = sl.manifold.plus(ps[i], deltas[k])
        return fn(data, *ps)

    args = ([jnp.zeros(s, jnp.float32) for s in leaf_shapes]
            + [jnp.zeros((sl.amb_size,), jnp.float32) for sl in bk.slots]
            + [jnp.zeros((sl.tangent_size,), jnp.float32)
               for _, sl in var_slots])
    try:
        with jax.enable_x64(False):
            closed = jax.make_jaxpr(per_row)(*args)
    except Exception as e:
        _warn_once(("trace", _functor_name(bk)),
                   f"autojet: tracing {_functor_name(bk)} failed "
                   f"({type(e).__name__}); using the jacfwd path")
        return None
    bad = _validate(closed.jaxpr)
    if bad:
        _warn_once(("prims", _functor_name(bk), tuple(sorted(bad))),
                   f"autojet: {_functor_name(bk)} uses primitives outside "
                   f"the jet interpreter ({', '.join(sorted(bad))}); "
                   "using the jacfwd path")
        return None
    out_avals = closed.jaxpr.outvars
    if len(out_avals) != 1 or tuple(out_avals[0].aval.shape) != (bk.r,):
        return None

    widths = [int(np.prod(s, dtype=np.int64)) if s else 1
              for s in leaf_shapes]

    def data_parts(bucket):
        lv, _ = jax.tree_util.tree_flatten(bucket.data)
        return [np.asarray(x, np.float32).reshape(n, -1) for x in lv]

    slot_sizes = [sl.amb_size for sl in bk.slots]
    tan_sizes = [sl.tangent_size for _, sl in var_slots]

    def emit_raw(xin_planes, dat_planes, mask):
        args_o = []
        off = 0
        for shape, w in zip(leaf_shapes, widths):
            arr = np.empty((w,), dtype=object)
            for i in range(w):
                arr[i] = _Jet(dat_planes[off + i])
            args_o.append(arr.reshape(shape))
            off += w
        p0 = 0
        for amb in slot_sizes:
            arr = np.empty((amb,), dtype=object)
            for a in range(amb):
                arr[a] = _Jet(xin_planes[p0 + a])
            args_o.append(arr)
            p0 += amb
        zero = jnp.zeros_like(mask)
        ch0 = 0
        for t in tan_sizes:
            arr = np.empty((t,), dtype=object)
            for k in range(t):
                arr[k] = _Jet(zero, {ch0 + k: None})
            args_o.append(arr)
            ch0 += t
        outs = _eval_jaxpr_jets(closed.jaxpr, closed.consts, args_o)
        return list(_as_obj(outs[0]).reshape(-1))

    import hashlib
    digest = hashlib.blake2s(str(closed.jaxpr).encode()).hexdigest()[:16]

    return dict(
        match=lambda p, b: True,
        emit_raw=emit_raw,
        data_parts=data_parts,
        data_widths=widths,
        nt=nt,
        pad_mode="edge",
        name=f"auto:{_functor_name(bk)}",
        digest=digest,
    )


def _functor_name(bk):
    try:
        return type(bk.cost.functor).__name__
    except Exception:
        return type(bk.cost).__name__


def autojet_enabled() -> bool:
    if os.environ.get("CERES_TPU_NO_AUTOJET"):
        return False
    return True
