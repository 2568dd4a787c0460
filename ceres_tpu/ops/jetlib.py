"""Sparse forward-mode jet algebra on VPU planes — the shared kernel
language of the Pallas specializations (ops/pallas_lin.py and
ops/pallas_linearize.py).

The reference implements forward-mode AD as Jet<T, N> dual numbers
(include/ceres/jet.h:211) and instantiates cost functors on them
(autodiff_cost_function.h:156). Here the same design is hand-vectorized
for Mosaic: a jet is (value_plane, {channel: partial_plane}) where every
plane is a [sublanes, lanes] f32 array with rows on lanes, and missing
channels are structurally ZERO partials — sparsity decays naturally
through the chain, so early math costs only the active channels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

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

    # Operator overloads so numpy object-array arithmetic (np.dot,
    # np.add.reduce, broadcasting elementwise ops) works directly on jet
    # arrays — the jaxpr auto-compiler (ops/jet_compile.py) relies on
    # this. Non-jet operands are plain planes/scalars (no partials).
    def __add__(self, o):
        return _jadd(self, o) if isinstance(o, _Jet) else _jshift(self, o)

    __radd__ = __add__

    def __sub__(self, o):
        return (_jsub(self, o) if isinstance(o, _Jet)
                else _jshift(self, -o))

    def __rsub__(self, o):
        return _jshift(_jneg(self), o)

    def __mul__(self, o):
        return _jmul(self, o) if isinstance(o, _Jet) else _jscale(self, o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        return (_jdiv(self, o) if isinstance(o, _Jet)
                else _jscale(self, 1.0 / o))

    def __rtruediv__(self, o):
        return _jdiv(_jc(o), self)

    def __neg__(self):
        return _jneg(self)


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


# ----------------------------------------------------------------------
# Extended math-function set (reference jet.h:527-982 cmath overloads),
# used by the jaxpr auto-compiler (ops/jet_compile.py). Each applies the
# scalar chain rule to every active channel; functions with zero
# derivative (floor/ceil/round/sign) drop all partials.

def _jchain(a, v, dv):
    """Jet with value v and partials dv * da for every channel of a."""
    return _Jet(v, {c: _p(p) * dv for c, p in a.d.items()})


def _jexp(a):
    v = jnp.exp(a.v)
    return _jchain(a, v, v)


def _jlog(a):
    return _jchain(a, jnp.log(a.v), 1.0 / a.v)


def _jlog1p(a):
    return _jchain(a, jnp.log1p(a.v), 1.0 / (1.0 + a.v))


def _jexpm1(a):
    v = jnp.expm1(a.v)
    return _jchain(a, v, v + 1.0)


def _jrsqrt(a):
    v = jax.lax.rsqrt(a.v)
    return _jchain(a, v, -0.5 * v / a.v)


def _jcbrt(a):
    v = jnp.cbrt(a.v)
    return _jchain(a, v, 1.0 / (3.0 * v * v))


def _jtan(a):
    c = jnp.cos(a.v)
    return _jchain(a, jnp.tan(a.v), 1.0 / (c * c))


def _jasin(a):
    return _jchain(a, jnp.arcsin(a.v),
                   jax.lax.rsqrt(jnp.maximum(1.0 - a.v * a.v, 0.0)))


def _jacos(a):
    return _jchain(a, jnp.arccos(a.v),
                   -jax.lax.rsqrt(jnp.maximum(1.0 - a.v * a.v, 0.0)))


def _jatan(a):
    return _jchain(a, jnp.arctan(a.v), 1.0 / (1.0 + a.v * a.v))


def _jsinh(a):
    return _jchain(a, jnp.sinh(a.v), jnp.cosh(a.v))


def _jcosh(a):
    return _jchain(a, jnp.cosh(a.v), jnp.sinh(a.v))


def _jtanh(a):
    v = jnp.tanh(a.v)
    return _jchain(a, v, 1.0 - v * v)


def _jasinh(a):
    return _jchain(a, jnp.arcsinh(a.v),
                   jax.lax.rsqrt(a.v * a.v + 1.0))


def _jacosh(a):
    return _jchain(a, jnp.arccosh(a.v),
                   jax.lax.rsqrt(jnp.maximum(a.v * a.v - 1.0, 0.0)))


def _jatanh(a):
    return _jchain(a, jnp.arctanh(a.v), 1.0 / (1.0 - a.v * a.v))


def _jerf(a):
    two_over_sqrt_pi = 1.1283791670955126
    return _jchain(a, jax.lax.erf(a.v),
                   two_over_sqrt_pi * jnp.exp(-a.v * a.v))


def _jerfc(a):
    two_over_sqrt_pi = 1.1283791670955126
    return _jchain(a, jax.lax.erfc(a.v),
                   -two_over_sqrt_pi * jnp.exp(-a.v * a.v))


def _jlogistic(a):
    v = jax.nn.sigmoid(a.v)
    return _jchain(a, v, v * (1.0 - v))


def _jabs(a):
    return _jchain(a, jnp.abs(a.v), jnp.sign(a.v))


def _jatan2(y, x):
    """atan2(y, x) jet (reference jet.h atan2): d = (x dy - y dx)/(x²+y²)."""
    denom = x.v * x.v + y.v * y.v
    cy = x.v / denom
    cx = -y.v / denom
    d = {c: _p(p) * cy for c, p in y.d.items()}
    for c, p in x.d.items():
        t = _p(p) * cx
        d[c] = t if c not in d else d[c] + t
    return _Jet(jnp.arctan2(y.v, x.v), d)


def _jpow(a, b):
    """a^b for jets (reference jet.h pow): the full bivariate rule."""
    v = jnp.power(a.v, b.v)
    da = b.v * jnp.power(a.v, b.v - 1.0)
    d = {c: _p(p) * da for c, p in a.d.items()}
    if b.d:
        db = v * jnp.log(a.v)
        for c, p in b.d.items():
            t = _p(p) * db
            d[c] = t if c not in d else d[c] + t
    return _Jet(v, d)


def _jintpow(a, n):
    n = int(n)
    if n == 0:
        return _jc(jnp.ones_like(a.v))
    v = a.v ** n
    return _jchain(a, v, n * a.v ** (n - 1))


def _jmax(a, b):
    return _jwhere(a.v >= b.v, a, b)


def _jmin(a, b):
    return _jwhere(a.v <= b.v, a, b)


def _jet_planes(jet, mask, nt):
    """Dense [nt] list of masked partial planes + masked value plane."""
    cols = []
    for c in range(nt):
        if c in jet.d:
            cols.append(_p(jet.d[c]) * mask)
        else:
            cols.append(None)
    return jet.v * mask, cols


