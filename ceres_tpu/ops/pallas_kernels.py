"""Pallas TPU kernels for the hot block-sparse operations.

The reference hand-tunes these loops in C++/CUDA (small_blas.h fixed-size
GEMMs, cuda_kernels_* for the CUDA path). On TPU the XLA gather/einsum/
scatter lowering is already good; the kernels here capture the wins XLA
cannot: reading the bucket Jacobian from HBM ONCE for the normal-equations
product u = J^T (J v) (two XLA einsums read J twice — at large BAL scale J
is hundreds of MB and this op dominates every CG iteration).

Layout: a bucket's J is [n, r, t]; the kernel processes row tiles of
TILE_N blocks reshaped to [TILE_N, r*t] (lane-dim friendly), with the
per-row gathered v values [TILE_N, t] prepared by XLA (gather stays outside
— dynamic VMEM gather is not a Mosaic strength; the J traffic is the prize).

Enable with use_pallas=True on the CGNR path or CERES_TPU_PALLAS=1.
Falls back to pure-XLA einsums on CPU (tests run the kernel in interpret
mode for correctness).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret():
    return jax.default_backend() != "tpu"


def _bind32(call, *args):
    """Trace a pallas_call with x64 scoped OFF — but only when actually
    targeting Mosaic. Under jax_enable_x64 the pallas grid/index-map
    plumbing emits i64 scalars the Mosaic TPU compiler cannot legalize
    ("failed to legalize operation 'func.return'" on an i64); the TPU
    kernels here are f32, so scoping x64 off around the bind changes
    nothing numerically on device. In interpret mode (CPU tests) Mosaic
    is not involved and the scope must stay ON: disabling it makes the
    traced kernel body compute f32 values against the caller's f64 refs
    ("Invalid dtype for swap"), which is exactly the round-2 breakage."""
    if _use_interpret():
        return call(*args)
    with jax.enable_x64(False):
        return call(*args)


def pallas_enabled() -> bool:
    """Explicit opt-in (CERES_TPU_PALLAS=1) — forces the kernels even on
    non-f32 data; see jtjv_default_on for the TPU auto-enable."""
    if os.environ.get("CERES_TPU_NO_PALLAS"):
        return False
    return bool(os.environ.get("CERES_TPU_PALLAS"))


_JTJV_PROBE_CACHE: dict = {}


def jtjv_default_on(jac) -> bool:
    """Auto-enable the single-pass J^T(Jv) kernel in the CGNR loop: TPU
    backend, every bucket f32 (the mixed-precision pipeline — the
    kernels are f32), every bucket shape accepted by Mosaic (probed once
    per shape, host-side; a rejected shape keeps the two-einsum path
    rather than failing the solve compile). The HBM win is reading J
    once instead of twice per CG iteration (cgnr_solver.cc reads A twice
    there too)."""
    if os.environ.get("CERES_TPU_NO_PALLAS"):
        return False
    if pallas_enabled():
        return True
    if jax.default_backend() != "tpu" or not all(
            b.J.dtype == jnp.float32 for b in jac.buckets):
        return False
    # The single-pass win is HBM traffic on J; below ~64 MB of J the CG
    # iteration is gather/launch-bound and the kernel measures a small
    # LOSS (FoE 96x96 A/B: 0.95x). Auto-enable only when J is large.
    j_bytes = sum(int(np.prod(b.J.shape)) * 4 for b in jac.buckets)
    if j_bytes < 64 * 1024 * 1024:
        return False
    for b in jac.buckets:
        n, r, t = b.J.shape
        key = (r, t, jax.default_backend())
        ok = _JTJV_PROBE_CACHE.get(key)
        if ok is None:
            from ..utils import probecache
            ok = probecache.get(("jtjv",) + key)
        if ok is None:
            try:
                jax.jit(bucket_jtjv).lower(
                    jax.ShapeDtypeStruct((max(n, 1), r, t), jnp.float32),
                    jax.ShapeDtypeStruct((max(n, 1), t), jnp.float32),
                ).compile()
                ok = True
            except Exception as e:
                ok = False
                probe_err = e
            from ..utils import probecache
            probecache.put(("jtjv",) + key, ok,
                           transient=(not ok and probecache
                                      .is_transient_error(probe_err)))
        _JTJV_PROBE_CACHE[key] = ok
        if not ok:
            return False
    return True


def _jtjv_kernel(jt_ref, vb_ref, u_ref, *, r: int, t: int):
    """One row tile: u = J^T (J v) with J read once, in PLANE layout —
    channels on sublanes, rows on lanes (the jetlib convention). The
    earlier [TILE_N, r*t] row-major form needed an in-kernel reshape of
    the minor dims, which the Mosaic TPU compiler rejects for small r*t.

    jt_ref: [r*t, T]  flattened block Jacobians, channel-major
    vb_ref: [t, T]    gathered v values per block
    u_ref:  [t, T]    output contributions (scattered by caller)
    """
    w = []
    for rr in range(r):
        acc = None
        for c in range(t):
            term = jt_ref[rr * t + c, :] * vb_ref[c, :]
            acc = term if acc is None else acc + term
        w.append(acc)
    for c in range(t):
        acc = None
        for rr in range(r):
            term = jt_ref[rr * t + c, :] * w[rr]
            acc = term if acc is None else acc + term
        u_ref[c, :] = acc


def bucket_jtjv(J, vb, tile_n: int = 2048):
    """u[n, t] = J_n^T (J_n vb_n) for a bucket of block Jacobians.

    J: [n, r, t]; vb: [n, t] (already gathered). Rows are padded to the
    lane tile and live on lanes inside the kernel.
    """
    n, r, t = J.shape
    n_pad = int(np.ceil(n / tile_n) * tile_n)
    JT = J.reshape(n, r * t).T                       # [r*t, n]
    vbT = vb.T                                       # [t, n]
    if n_pad != n:
        JT = jnp.pad(JT, ((0, 0), (0, n_pad - n)))
        vbT = jnp.pad(vbT, ((0, 0), (0, n_pad - n)))

    out = pl.pallas_call(
        functools.partial(_jtjv_kernel, r=r, t=t),
        out_shape=jax.ShapeDtypeStruct((t, n_pad), J.dtype),
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((r * t, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * r * t,
            bytes_accessed=(n_pad * r * t + 2 * n_pad * t) * J.dtype.itemsize,
            transcendentals=0),
    )
    out = _bind32(out, JT, vbT)
    return out[:, :n].T


def jac_normal_matvec(jac, v, use_pallas: bool = True):
    """(J^T J) v over the bucketed BlockJacobian with single-pass J reads.

    Replaces jac.rmatvec(jac.matvec(v)) in the CGNR inner loop
    (cgnr_solver.cc's z = A^T A x, reference reads A twice there too)."""
    out = jnp.zeros((jac.num_cols,), dtype=jac.buckets[0].J.dtype)
    for b in jac.buckets:
        cols = b.all_cols
        vb = v[cols]                                 # [n, t]
        if use_pallas:
            u = bucket_jtjv(b.J, vb)
        else:
            w = jnp.einsum("nrt,nt->nr", b.J, vb)
            u = jnp.einsum("nrt,nr->nt", b.J, w)
        out = out.at[cols].add(u)
    return out


def _chol_solve_kernel(s_ref, b_ref, y_ref, u_ref, *, m: int):
    """Solve S y = b for one SPD [P, P] system entirely in VMEM.

    XLA's lax.linalg Cholesky/triangular-solve lowering is blocked for
    LAPACK-scale matrices; on a [144,144] Schur complement it costs ~3.5 ms
    on a v5e. Here: unblocked right-looking Cholesky (rows of U = L^T kept
    in a VMEM scratch, one outer-product update per column) + two
    substitution loops — O(P) tiny VPU steps, no HBM traffic.

    Padding: rows/cols >= m carry identity (set by the caller), so the
    factorization is exact for the leading m x m block. Indefinite S yields
    NaN through sqrt, which the LM invalid-step retry expects.
    """
    P = s_ref.shape[0]
    dt = s_ref.dtype
    # Explicit 32-bit index/zero types throughout: under jax_enable_x64 the
    # default literals become 64-bit, which Mosaic cannot lower.
    i32 = jnp.int32
    zero = jnp.zeros((), dtype=dt)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    u_ref[:] = s_ref[:]

    # ---- Cholesky: U (upper) s.t. U^T U = S ----
    def chol_body(j, _):
        row = u_ref[pl.ds(j, 1), :]                           # [1, P]
        onehot = (cols == j)
        piv = jnp.sum(jnp.where(onehot, row, zero))
        d = jnp.sqrt(piv)
        urow = jnp.where(cols > j, row / d, zero)
        urow = jnp.where(onehot, d, urow)                     # [1, P]
        # trailing update: U[i, :] -= u_col[i] * urow; rows <= j have
        # u_col == 0 via the strict mask, so they are untouched.
        u_col = jnp.transpose(jnp.where(cols > j, urow, zero))  # [P, 1]
        u_ref[:] = u_ref[:] - u_col * urow
        u_ref[pl.ds(j, 1), :] = urow
        return _

    jax.lax.fori_loop(i32(0), i32(m), chol_body, i32(0))

    # ---- forward substitution: solve U^T z = b (column-oriented) ----
    b = b_ref[:]                                              # [1, P]

    def fwd_body(j, carry):
        acc, z = carry
        onehot = (cols == j)
        urow = u_ref[pl.ds(j, 1), :]
        d = jnp.sum(jnp.where(onehot, urow, zero))
        zj = jnp.sum(jnp.where(onehot, acc, zero)) / d
        acc = acc - zj * jnp.where(cols > j, urow, zero)
        z = jnp.where(onehot, zj, z)
        return acc, z

    _, z = jax.lax.fori_loop(i32(0), i32(m), fwd_body,
                             (b, jnp.zeros_like(b)))

    # ---- back substitution: solve U y = z (row-oriented, descending) ----
    def bwd_body(i, y):
        j = i32(m - 1) - i
        onehot = (cols == j)
        urow = u_ref[pl.ds(j, 1), :]
        d = jnp.sum(jnp.where(onehot, urow, zero))
        zj = jnp.sum(jnp.where(onehot, z, zero))
        dot = jnp.sum(jnp.where(cols > j, urow * y, zero))
        return jnp.where(onehot, (zj - dot) / d, y)

    y_ref[:] = jax.lax.fori_loop(i32(0), i32(m), bwd_body,
                                 jnp.zeros_like(b))


def chol_solve_small(S, b):
    """Solve S y = b, S SPD [m, m] with m small (a reduced Schur camera
    system). Pads to lane/sublane multiples; identity on the padded tail.
    """
    m = S.shape[0]
    P = max(128, int(np.ceil(m / 128) * 128))
    idx = np.arange(P)
    pad_eye = jnp.asarray((idx >= m)[:, None] & (idx == idx[:, None]),
                          dtype=S.dtype)
    Sp = jnp.zeros((P, P), dtype=S.dtype)
    Sp = jax.lax.dynamic_update_slice(Sp, S, (0, 0)) + pad_eye
    bp = jnp.zeros((1, P), dtype=b.dtype)
    bp = jax.lax.dynamic_update_slice(bp, b[None, :], (0, 0))

    y = pl.pallas_call(
        functools.partial(_chol_solve_kernel, m=m),
        out_shape=jax.ShapeDtypeStruct((1, P), S.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((P, P), S.dtype)],
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=P * P * m // 3, bytes_accessed=4 * P * P,
            transcendentals=m),
    )
    y = _bind32(y, Sp, bp)
    return y[0, :m]


def _block_outer_kernel(j_ref, g_ref, *, r: int, t: int):
    """Per-row Gram blocks G_n = J_n^T J_n (for block-Jacobi / E^T E
    construction); one J read, [TN, t*t] out."""
    J = j_ref[:]
    TN = J.shape[0]
    J3 = J.reshape(TN, r, t)
    G = jnp.einsum("nrt,nru->ntu", J3, J3,
                   preferred_element_type=J.dtype)
    g_ref[:] = G.reshape(TN, t * t)


def bucket_gram_blocks(J, tile_n: int = 512):
    """G[n, t, t] = J_n^T J_n, tiled."""
    n, r, t = J.shape
    n_pad = int(np.ceil(n / tile_n) * tile_n)
    Jf = J.reshape(n, r * t)
    if n_pad != n:
        Jf = jnp.pad(Jf, ((0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_block_outer_kernel, r=r, t=t),
        out_shape=jax.ShapeDtypeStruct((n_pad, t * t), J.dtype),
        grid=(n_pad // tile_n,),
        in_specs=[pl.BlockSpec((tile_n, r * t), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile_n, t * t), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
    )
    out = _bind32(out, Jf)
    return out[:n].reshape(n, t, t)
