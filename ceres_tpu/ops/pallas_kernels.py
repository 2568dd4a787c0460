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


def pallas_enabled() -> bool:
    return bool(os.environ.get("CERES_TPU_PALLAS"))


def _jtjv_kernel(j_ref, vb_ref, u_ref, *, r: int, t: int):
    """One row tile: u = J^T (J v) with J read once.

    j_ref:  [TILE_N, r*t]   flattened block Jacobians
    vb_ref: [TILE_N, t]     gathered v values per block
    u_ref:  [TILE_N, t]     output contributions (scattered by caller)
    """
    J = j_ref[:]                                    # [TN, r*t]
    vb = vb_ref[:]                                  # [TN, t]
    TN = J.shape[0]
    J3 = J.reshape(TN, r, t)
    # w = sum_t J[n,r,t] * v[n,t]  (VPU broadcast-multiply + reduce)
    w = jnp.sum(J3 * vb[:, None, :], axis=2)        # [TN, r]
    # u = sum_r J[n,r,t] * w[n,r]
    u_ref[:] = jnp.sum(J3 * w[:, :, None], axis=1)  # [TN, t]


def bucket_jtjv(J, vb, tile_n: int = 512):
    """u[n, t] = J_n^T (J_n vb_n) for a bucket of block Jacobians.

    J: [n, r, t]; vb: [n, t] (already gathered). Pads n to the tile size.
    """
    n, r, t = J.shape
    n_pad = int(np.ceil(n / tile_n) * tile_n)
    Jf = J.reshape(n, r * t)
    if n_pad != n:
        Jf = jnp.pad(Jf, ((0, n_pad - n), (0, 0)))
        vb = jnp.pad(vb, ((0, n_pad - n), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_jtjv_kernel, r=r, t=t),
        out_shape=jax.ShapeDtypeStruct((n_pad, t), J.dtype),
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, r * t), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, t), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, t), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * r * t,
            bytes_accessed=(n_pad * r * t + 2 * n_pad * t) * J.dtype.itemsize,
            transcendentals=0),
    )(Jf, vb)
    return out[:n]


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
    )(Jf)
    return out[:n].reshape(n, t, t)
