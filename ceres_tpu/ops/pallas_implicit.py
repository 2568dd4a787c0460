"""Pallas CG-apply megakernel for the matrix-free (implicit) Schur path.

The implicit ITERATIVE_SCHUR mode exists for the large-camera-count
regime (reference implicit_schur_complement.cc role) where A [ne, te,
nf] and a dense S are unaffordable. Its cost is ~29 CG applications per
LM iteration, each computing

    S v = F_s^T F_s v - F_s^T E_s inv(E_s^T E_s + D^2) E_s^T F_s v
          (+ D_f^2 v)

over the chunk tensors. The round-3 XLA implementation paid ~29 ms per
application (measured 0.844 s/LM-iteration at 1024 cams / 1M obs vs a
~5.4 ms bandwidth ideal): the v-row expansion `vb[fids]` is a gather
with a tiny trailing dim (runs row-by-row on TPU), and the chain of
broadcast multiply-reduces materializes half a dozen [ne, k, r, t]
intermediates in HBM.

This module re-architects one application as:
  1. v-row expansion via tf LANE-ALIGNED 1-D gathers producing the
     transposed plane layout [tf, k, ne_pad] directly (no [.., 9]
     trailing-dim gather, no separate transpose pass);
  2. ONE Pallas kernel over e-block tiles computing w = Jf v,
     u = sum_k Je^T w, zz = inv u, w2 = w - Je zz, and the per-row
     output contribution C = Jf^T w2 — all VPU plane math, the five
     HBM-materialized intermediates of the XLA path never leave VMEM;
  3. the existing camera-chunk reduction of C to [kf, tf] (lane-major
     remap, solvers/schur_fused._sj_reduce_to_blocks pattern).

Inputs are built once per LM iteration (Je/Jf transposed to planes);
each CG application then moves ~4 HBM passes instead of ~12.

Reference roles: implicit_schur_complement.cc:126 (MultiplyByA^T...),
conjugate_gradients_solver.h:109 (the apply inside CG).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_pallas_implicit_apply"]


def _apply_kernel(je_ref, jf_ref, inv_ref, vrow_ref, c_ref,
                  *, te, tf, k):
    """One e-block tile of the implicit Schur apply.

      je   [2*te, k, T]   E-scaled point Jacobian planes (r*te + a)
      jf   [2*tf, k, T]   f-scaled camera Jacobian planes (r*tf + t)
      inv  [te*te, T]     inv(E_s^T E_s + D^2) planes (row-major)
      vrow [tf, k, T]     v expanded to rows (camera of each row)
    out:
      c    [tf, k, T]     per-row contribution Jf^T (w - Je inv Je^T w)
    """
    vrow = [vrow_ref[t] for t in range(tf)]            # [k, T] each
    w = []
    for r in range(2):
        acc = None
        for t in range(tf):
            term = jf_ref[r * tf + t] * vrow[t]
            acc = term if acc is None else acc + term
        w.append(acc)                                  # [k, T]
    u = []
    for a in range(te):
        acc = None
        for r in range(2):
            term = je_ref[r * te + a] * w[r]
            acc = term if acc is None else acc + term
        u.append(acc.sum(axis=0))                      # [T]
    zz = []
    for a in range(te):
        acc = None
        for v in range(te):
            term = inv_ref[a * te + v, :] * u[v]
            acc = term if acc is None else acc + term
        zz.append(acc)                                 # [T]
    w2 = []
    for r in range(2):
        acc = w[r]
        for a in range(te):
            acc = acc - je_ref[r * te + a] * zz[a][None, :]
        w2.append(acc)
    for t in range(tf):
        acc = None
        for r in range(2):
            term = jf_ref[r * tf + t] * w2[r]
            acc = term if acc is None else acc + term
        c_ref[t] = acc


def make_pallas_implicit_apply(ne, k, te, tf, kf, backend_key,
                               tile: int = 512):
    """Builds the plane-layout apply pieces, or returns None when the
    kernel is rejected / cannot fit VMEM.

    Returns an object with:
      ne_pad
      to_planes(Je_s [ne, k, 2, te], Jf_s [ne, k, 2, tf], inv [ne, te,
        te]) -> (jeT [2te, k, ne_pad], jfT [2tf, k, ne_pad],
        invT [te*te, ne_pad])  — once per LM iteration
      apply(jeT, jfT, invT, vrowT [tf, k, ne_pad]) ->
        C [tf, k, ne_pad]     — once per CG application
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .pallas_lin import _probe

    interp = bool(os.environ.get("CERES_TPU_PALLAS_INTERPRET"))
    if os.environ.get("CERES_TPU_NO_PALLAS") or \
            os.environ.get("CERES_TPU_NO_PALLAS_IMPLICIT"):
        return None
    if jax.default_backend() == "cpu" and not interp:
        return None

    per_lane = 4 * k * (2 * te + 2 * tf + 2 * tf + 8) + 4 * te * te
    budget = 6 * 1024 * 1024
    tile = min(tile, max(128, 1 << (max(ne, 1) - 1).bit_length()))
    while tile > 128 and per_lane * tile > budget:
        tile //= 2
    if per_lane * tile > 2 * budget:
        return None
    ne_pad = int(math.ceil(ne / tile) * tile)
    grid = ne_pad // tile

    kern = functools.partial(_apply_kernel, te=te, tf=tf, k=k)
    bspec = lambda shape, imap: pl.BlockSpec(shape, imap,
                                             memory_space=pltpu.VMEM)
    raw = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            bspec((2 * te, k, tile), lambda i: (0, 0, i)),
            bspec((2 * tf, k, tile), lambda i: (0, 0, i)),
            bspec((te * te, tile), lambda i: (0, i)),
            bspec((tf, k, tile), lambda i: (0, 0, i)),
        ],
        out_specs=bspec((tf, k, tile), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((tf, k, ne_pad), jnp.float32),
        interpret=interp,
    )

    def call(*a):
        with jax.enable_x64(False):   # see pallas_lin: Mosaic + x64
            return raw(*a)

    if not interp:
        probe_args = [
            jax.ShapeDtypeStruct((2 * te, k, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((2 * tf, k, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((te * te, ne_pad), jnp.float32),
            jax.ShapeDtypeStruct((tf, k, ne_pad), jnp.float32),
        ]
        if not _probe("pimp", call, probe_args,
                      (te, tf, k, tile, ne_pad, backend_key)):
            return None

    class _Impl:
        pass

    impl = _Impl()
    impl.ne_pad = ne_pad

    def to_planes(Je_s, Jf_s, inv_ete):
        pad = ne_pad - Je_s.shape[0]

        def t_planes(J, tw):
            # [ne, k, 2, tw] -> [2*tw, k, ne_pad]
            P = J.astype(jnp.float32).transpose(2, 3, 1, 0).reshape(
                2 * tw, k, -1)
            return jnp.pad(P, ((0, 0), (0, 0), (0, pad)))

        invT = jnp.pad(
            inv_ete.astype(jnp.float32).reshape(-1, te * te).T,
            ((0, 0), (0, pad)))
        return t_planes(Je_s, te), t_planes(Jf_s, tf), invT

    impl.to_planes = to_planes
    impl.apply = call
    return impl
