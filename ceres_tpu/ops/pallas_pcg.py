"""Whole-solve dense PCG Pallas kernel for the reduced camera system.

The explicit-S ITERATIVE_SCHUR path (solvers/schur_fused.py) solves
S y = rhs with S a small dense SPD [nf, nf] (nf = 144 at BAL-16 scale).
The XLA CG loop (solvers/cg.py) runs ~10 narrow ops per iteration —
matvec, preconditioner apply, four dots, vector updates — each a
separate fusion with launch overhead; measured 0.0118 ms per CG
application vs a 0.00011 ms bandwidth ideal (0.95% of HBM
speed-of-light, the worst roofline in the repo, BENCH_r04).

This kernel runs the ENTIRE PCG solve in one Mosaic program: S, the
dense block-diagonal preconditioner inverse, and all CG vectors stay
resident in VMEM; S is read from HBM exactly ONCE per damped solve
(83 KB at nf=144), not once per CG iteration per operand. Iteration
semantics mirror solvers/cg.py exactly (reference
conjugate_gradients_solver.h:109): the Q-based forcing-sequence
termination, the indefiniteness guard, and the residual refresh every
`residual_reset_period` iterations (refresh here recomputes b - A x
unconditionally and selects — both branches are VMEM-resident matvecs,
~microseconds, where the XLA loop must lax.cond to avoid a second HBM
pass).

x0 = 0 is assumed (the fused solve phase always starts CG from zero).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _use_interpret, _bind32
from ..utils import probecache

__all__ = ["dense_pcg", "dense_pcg_available"]

_PROBE_CACHE: dict = {}
_KVER = 3


def _pcg_kernel(s_ref, minv_ref, b_ref, y_ref, st_ref, *,
                max_iterations: int, min_iterations: int,
                q_tolerance: float, reset_period: int):
    dt = s_ref.dtype
    S = s_ref[:]                                   # [P, P], VMEM-resident
    Minv = minv_ref[:]                             # [P, P] dense block-diag
    b = b_ref[:]                                   # [1, P]
    i32 = jnp.int32
    fzero = jnp.zeros((), dtype=dt)

    # HIGHEST precision: the MXU's default bf16 passes perturb the CG
    # recurrence enough to change the outer LM trajectory on hardware
    # (interpret-mode parity was exact f32 and did not catch it)
    def matvec(v):                                 # [1, P] @ [P, P] (S=S^T)
        return jax.lax.dot_general(
            v, S, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=dt)

    def precond(v):
        return jax.lax.dot_general(
            v, Minv, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=dt)

    def vdot(a, c):
        return jnp.sum(a * c)

    # x0 = 0: r0 = b, Q_init = 0 (cg.py init())
    r0 = b
    z0 = precond(r0)
    rho0 = vdot(r0, z0)
    x0 = jnp.zeros_like(b)

    def cond(state):
        x, r, z, p, rho, i, Q0, done = state
        return jnp.logical_and(jnp.logical_not(done),
                               i < i32(max_iterations))

    def body(state):
        x, r, z, p, rho, i, Q0, done = state
        Ap = matvec(p)
        pAp = vdot(p, Ap)
        bad = jnp.logical_or(pAp <= fzero, jnp.logical_not(
            jnp.isfinite(pAp)))
        alpha = jnp.where(bad, fzero,
                          rho / jnp.where(pAp == fzero,
                                          jnp.ones((), dt), pAp))
        x_new = x + alpha * p
        i1 = i + i32(1)
        # residual refresh: both branches are VMEM matvecs — select, no
        # cond needed (cg.py's lax.cond exists to avoid a second HBM
        # pass, which does not exist here)
        refresh = (i1 % i32(reset_period)) == i32(0)
        r_new = jnp.where(refresh, b - matvec(x_new), r - alpha * Ap)
        z_new = precond(r_new)
        rho_new = vdot(r_new, z_new)
        beta = rho_new / jnp.where(rho == fzero, jnp.ones((), dt), rho)
        p_new = z_new + beta * p

        Q1 = 0.5 * vdot(x_new, r_new + b)
        zeta = i1.astype(dt) * (Q1 - Q0) / jnp.where(
            Q1 == fzero, jnp.ones((), dt), Q1)
        if q_tolerance > 0:
            q_done = jnp.logical_and(
                jnp.logical_and(i1 >= i32(max(min_iterations, 1)),
                                Q1 != fzero),
                jnp.abs(zeta) < jnp.asarray(q_tolerance, dt))
        else:
            q_done = jnp.zeros((), jnp.bool_)
        done_new = jnp.logical_or(bad, q_done)
        return (x_new, r_new, z_new, p_new, rho_new, i1, Q1, done_new)

    state = jax.lax.while_loop(cond, body, (
        x0, r0, z0, z0, rho0, i32(0), fzero, jnp.zeros((), jnp.bool_)))
    x, r, z, p, rho, i, Q0, done = state
    y_ref[:] = x
    # scalar stores to VMEM are not lowerable — build the stats row as a
    # vector select and store it whole
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    st_ref[:] = jnp.where(cols == 0, i.astype(dt),
                          jnp.where(cols == 1, jnp.sqrt(vdot(r, r)),
                                    fzero))


def _build_call(P: int, max_iterations: int, min_iterations: int,
                q_tolerance: float, reset_period: int):
    kern = functools.partial(
        _pcg_kernel, max_iterations=max_iterations,
        min_iterations=min_iterations, q_tolerance=q_tolerance,
        reset_period=reset_period)
    return pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((1, P), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.float32)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * max_iterations * P * P,
            bytes_accessed=8 * P * P, transcendentals=0),
    )


def dense_pcg_available(m: int, max_iterations: int, min_iterations: int,
                        q_tolerance: float) -> bool:
    """Probe-compile the kernel for this shape once (host-side); a
    Mosaic rejection keeps the XLA CG loop rather than failing the solve
    compile. VMEM budget: S + Minv at [P, P] f32 — cap P at 1024
    (2 x 4 MB)."""
    if os.environ.get("CERES_TPU_NO_PALLAS_PCG") or \
            os.environ.get("CERES_TPU_NO_PALLAS"):
        return False
    P = max(128, int(np.ceil(m / 128) * 128))
    if P > 1024:
        return False
    if _use_interpret():
        return True
    # _KVER bumps invalidate persisted probe results when the kernel
    # code changes (a stale False would silently disable it forever)
    key = ("pcg", _KVER, P, max_iterations, min_iterations,
           round(q_tolerance, 12), jax.default_backend())
    ok = _PROBE_CACHE.get(key)
    if ok is None:
        ok = probecache.get(key)
    if ok is None:
        probe_err = None
        try:
            call = _build_call(P, max_iterations, min_iterations,
                               q_tolerance, 10)
            with jax.enable_x64(False):
                jax.jit(call).lower(
                    jax.ShapeDtypeStruct((P, P), jnp.float32),
                    jax.ShapeDtypeStruct((P, P), jnp.float32),
                    jax.ShapeDtypeStruct((1, P), jnp.float32),
                ).compile()
            ok = True
        except Exception as e:
            import sys
            print("ceres_tpu: dense PCG kernel rejected by the TPU "
                  f"kernel compiler ({type(e).__name__}); using the XLA "
                  "CG loop", file=sys.stderr)
            if os.environ.get("CERES_TPU_PALLAS_DEBUG"):
                import traceback
                traceback.print_exc()
            ok = False
            probe_err = e
        probecache.put(key, ok,
                       transient=(not ok
                                  and probecache.is_transient_error(
                                      probe_err)))
    _PROBE_CACHE[key] = ok
    return bool(ok)


def dense_pcg(S, b, Minv_dense, *, max_iterations: int,
              min_iterations: int = 0, q_tolerance: float = 0.0,
              residual_reset_period: int = 10):
    """Solve S x = b (S SPD [m, m] f32) with dense-preconditioner PCG,
    x0 = 0, entirely in VMEM. Minv_dense is the dense [m, m]
    preconditioner inverse (block-diagonal scattered dense, or identity).
    Returns (x [m], num_iterations i32) with solvers/cg.py semantics."""
    m = S.shape[0]
    P = max(128, int(np.ceil(m / 128) * 128))
    Sp = jnp.zeros((P, P), dtype=jnp.float32)
    Sp = jax.lax.dynamic_update_slice(Sp, S.astype(jnp.float32), (0, 0))
    Mp = jnp.zeros((P, P), dtype=jnp.float32)
    Mp = jax.lax.dynamic_update_slice(Mp, Minv_dense.astype(jnp.float32),
                                      (0, 0))
    bp = jnp.zeros((1, P), dtype=jnp.float32)
    bp = jax.lax.dynamic_update_slice(bp, b.astype(jnp.float32)[None, :],
                                      (0, 0))
    call = _build_call(P, max_iterations, min_iterations,
                       q_tolerance, residual_reset_period)
    y, st = _bind32(call, Sp, Mp, bp)
    return y[0, :m], st[0, 0].astype(jnp.int32)
