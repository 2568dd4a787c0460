"""C API support: the Python half of the embedded-interpreter C bindings.

Capability parity with the reference's C89 wrapper (include/ceres/c_api.h:
123-138, internal/ceres/c_api.cc): create a problem, add residual blocks
whose cost (and optionally loss) are C function pointers, solve, with
results written back into C-owned parameter memory.

Mechanics: the native shim (capi/ceres_tpu_c.cpp) embeds CPython and calls
the functions here, passing raw pointer values. Parameter blocks become
numpy views over the C arrays (zero copy — the solve's write-back mutates
the caller's memory, matching the C++ API contract). C cost functions are
wrapped as SizedCostFunctions whose residuals/jacobians are
`jax.pure_callback`s into the C function — host round trips, the price of
opaque C code on an XLA device (the reference pays virtual dispatch per
block; we pay one callback per bucket per evaluation, vmapped
sequentially).

This module is importable directly for testing (ctypes-level use from
Python), no shim required.
"""

from __future__ import annotations

import ctypes
import itertools
from ctypes import POINTER, c_double, c_int, c_void_p
from functools import lru_cache
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

CERES_COST_FUNC_T = ctypes.CFUNCTYPE(c_int, c_void_p,
                                     POINTER(POINTER(c_double)),
                                     POINTER(c_double),
                                     POINTER(POINTER(c_double)))
CERES_LOSS_FUNC_T = ctypes.CFUNCTYPE(None, c_void_p, c_double,
                                     POINTER(c_double))

_problems: Dict[int, "_CProblem"] = {}
_ids = itertools.count(1)
_keepalive: Dict[int, object] = {}


class _CProblem:
    def __init__(self):
        import ceres_tpu as ct
        self.problem = ct.Problem()
        self.views: List[np.ndarray] = []


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(POINTER(c_double))


@lru_cache(maxsize=None)
def _cost_class(cost_ptr: int, nr: int, sizes: tuple):
    """One dynamically-created SizedCostFunction subclass per distinct
    (C function, shape) — one evaluator bucket per C cost function."""
    from .cost import SizedCostFunction

    cfn = CERES_COST_FUNC_T(cost_ptr)
    total_jac = sum(nr * s for s in sizes)

    def _call_c(user_data: int, params, want_jac: bool):
        ps = [np.ascontiguousarray(np.asarray(p, np.float64))
              for p in params]
        arr = (POINTER(c_double) * len(ps))(*[_dptr(x) for x in ps])
        res = np.zeros(nr, dtype=np.float64)
        jacs = None
        if want_jac:
            jacs = [np.zeros(nr * s, dtype=np.float64) for s in sizes]
            jarr = (POINTER(c_double) * len(ps))(*[_dptr(j) for j in jacs])
        else:
            jarr = ctypes.cast(None, POINTER(POINTER(c_double)))
        ok = cfn(c_void_p(int(user_data)), arr, _dptr(res), jarr)
        if not ok:
            res[:] = np.nan
            if jacs is not None:
                for j in jacs:
                    j[:] = np.nan
        return res, jacs

    def _host_res(ud, *params):
        res, _ = _call_c(int(np.asarray(ud)), params, want_jac=False)
        return res

    def _host_jac(ud, *params):
        _, jacs = _call_c(int(np.asarray(ud)), params, want_jac=True)
        return np.concatenate(jacs) if jacs else np.zeros(0)

    class CCostFunction(SizedCostFunction):
        def __init__(self, user_data: int):
            super().__init__(nr, list(sizes))
            self.user_data = int(user_data)

        def residuals(self, *params):
            return jax.pure_callback(
                _host_res, jax.ShapeDtypeStruct((nr,), jnp.float64),
                self.user_data, *params, vmap_method="sequential")

        def jacobians(self, *params):
            flat = jax.pure_callback(
                _host_jac, jax.ShapeDtypeStruct((total_jac,), jnp.float64),
                self.user_data, *params, vmap_method="sequential")
            out, off = [], 0
            for s in sizes:
                out.append(flat[off:off + nr * s].reshape(nr, s))
                off += nr * s
            return out

    CCostFunction.__name__ = f"CCostFunction_{cost_ptr:x}_{nr}"
    return CCostFunction


@lru_cache(maxsize=None)
def _loss_class(loss_ptr: int):
    from .loss import LossFunction

    lfn = CERES_LOSS_FUNC_T(loss_ptr)

    def _host_loss(ud, s):
        s = np.atleast_1d(np.asarray(s, np.float64))
        out = np.zeros((s.size, 3), dtype=np.float64)
        buf = (c_double * 3)()
        for i, si in enumerate(s.reshape(-1)):
            lfn(c_void_p(int(np.asarray(ud))), float(si), buf)
            out[i] = buf[:]
        return out.reshape(s.shape + (3,))

    class CLossFunction(LossFunction):
        def __init__(self, user_data: int):
            self.user_data = int(user_data)

        def evaluate(self, s):
            s_arr = jnp.asarray(s)
            trip = jax.pure_callback(
                _host_loss,
                jax.ShapeDtypeStruct(s_arr.shape + (3,), jnp.float64),
                self.user_data, s_arr, vmap_method="sequential")
            trip = trip.astype(s_arr.dtype)
            return trip[..., 0], trip[..., 1], trip[..., 2]

    CLossFunction.__name__ = f"CLossFunction_{loss_ptr:x}"
    return CLossFunction


# ---------------------------------------------------------------- public API
def create_problem() -> int:
    pid = next(_ids)
    _problems[pid] = _CProblem()
    return pid


def free_problem(pid: int) -> None:
    _problems.pop(pid, None)


def add_residual_block(pid: int, cost_ptr: int, cost_data: int,
                       loss_ptr: int, loss_data: int, num_residuals: int,
                       sizes: List[int], param_ptrs: List[int]) -> int:
    cp = _problems[pid]
    views = []
    for ptr, sz in zip(param_ptrs, sizes):
        existing = None
        for v in cp.views:
            if v.ctypes.data == ptr:
                existing = v
                break
        if existing is None:
            existing = np.ctypeslib.as_array(
                ctypes.cast(int(ptr), POINTER(c_double)), shape=(int(sz),))
            cp.views.append(existing)
        views.append(existing)

    cost = _cost_class(int(cost_ptr), int(num_residuals),
                       tuple(int(s) for s in sizes))(int(cost_data))
    loss = (_loss_class(int(loss_ptr))(int(loss_data))
            if loss_ptr else None)
    rb = cp.problem.add_residual_block(cost, loss, *views)
    _keepalive[id(rb)] = rb
    return id(rb)


def solve(pid: int, max_num_iterations: int = 50) -> str:
    import ceres_tpu as ct
    cp = _problems[pid]
    options = ct.SolverOptions(max_num_iterations=int(max_num_iterations))
    summary = ct.solve(options, cp.problem)
    return summary.brief_report()
