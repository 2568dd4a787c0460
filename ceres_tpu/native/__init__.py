"""Native host runtime: build + ctypes bindings for ceres_native.cpp.

The shared library is compiled on first import (g++ -O3, cached next to the
source; rebuilt when the source is newer). Everything degrades gracefully:
`available()` is False when no toolchain exists and callers fall back to
scipy/numpy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ceres_native.cpp")
_LIB = os.path.join(_DIR, "libceres_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                if not _build():
                    return None
            lib = ctypes.CDLL(_LIB)
        except Exception:
            return None

        i32, i64, f64 = ctypes.c_int32, ctypes.c_int64, ctypes.c_double
        p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

        lib.ct_rcm_order.argtypes = [i32, p_i64, p_i32, p_i32]
        lib.ct_rcm_order.restype = i32
        lib.ct_amd_order.argtypes = [i32, p_i64, p_i32, p_i32]
        lib.ct_amd_order.restype = i32
        lib.ct_chol_create.argtypes = [i32, p_i64, p_i32, i32]
        lib.ct_chol_create.restype = ctypes.c_void_p
        lib.ct_chol_nnz.argtypes = [ctypes.c_void_p]
        lib.ct_chol_nnz.restype = i64
        lib.ct_chol_factor.argtypes = [ctypes.c_void_p, p_f64]
        lib.ct_chol_factor.restype = i32
        lib.ct_chol_solve.argtypes = [ctypes.c_void_p, p_f64, p_f64]
        lib.ct_chol_solve.restype = i32
        lib.ct_chol_destroy.argtypes = [ctypes.c_void_p]
        lib.ct_chol_destroy.restype = None
        lib.ct_chol_diag_stats.argtypes = [ctypes.c_void_p, p_f64]
        lib.ct_chol_diag_stats.restype = None
        lib.ct_scatter_add.argtypes = [p_f64, p_i64, p_f64, i64]
        lib.ct_scatter_add.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def rcm_order(Ap: np.ndarray, Ai: np.ndarray, n: int) -> np.ndarray:
    """Reverse Cuthill-McKee permutation (perm[new] = old)."""
    lib = _load()
    perm = np.empty(n, dtype=np.int32)
    if lib is None:
        raise RuntimeError("native library unavailable")
    lib.ct_rcm_order(n, np.ascontiguousarray(Ap, np.int64),
                     np.ascontiguousarray(Ai, np.int32), perm)
    return perm


def amd_order(Ap: np.ndarray, Ai: np.ndarray, n: int) -> np.ndarray:
    """Quotient-graph minimum-degree permutation (perm[new] = old) — the
    fill-reducing role of SuiteSparse CAMD (reorder_program.cc:95)."""
    lib = _load()
    perm = np.empty(n, dtype=np.int32)
    if lib is None:
        raise RuntimeError("native library unavailable")
    lib.ct_amd_order(n, np.ascontiguousarray(Ap, np.int64),
                     np.ascontiguousarray(Ai, np.int32), perm)
    return perm


class SparseCholesky:
    """Simplicial LDL^T over a fixed symmetric pattern: analyze once,
    refactor each iteration (the reference's SparseCholesky contract,
    sparse_cholesky.h:72: Factorize(pattern-constant) + Solve)."""

    ORDER_NATURAL, ORDER_RCM, ORDER_AMD, ORDER_AUTO = 0, 1, 2, 3

    def __init__(self, n: int, Ap: np.ndarray, Ai: np.ndarray,
                 use_rcm: bool = True, ordering: int = None):
        """ordering: 0 natural, 1 RCM, 2 AMD, 3 auto (min symbolic fill).
        Default: auto when use_rcm (legacy flag) is True, else natural."""
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.n = int(n)
        self._Ap = np.ascontiguousarray(Ap, dtype=np.int64)
        self._Ai = np.ascontiguousarray(Ai, dtype=np.int32)
        if ordering is None:
            ordering = self.ORDER_AUTO if use_rcm else self.ORDER_NATURAL
        self._h = lib.ct_chol_create(self.n, self._Ap, self._Ai,
                                     int(ordering))
        if not self._h:
            raise RuntimeError("ct_chol_create failed")

    @property
    def factor_nnz(self) -> int:
        return int(self._lib.ct_chol_nnz(self._h))

    def factor(self, Ax: np.ndarray) -> int:
        """Numeric refactorization; 0 = success, k+1 = breakdown at col k."""
        return int(self._lib.ct_chol_factor(
            self._h, np.ascontiguousarray(Ax, dtype=np.float64)))

    def solve(self, b: np.ndarray) -> np.ndarray:
        x = np.empty(self.n, dtype=np.float64)
        self._lib.ct_chol_solve(
            self._h, np.ascontiguousarray(b, dtype=np.float64), x)
        return x

    def diag_stats(self):
        """(min |D|, max |D|, #negative D) of the last successful factor —
        the LDL^T inertia/conditioning surface for the rank policy
        (reference covariance.h:281-329 failure semantics)."""
        out = np.empty(3, dtype=np.float64)
        self._lib.ct_chol_diag_stats(self._h, out)
        return float(out[0]), float(out[1]), int(out[2])

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.ct_chol_destroy(self._h)
                self._h = None
        except Exception:
            pass


def scatter_add(out: np.ndarray, idx: np.ndarray, vals: np.ndarray):
    """out[idx] += vals with idx == -1 skipped; native when available."""
    lib = _load()
    if lib is not None:
        lib.ct_scatter_add(out, np.ascontiguousarray(idx, np.int64),
                           np.ascontiguousarray(vals, np.float64),
                           np.int64(vals.size))
    else:
        m = idx >= 0
        np.add.at(out, idx[m], vals[m])
