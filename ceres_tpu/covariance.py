"""Post-solve covariance estimation.

Capability parity with the reference's Covariance (include/ceres/
covariance.h:202, internal/ceres/covariance_impl.cc): computes blocks of
inverse(J'J) at the current parameter values, with the DENSE_SVD and
SPARSE_QR algorithms (types.h:465-468) and the rank-deficiency policy
(min_reciprocal_condition_number / null_space_rank, covariance.h:281-329).

On TPU both algorithms run as dense device factorizations (SVD / QR via
XLA); the reference's SuiteSparse QR path (covariance_impl.cc:535) has no
TPU analog — SPARSE_QR here means "QR of the Jacobian", which is exact and
MXU-friendly at the problem sizes where covariances are requested.

Covariance blocks are returned in ambient coordinates (cov_ambient =
J_plus C_tangent J_plus^T) or tangent coordinates, matching
GetCovarianceBlock / GetCovarianceBlockInTangentSpace.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .program import CompiledProgram
from .types import CovarianceAlgorithmType


class CovarianceOptions:
    """covariance.h:247-331."""

    def __init__(self,
                 algorithm_type=CovarianceAlgorithmType.DENSE_SVD,
                 min_reciprocal_condition_number: float = 1e-14,
                 null_space_rank: int = 0,
                 apply_loss_function: bool = True,
                 num_threads: int = 1):
        self.algorithm_type = algorithm_type
        self.min_reciprocal_condition_number = (
            min_reciprocal_condition_number)
        self.null_space_rank = null_space_rank
        self.apply_loss_function = apply_loss_function
        self.num_threads = num_threads


class Covariance:
    Options = CovarianceOptions

    def __init__(self, options: Optional[CovarianceOptions] = None):
        self.options = options or CovarianceOptions()
        self._tangent_cov = None
        self._program = None
        self._message = ""

    @property
    def message(self):
        return self._message

    def compute(self, covariance_blocks: List[Tuple], problem) -> bool:
        """covariance_impl.cc:101. covariance_blocks: list of (block_a,
        block_b) numpy-array pairs (only used for validation here — the
        full tangent covariance is materialized; fine at the sizes where
        dense factorization is the algorithm)."""
        prog = CompiledProgram(problem,
                               apply_loss=self.options.apply_loss_function)
        self._program = prog
        for a, b in covariance_blocks:
            problem._get(a)
            problem._get(b)

        x = prog.initial_state()
        _, _, jac, _ = jax.jit(prog.linearize_fn)(x)
        J = jac.to_dense()
        n = prog.num_effective
        opts = self.options

        if opts.algorithm_type == CovarianceAlgorithmType.DENSE_SVD:
            # SVD of J: J = U S V'; inv(J'J) = V S^-2 V'
            # (covariance_impl.cc:704 ComputeDenseSVDCovariance).
            _, s, vt = jnp.linalg.svd(J, full_matrices=False)
            s = np.asarray(s)
            max_s = s[0] if s.size else 0.0
            eps = opts.min_reciprocal_condition_number
            if opts.null_space_rank == 0:
                if s.size and (s[-1] / max_s) ** 2 < eps:
                    self._message = (
                        f"Rank deficient Jacobian: reciprocal condition "
                        f"number {(s[-1]/max_s)**2:e} < {eps:e}; set "
                        f"null_space_rank to allow a pseudo-inverse.")
                    return False
                keep = np.ones_like(s, dtype=bool)
            elif opts.null_space_rank < 0:
                keep = (s / max_s) ** 2 >= eps
            else:
                keep = np.ones_like(s, dtype=bool)
                keep[len(s) - opts.null_space_rank:] = False
            inv_s2 = np.where(keep, 1.0 / np.maximum(s, 1e-300) ** 2, 0.0)
            V = np.asarray(vt).T
            self._tangent_cov = (V * inv_s2[None, :]) @ V.T
        else:  # SPARSE_QR -> QR of J on device
            Q, R = jnp.linalg.qr(J)
            Rn = np.asarray(R)
            diag = np.abs(np.diag(Rn))
            if diag.min() <= 0 or (diag.min() / diag.max()) < np.sqrt(
                    opts.min_reciprocal_condition_number):
                self._message = ("Rank deficient Jacobian in QR "
                                 "factorization; use DENSE_SVD with "
                                 "null_space_rank.")
                return False
            Rinv = np.asarray(
                jax.scipy.linalg.solve_triangular(
                    R, jnp.eye(n, dtype=R.dtype), lower=False))
            self._tangent_cov = Rinv @ Rinv.T
        return True

    def _tangent_slice(self, values):
        prog = self._program
        key = id(values)
        if key not in prog.tan_offset:
            raise KeyError("block is constant or not in problem")
        blk = prog.problem._blocks[key]
        off = prog.tan_offset[key]
        return off, blk.tangent_size, blk

    def get_covariance_block_in_tangent_space(self, a, b) -> np.ndarray:
        oa, ta, _ = self._tangent_slice(a)
        ob, tb, _ = self._tangent_slice(b)
        return self._tangent_cov[oa:oa + ta, ob:ob + tb]

    def get_covariance_block(self, a, b) -> np.ndarray:
        """Ambient-space block: J_plus(a) C J_plus(b)^T."""
        oa, ta, blk_a = self._tangent_slice(a)
        ob, tb, blk_b = self._tangent_slice(b)
        C = self._tangent_cov[oa:oa + ta, ob:ob + tb]
        Ja = (np.asarray(blk_a.manifold.plus_jacobian(jnp.asarray(a)))
              if blk_a.manifold else np.eye(ta))
        Jb = (np.asarray(blk_b.manifold.plus_jacobian(jnp.asarray(b)))
              if blk_b.manifold else np.eye(tb))
        return Ja @ C @ Jb.T
