"""Preconditioners for the iterative solvers.

Capability parity with the reference preconditioner family
(preconditioner.h:51): IDENTITY, (block) JACOBI
(block_jacobi_preconditioner.h:55), SCHUR_JACOBI and
SCHUR_POWER_SERIES_EXPANSION live in schur.py next to the eliminator;
SUBSET / CLUSTER_* are provided at the orchestration layer.

Block-Jacobi structure: per-parameter-block diagonal blocks of
J^T J + D^T D, grouped by tangent size and inverted as batched Cholesky
solves — the reference's per-cell loop becomes a handful of batched
[k, t, t] factorizations.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..ops.bsr import BlockJacobian, block_diag_jtj


def make_block_jacobi_preconditioner(jac: BlockJacobian, D, groups):
    """Returns apply(v) = M^-1 v with M = blockdiag(J^T J + D^T D).

    `groups` is the program's GroupMeta list (variable blocks by tangent
    size). Each group's [k, t, t] blocks are Cholesky-factorized in one
    batched call (block_jacobi_preconditioner.cc's cell loop, batched).
    """
    diag_blocks = block_diag_jtj(jac, groups)
    factors = []
    for g, M in zip(groups, diag_blocks):
        cols = jnp.asarray(g.tan_cols)              # [k, t]
        d = D[cols]                                 # [k, t]
        M = M + jnp.einsum("kt,tu->ktu", d * d,
                           jnp.eye(g.tangent_size, dtype=M.dtype))
        chol = jnp.linalg.cholesky(M)
        factors.append((cols, chol))

    def apply(v):
        out = jnp.zeros_like(v)
        for cols, chol in factors:
            vb = v[cols][..., None]                 # [k, t, 1]
            y = jsl.solve_triangular(chol, vb, lower=True)
            z = jsl.solve_triangular(
                jnp.swapaxes(chol, -1, -2), y, lower=False)
            out = out.at[cols].set(z[..., 0])
        return out

    return apply


def make_identity_preconditioner():
    return lambda v: v
