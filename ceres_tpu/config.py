"""Global numeric configuration for ceres_tpu.

Ceres semantics are float64 (the reference is Eigen/double throughout).
On TPU, f64 is supported by XLA via software emulation on the VPU; the
performance-critical paths (batched Jacobian products, CG iterations)
optionally run in f32/bf16 with f64 accumulation (mixed precision, see
solver options `use_mixed_precision_solves`, reference solver.h:572-589).

x64 is enabled at import unless CERES_TPU_NO_X64 is set.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

if not os.environ.get("CERES_TPU_NO_X64"):
    jax.config.update("jax_enable_x64", True)

# Escape hatch for embedded/subprocess use (the C API shim, CI without an
# accelerator): force the host CPU backend before any computation runs.
if os.environ.get("CERES_TPU_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")


def default_dtype():
    """Solver state dtype: f64 when x64 is enabled, else f32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def machine_epsilon(dtype=None):
    return float(jnp.finfo(dtype or default_dtype()).eps)
