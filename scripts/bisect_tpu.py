"""Bisect which full-BAL-shape sub-computation faults the axon TPU."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import ceres_tpu as ct
from ceres_tpu.io.bal import synthetic_bal_problem, build_bal_ceres_problem
from ceres_tpu.program import CompiledProgram
from ceres_tpu.solvers.schur import SchurOps, detect_schur_structure

NPTS = int(sys.argv[1]) if len(sys.argv) > 1 else 22106
NOBS = int(sys.argv[2]) if len(sys.argv) > 2 else 83718
STAGE = sys.argv[3] if len(sys.argv) > 3 else "all"


def log(*a):
    print(*a, flush=True)


bal = synthetic_bal_problem(16, NPTS, NOBS, seed=7, pixel_noise=1.0)
bal.perturb(rotation_sigma=0.03, translation_sigma=0.2, point_sigma=0.1,
            seed=8)
problem, cams, pts = build_bal_ceres_problem(bal)
prog = CompiledProgram(problem)
opts = ct.SolverOptions(
    linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
    preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
    max_linear_solver_iterations=100)
meta = detect_schur_structure(prog, opts)
x = prog.initial_state()
log(f"npts={NPTS} nobs={NOBS} ne={meta.ne} nf={meta.nf} "
    f"rows={prog.num_rows}")


def stage(name, fn, *args):
    if STAGE not in ("all", name):
        return None
    t0 = time.time()
    f = prog.jit_with_consts(fn, args)
    try:
        out = jax.block_until_ready(f(*args))
        log(f"{name}: OK {time.time()-t0:.1f}s")
        return out
    except Exception as e:
        log(f"{name}: FAIL {time.time()-t0:.1f}s {type(e).__name__} "
            f"{str(e)[:120]}")
        raise SystemExit(1)


# 1. cost only
stage("cost", prog.cost_fn, x)

# 2. linearize
def lin_grad(xx):
    c, g, jac, res = prog.linearize_fn(xx)
    return c, g
stage("linearize", lin_grad, x)

# 3. linearize + scale + ete cholesky
def ete_stage(xx):
    c, g, jac, res = prog.linearize_fn(xx)
    scale = 1.0 / (1.0 + jnp.sqrt(jac.squared_column_norms()))
    jac_s = jac.scale_columns(scale)
    D = jnp.sqrt(jnp.clip(jac_s.squared_column_norms(), 1e-6, 1e32) / 1e4)
    ops = SchurOps(meta, jac_s, D)
    return jnp.sum(ops.chol_e)
stage("ete", ete_stage, x)

# 4. + schur_jacobi preconditioner build
def precond_stage(xx):
    c, g, jac, res = prog.linearize_fn(xx)
    scale = 1.0 / (1.0 + jnp.sqrt(jac.squared_column_norms()))
    jac_s = jac.scale_columns(scale)
    D = jnp.sqrt(jnp.clip(jac_s.squared_column_norms(), 1e-6, 1e32) / 1e4)
    ops = SchurOps(meta, jac_s, D)
    blocks = ops._block_diag_S(subtract_cross=True)
    return sum(jnp.sum(b) for _, b in blocks)
stage("precond", precond_stage, x)

# 5. + one apply_S
def applys_stage(xx):
    c, g, jac, res = prog.linearize_fn(xx)
    scale = 1.0 / (1.0 + jnp.sqrt(jac.squared_column_norms()))
    jac_s = jac.scale_columns(scale)
    D = jnp.sqrt(jnp.clip(jac_s.squared_column_norms(), 1e-6, 1e32) / 1e4)
    ops = SchurOps(meta, jac_s, D)
    v = jnp.ones((meta.nf,), dtype=prog.dtype)
    return jnp.sum(ops.apply_S(v))
stage("apply_s", applys_stage, x)

# 6. full step
from ceres_tpu.solver import make_step_impl
step_impl = make_step_impl(prog, opts)
def step_stage(xx):
    out = step_impl(xx, jnp.asarray(1e4, dtype=prog.dtype),
                    jnp.ones((prog.num_effective,), dtype=prog.dtype))
    return out["model_cost_change"], out["lin_iters"]
stage("step", step_stage, x)

log("done")
