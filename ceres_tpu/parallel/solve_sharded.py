"""SolverOptions.mesh consumer: run the full solve on a device mesh.

Entry used by solver.solve() when options.mesh is set. Routes to the
sharded fused Schur solve (parallel/sharded_fused.py) when the problem has
the required structure; to a sharded CGNR host loop otherwise; returns
None when no sharded path applies (caller falls back to single-device).
"""

from __future__ import annotations

import time

import jax
import numpy as np

from ..types import (LinearSolverType, TerminationType)


def _as_mesh(mesh):
    from jax.sharding import Mesh
    if isinstance(mesh, Mesh):
        return mesh
    if isinstance(mesh, int):
        devices = np.array(jax.devices()[:mesh])
        return Mesh(devices, axis_names=("data",))
    raise TypeError(f"options.mesh must be a jax Mesh or int, got {mesh!r}")


def _data_axis(mesh):
    # the largest axis is the residual/data axis by convention; a 1-axis
    # mesh uses its only axis.
    names = list(mesh.axis_names)
    if "data" in names:
        return "data"
    return max(names, key=lambda a: mesh.shape[a])


TERMINATION_BY_CODE = None


def try_solve_sharded(program, options, summary):
    """Run the solve over options.mesh. Returns final x, or None if no
    sharded path supports this (problem, options) pair."""
    global TERMINATION_BY_CODE
    from ..minimizers.fused import TERMINATION_BY_CODE as TBC
    TERMINATION_BY_CODE = TBC

    mesh = _as_mesh(options.mesh)
    axis = _data_axis(mesh)

    if options.linear_solver_type in (LinearSolverType.DENSE_SCHUR,
                                      LinearSolverType.SPARSE_SCHUR,
                                      LinearSolverType.ITERATIVE_SCHUR):
        from ..solvers.schur import detect_schur_structure
        from .sharded_fused import (make_sharded_fused_solve,
                                    sharded_fused_supported)
        meta = detect_schur_structure(program, options)
        num_shards = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        if meta is not None and sharded_fused_supported(
                program, options, meta, num_shards):
            t0 = time.time()
            # key on the mesh's structure, not id(): CPython reuses ids
            # of collected objects, so id(mesh) could alias a dead mesh's
            # cached executable with shards placed for the wrong devices.
            mesh_key = (mesh.axis_names,
                        tuple(d.id for d in mesh.devices.flat))
            key = ("sharded_fused", options.cache_key(), mesh_key)
            cached = program._jit_cache.get(key)
            if cached is None:
                # shard over ALL mesh axes (multi-host {host, chip} meshes
                # flatten into one e-block data axis)
                run, place = make_sharded_fused_solve(program, options,
                                                      meta, mesh)
                placed = place()
                program._jit_cache[key] = (run, placed)
            else:
                run, placed = cached
            result = run(program.initial_state(), placed)
            result = jax.device_get(result)
            summary.minimizer_time_in_seconds = time.time() - t0
            _fill(summary, result)
            return result.x
    if options.linear_solver_type == LinearSolverType.CGNR:
        x = _solve_sharded_cgnr_host_loop(program, options, summary, mesh,
                                          axis)
        if x is not None:
            return x
    return None


def _fill(summary, result):
    summary.initial_cost = float(result.initial_cost)
    summary.final_cost = float(result.cost)
    summary.num_successful_steps = int(result.successful_steps)
    summary.num_unsuccessful_steps = int(result.unsuccessful_steps)
    summary.num_linear_solves = int(result.iterations)
    summary.num_linear_solver_iterations = int(
        result.total_linear_iterations)
    summary.num_iterations_fused = int(result.iterations)
    code = int(result.termination_code)
    term, msg = TERMINATION_BY_CODE.get(
        code, (TerminationType.FAILURE, f"unknown code {code}"))
    summary.termination_type = term
    summary.message = msg + " (sharded fused mode)"


def _solve_sharded_cgnr_host_loop(program, options, summary, mesh, axis):
    """Generic sharded path: per-iteration sharded LM step (CGNR +
    block-Jacobi) under a host trust-region loop. Covers problems without
    Schur structure (SLAM grids, denoising) on a mesh."""
    import jax.numpy as jnp
    from .sharded import (make_sharded_cost_fn, make_sharded_lm_step)

    key = ("sharded_cgnr", options.cache_key(), id(mesh))
    cached = program._jit_cache.get(key)
    if cached is None:
        step_fn, shards_np, place = make_sharded_lm_step(program, options,
                                                         mesh, axis)
        cost_fn = make_sharded_cost_fn(program, mesh, shards_np, axis)
        placed = place(shards_np)
        program._jit_cache[key] = (step_fn, cost_fn, placed)
    else:
        step_fn, cost_fn, placed = cached

    t0 = time.time()
    x = program.initial_state()
    radius = options.initial_trust_region_radius
    decrease_factor = 2.0
    cost = float(cost_fn(x, placed))
    summary.initial_cost = cost
    it = 0
    ok_steps = bad_steps = invalid = 0
    term = TerminationType.NO_CONVERGENCE
    msg = "Maximum number of iterations reached."
    while it < options.max_num_iterations:
        out = step_fn(x, jnp.asarray(radius, program.dtype), placed)
        out = jax.device_get(out)
        it += 1
        mcc = float(out["model_cost_change"])
        grad_max = float(out["gradient_max_norm"])
        if grad_max <= options.gradient_tolerance:
            term, msg = (TerminationType.CONVERGENCE,
                         "Gradient tolerance reached.")
            break
        step_valid = np.isfinite(mcc) and mcc > 0.0
        x_new = program.plus(x, jnp.asarray(out["delta"]))
        new_cost = float(cost_fn(x_new, placed))
        rel_dec = (cost - new_cost) / mcc if mcc != 0 else 0.0
        accept = (step_valid and np.isfinite(new_cost)
                  and rel_dec > options.min_relative_decrease)
        if accept:
            if abs(cost - new_cost) <= options.function_tolerance * cost:
                x, cost = x_new, new_cost
                term, msg = (TerminationType.CONVERGENCE,
                             "Function tolerance reached.")
                ok_steps += 1
                break
            x, cost = x_new, new_cost
            radius = min(radius / max(1.0 / 3.0,
                                      1.0 - (2.0 * rel_dec - 1.0) ** 3),
                         options.max_trust_region_radius)
            decrease_factor = 2.0
            ok_steps += 1
            invalid = 0
        else:
            radius /= decrease_factor
            decrease_factor *= 2.0
            bad_steps += 1
            if not step_valid:
                invalid += 1
                if invalid >= options.max_num_consecutive_invalid_steps:
                    term, msg = (TerminationType.FAILURE,
                                 "Too many consecutive invalid steps.")
                    break
        if radius < options.min_trust_region_radius:
            term, msg = (TerminationType.CONVERGENCE,
                         "Minimum trust region radius reached.")
            break
    summary.minimizer_time_in_seconds = time.time() - t0
    summary.final_cost = cost
    summary.num_successful_steps = ok_steps
    summary.num_unsuccessful_steps = bad_steps
    summary.num_linear_solves = it
    summary.num_iterations_fused = it
    summary.termination_type = term
    summary.message = msg + " (sharded CGNR host loop)"
    return np.asarray(x)
