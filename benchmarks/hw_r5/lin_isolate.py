import sys, os, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import ceres_tpu as ct
import ceres_tpu.ops.pallas_lin as PL
from ceres_tpu.io.bal import synthetic_bal_problem, build_bal_ceres_problem
from ceres_tpu.program import CompiledProgram
from ceres_tpu.solvers.schur import detect_schur_structure

VARIANT = os.environ.get("VARIANT", "full")
orig_kernel = PL._lin_kernel

def patched(xf_ref, xe_ref, oh_ref, mask_ref, obsx_ref, obsy_ref,
            se_ref, first_ref, ete_ref, ge_ref, seo_ref, a_ref,
            ftf_ref, gf_ref, *, te, tf, kf, k, eo, fo, loss=None,
            use_scaling=True):
    from jax.experimental import pallas as pl
    from ceres_tpu.ops.jetlib import (_jvar, _snavely_residual_jets,
                                      _correct_jets, _jet_planes)
    nt = tf + te
    mask = mask_ref[...]
    @pl.when(pl.program_id(0) == 0)
    def _init():
        ftf_ref[...] = jnp.zeros_like(ftf_ref)
        gf_ref[...] = jnp.zeros_like(gf_ref)
    cam = []
    for a in range(tf):
        plane = None
        for c in range(kf):
            term = oh_ref[c, :, :] * xf_ref[c * tf + a]
            plane = term if plane is None else plane + term
        cam.append(_jvar(plane, fo + a))
    pt = [_jvar(xe_ref[a, :][None, :], eo + a) for a in range(te)]
    rx, ry = _snavely_residual_jets(cam, pt, obsx_ref[...], obsy_ref[...], mask > 0.5)
    rvals, rcols = [], []
    for jet in (rx, ry):
        v, cols = _jet_planes(jet, mask, nt)
        rvals.append(v); rcols.append(cols)
    # EtE/g_e/scale
    cn = [None]*te
    for a in range(te):
        ca = [rcols[r][eo+a] for r in range(2)]
        g = None
        for r in range(2):
            if ca[r] is None: continue
            g = ca[r]*rvals[r] if g is None else g + ca[r]*rvals[r]
        ge_ref[a, :] = (jnp.zeros_like(mask) if g is None else g).sum(axis=0)
        for b in range(a, te):
            cb = [rcols[r][eo+b] for r in range(2)]
            acc = None
            for r in range(2):
                if ca[r] is None or cb[r] is None: continue
                acc = ca[r]*cb[r] if acc is None else acc + ca[r]*cb[r]
            plane = (jnp.zeros_like(mask) if acc is None else acc).sum(axis=0)
            ete_ref[a*te+b, :] = plane
            if b != a: ete_ref[b*te+a, :] = plane
            else: cn[a] = plane
    se = []
    for a in range(te):
        s = 1.0/(1.0+jnp.sqrt(cn[a]))
        s = jnp.where(first_ref[0] > 0.5, s, se_ref[a, :])
        se.append(s); seo_ref[a, :] = s
    zero = jnp.zeros_like(mask[0])
    ge_planes = {}
    for a in range(te):
        for t in range(tf):
            acc = None
            for r in range(2):
                pa, pf = rcols[r][eo+a], rcols[r][fo+t]
                if pa is None or pf is None: continue
                acc = pa*pf if acc is None else acc + pa*pf
            ge_planes[(a,t)] = acc
    if VARIANT == "mxu_ftf_noA":
        a_ref[...] = jnp.zeros_like(a_ref)
    elif VARIANT == "mxu_ftf_midA":
        oh_all = oh_ref[...]                      # [kf, k, T]
        zero_kt2 = jnp.zeros_like(mask)
        at_rows = []
        for a in range(te):
            for t in range(tf):
                gp = ge_planes[(a, t)]
                gp = gp if gp is not None else zero_kt2
                at_rows.append((oh_all * gp[None]).sum(axis=1)
                               * se[a][None, :])   # [kf, T]
        A4 = jnp.stack(at_rows)                    # [te*tf, kf, T]
        A4 = A4.reshape(te, tf, kf, A4.shape[-1]).transpose(0, 2, 1, 3)
        a_ref[...] = A4.reshape(te, kf * tf, A4.shape[-1])
    elif VARIANT == "bigops":
        oh_all = oh_ref[...]                      # [kf, k, T]
        zero_kt = jnp.zeros_like(mask)
        gp_stack = jnp.stack([
            ge_planes[(a, t)] if ge_planes[(a, t)] is not None else zero_kt
            for a in range(te) for t in range(tf)])   # [te*tf, k, T]
        A4 = (gp_stack[:, None] * oh_all[None]).sum(axis=2)  # [tetf, kf, T]
        se_rows = jnp.stack([se[a] for a in range(te) for _ in range(tf)])
        A4 = A4 * se_rows[:, None, :]
        A4 = A4.reshape(te, tf, kf, A4.shape[-1]).transpose(0, 2, 1, 3)
        a_ref[...] = A4.reshape(te, kf * tf, A4.shape[-1])
    elif VARIANT != "no_A" or VARIANT == "mxu_ftf":
        for c in range(kf):
            ohc = oh_ref[c]
            for a in range(te):
                for t in range(tf):
                    gp = ge_planes[(a,t)]
                    if gp is None: a_ref[a, c*tf+t, :] = zero; continue
                    a_ref[a, c*tf+t, :] = (gp*ohc).sum(axis=0)*se[a]
    else:
        a_ref[...] = jnp.zeros_like(a_ref)
    if VARIANT in ("bigops", "mxu_ftf", "mxu_ftf_midA", "mxu_ftf_noA"):
        oh = oh_ref[...]
        zero_kt = jnp.zeros_like(mask)
        P_list = []
        for t in range(tf):
            for u in range(t, tf):
                P = None
                for r in range(2):
                    pt_, pu_ = rcols[r][fo+t], rcols[r][fo+u]
                    if pt_ is None or pu_ is None: continue
                    P = pt_*pu_ if P is None else P + pt_*pu_
                P_list.append(P if P is not None else zero_kt)
        G_list = []
        for t in range(tf):
            G = None
            for r in range(2):
                pt_ = rcols[r][fo+t]
                if pt_ is None: continue
                G = pt_*rvals[r] if G is None else G + pt_*rvals[r]
            G_list.append(G if G is not None else zero_kt)
        Q = jnp.stack(P_list + G_list)            # [npair+tf, k, T]
        if VARIANT in ("mxu_ftf", "mxu_ftf_midA", "mxu_ftf_noA"):
            W = None
            for kk in range(k):
                d = jax.lax.dot_general(
                    oh[:, kk, :], Q[:, kk, :],
                    (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)   # [kf, npair+tf]
                W = d if W is None else W + d
            W = W.T                                       # [npair+tf, kf]
        else:
            W = (Q[:, None] * oh[None]).sum(axis=2).sum(axis=-1, keepdims=True)[:, :, 0]
        npair = len(P_list)
        ftf_full = [None]*(tf*tf)
        idx = 0
        for t in range(tf):
            for u in range(t, tf):
                col = W[idx][:, None]
                ftf_full[t*tf+u] = col; ftf_full[u*tf+t] = col
                idx += 1
        ftf_ref[...] += jnp.concatenate(ftf_full, axis=1)
        gf_ref[...] += W[npair:].T
    elif VARIANT != "no_ftf":
        oh = oh_ref[...]
        ftf_cols = [None]*(tf*tf)
        for t in range(tf):
            for u in range(t, tf):
                P = None
                for r in range(2):
                    pt_, pu_ = rcols[r][fo+t], rcols[r][fo+u]
                    if pt_ is None or pu_ is None: continue
                    P = pt_*pu_ if P is None else P + pt_*pu_
                col = (jnp.zeros((kf,1), mask.dtype) if P is None else
                       (oh*P[None]).sum(axis=1).sum(axis=1, keepdims=True))
                ftf_cols[t*tf+u] = col; ftf_cols[u*tf+t] = col
        ftf_ref[...] += jnp.concatenate(ftf_cols, axis=1)
        gf_cols = []
        for t in range(tf):
            G = None
            for r in range(2):
                pt_ = rcols[r][fo+t]
                if pt_ is None: continue
                G = pt_*rvals[r] if G is None else G + pt_*rvals[r]
            gf_cols.append((jnp.zeros((kf,1), mask.dtype) if G is None else
                            (oh*G[None]).sum(axis=1).sum(axis=1, keepdims=True)))
        gf_ref[...] += jnp.concatenate(gf_cols, axis=1)

PL._lin_kernel = patched

bal = synthetic_bal_problem(num_cameras=16, num_points=22106, num_observations=83718, seed=7, pixel_noise=1.0)
bal.perturb(rotation_sigma=0.1, translation_sigma=1.0, point_sigma=0.5, seed=8)
problem, _, _ = build_bal_ceres_problem(bal)
opts = ct.SolverOptions(linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
                        use_mixed_precision_solves=True, fused_iterations=True)
prog = CompiledProgram.get_cached(problem, opts)
meta = detect_schur_structure(prog, opts)
print("k =", meta.buckets[0].chunk_rows.shape[1], "ne =", meta.ne)
plin = PL.make_pallas_lin(prog, opts, meta)
assert plin is not None
x0 = jnp.asarray(prog.initial_state())
ones_se = jnp.ones((plin.ne_pad, meta.te), jnp.float32)

def p_plin(c):
    o = plin.lin(x0 * (1.0 + 1e-30 * c), ones_se, None)
    return c + 1e-40 * jnp.sum(o["g_e"][0]).astype(x0.dtype)

def runner(K):
    def f(c):
        return jax.lax.fori_loop(0, K, lambda i, cc: p_plin(cc + 1e-30*i), c)
    return prog.jit_with_consts(f, (jax.ShapeDtypeStruct((), x0.dtype),))

r4, r36 = runner(4), runner(36)
jax.device_get(r4(jnp.asarray(1.0, x0.dtype))); jax.device_get(r36(jnp.asarray(1.0001, x0.dtype)))
def timed(r, seeds):
    ws = []
    for s in seeds:
        t0 = time.perf_counter(); jax.device_get(r(jnp.asarray(s, x0.dtype))); ws.append(time.perf_counter()-t0)
    return sorted(ws)[len(ws)//2]
t4 = timed(r4, [1.1, 1.2, 1.3]); t36 = timed(r36, [1.4, 1.5, 1.6])
print(f"{VARIANT}: {(t36-t4)/32*1e3:.3f} ms/iter (K4 {t4*1e3:.1f} K36 {t36*1e3:.1f})")
