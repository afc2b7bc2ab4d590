"""Experiment: flat sorted-pair correction contraction vs the ELL path.

Builds the large-BAL explicit plan, reconstructs the off-diagonal
correction pairs as FLAT cell-sorted arrays, and times each stage of the
candidate pipeline on the real chip:

  gather (PAIRS,27) -> per-pair outer (PAIRS,81) -> Pallas sorted
  segment-sum by cell -> (C,81)

Usage: STAGES=... python benchmarks/exp_pair.py [C P O [K]]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import dataclasses

from ceres_tpu.models import bal
from ceres_tpu.evaluator import _full_impl
from ceres_tpu.problem import cast_program
from ceres_tpu.trust_region import _build_solve_aux, _config_from_options

C = int(sys.argv[1]) if len(sys.argv) > 1 else 464
P = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
O = int(sys.argv[3]) if len(sys.argv) > 3 else 1_200_000
K = int(sys.argv[4]) if len(sys.argv) > 4 else 5
STAGES = set(os.environ.get("STAGES", "").split(",")) - {""}


def want(s):
    return not STAGES or s in STAGES


t0 = time.time()
prob = bal.synthesize_bal(num_cameras=C, num_points=P, num_observations=O,
                          noise=2.0, perturb=0.7, seed=7)
problem, _, _ = bal.build_problem(prob)
opts = bal.default_options(iterative=False)
opts.evaluation_dtype = "float32"
program = problem.program()
cast_program(program, opts.evaluation_dtype)
resolved = dataclasses.replace(
    opts, linear_solver_type=opts.resolved_linear_solver_type(program.num_tangent)
)
sc = _config_from_options(resolved, program)
solve_aux = _build_solve_aux(resolved, program)
x0 = program.initial_ambient().astype(jnp.float32)
groups = program.jnp_bd_groups()
fams = program.families
ss = solve_aux["ss"]
plan = ss.explicit
Te = ss.e_tangent_size
print(f"setup: {time.time()-t0:.1f}s", flush=True)

# ---- flat pair arrays from the ELL plan (host) ------------------------------
t0 = time.time()
flat = {}
for gi, cc in enumerate(plan.corr):
    a = np.asarray(cc.a_idx)
    b = np.asarray(cc.b_idx)
    Cc, Kc = a.shape
    N1 = int(a.max())  # pad value == N1 slot count
    valid = a < N1 if (a == N1).any() else np.ones_like(a, bool)
    cell = np.broadcast_to(np.arange(Cc)[:, None], (Cc, Kc))
    fa = a[valid]
    fb = b[valid]
    fc = cell[valid]
    # already cell-sorted by construction (row-major over cells)
    flat[gi] = (fa.astype(np.int32), fb.astype(np.int32),
                fc.astype(np.int64), Cc, cc.diagonal)
    print(f"group {gi}: diag={cc.diagonal} C={Cc} K={Kc} "
          f"pairs={fa.shape[0]} (ell slots {Cc*Kc})", flush=True)
print(f"flat build: {time.time()-t0:.1f}s", flush=True)

# ---- device W/Y -------------------------------------------------------------
full_jit = jax.jit(lambda x: _full_impl(x, fams, True, program.num_tangent, groups))
cost, grad, ctx = full_jit(x0)
jax.block_until_ready(cost)
ctx_s = jax.jit(lambda c, s: c.scale_columns(s))(
    ctx, 1.0 / (1.0 + jnp.sqrt(ctx.squared_column_norms())))
diag = jnp.clip(ctx_s.squared_column_norms(), sc.min_lm_diagonal, sc.max_lm_diagonal)
D0 = jnp.sqrt(diag / 1e4).astype(jnp.float32)
jax.block_until_ready(D0)

from ceres_tpu.linear.schur import SchurOperator


def _wy_flat(D):
    op = SchurOperator(ctx_s, D, ss)
    dt_ = op.dtype
    Minv = jnp.concatenate(
        [op._ete_inv, jnp.zeros((1, Te, Te), dtype=dt_)], axis=0)
    W = {}
    Y = {}
    for T, args in plan.slot_args:
        ws, ys = [], []
        for fi, j in args:
            ea = ss.e_arg[fi]
            E = ctx_s.jacs[fi][ea]
            F = ctx_s.jacs[fi][j]
            w = jnp.einsum("bre,brt->bet", E, F)
            m = Minv[ss.e_pos[fi]]
            ws.append(w)
            ys.append(jnp.einsum("bef,bft->bet", m, w))
        pad = jnp.zeros((1, Te, T), dtype=dt_)
        W[T] = jnp.concatenate(ws + [pad], axis=0).reshape(-1, Te * T)
        Y[T] = jnp.concatenate(ys + [pad], axis=0).reshape(-1, Te * T)
    return W, Y

WF, YF = jax.jit(_wy_flat)(D0)
jax.block_until_ready((WF, YF))

# segment plans for the cell sums (host, once)
from ceres_tpu.ops.reduce import apply_reduce, build_reduce_plan

seg_plans = {}
dev_idx = {}
for gi, (fa, fb, fcell, Cc, diag_flag) in flat.items():
    seg_plans[gi] = build_reduce_plan(fcell, Cc)
    dev_idx[gi] = (jnp.asarray(fa), jnp.asarray(fb))
    print(f"group {gi}: plan kind={seg_plans[gi].kind}", flush=True)


def timed(name, fn, *args, k=K):
    @jax.jit
    def run(eps, *a):
        def body(i, acc):
            out = fn(*a)
            leaves = [l for l in jax.tree_util.tree_leaves(out)
                      if hasattr(l, "dtype")]
            s = sum(jnp.sum(l[..., :1].astype(jnp.float32))
                    for l in leaves[:1])
            return acc + eps * s
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    eps = jnp.float32(0.0)
    t0 = time.time()
    r = run(eps, *args)
    jax.block_until_ready(r)
    compile_s = time.time() - t0
    t0 = time.time()
    r = run(eps, *args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / k
    print(f"{name:44s} {dt*1e3:9.2f} ms/rep (compile {compile_s:.1f}s)",
          flush=True)
    return dt


T1 = T2 = 9  # BAL


def gather_only(W, Y):
    outs = []
    for gi, (ia, ib) in dev_idx.items():
        outs.append((W[9][ia], Y[9][ib]))
    return outs


def outer_via_einsum(W, Y):
    outs = []
    for gi, (ia, ib) in dev_idx.items():
        Wa = W[9][ia].reshape(-1, Te, 9)
        Yb = Y[9][ib].reshape(-1, Te, 9)
        outs.append(jnp.einsum("pei,pej->pij", Wa, Yb).reshape(-1, 81))
    return outs


# static column-index variant: (P, 243) elementwise then 3-way add
IDX_A = np.zeros(Te * 81, np.int32)
IDX_B = np.zeros(Te * 81, np.int32)
for e in range(Te):
    for i in range(9):
        for j in range(9):
            IDX_A[e * 81 + 9 * i + j] = e * 9 + i
            IDX_B[e * 81 + 9 * i + j] = e * 9 + j
IDX_A = jnp.asarray(IDX_A)
IDX_B = jnp.asarray(IDX_B)


def outer_via_cols(W, Y):
    outs = []
    for gi, (ia, ib) in dev_idx.items():
        Wa = W[9][ia]
        Yb = Y[9][ib]
        A3 = Wa[:, IDX_A].reshape(-1, Te, 81)
        B3 = Yb[:, IDX_B].reshape(-1, Te, 81)
        outs.append(jnp.sum(A3 * B3, axis=1))
    return outs


def chain_einsum(W, Y):
    outs = []
    for gi, (ia, ib) in dev_idx.items():
        Wa = W[9][ia].reshape(-1, Te, 9)
        Yb = Y[9][ib].reshape(-1, Te, 9)
        contrib = jnp.einsum("pei,pej->pij", Wa, Yb).reshape(-1, 81)
        red = apply_reduce(seg_plans[gi], contrib)
        outs.append(red)
    return outs


def segsum_only(contribs):
    outs = []
    for gi in dev_idx:
        outs.append(apply_reduce(seg_plans[gi], contribs[gi]))
    return outs


if want("gather"):
    timed("flat gather only", gather_only, WF, YF)
if want("outer"):
    timed("gather + outer (einsum)", outer_via_einsum, WF, YF)
if want("outercols"):
    timed("gather + outer (static cols)", outer_via_cols, WF, YF)
if want("chain"):
    timed("full chain gather+outer+segsum", chain_einsum, WF, YF)
if want("segsum"):
    contribs = {gi: jax.jit(lambda W, Y, ia=ia, ib=ib: jnp.einsum(
        "pei,pej->pij", W[9][ia].reshape(-1, Te, 9),
        Y[9][ib].reshape(-1, Te, 9)).reshape(-1, 81))(WF, YF)
        for gi, (ia, ib) in dev_idx.items()}
    jax.block_until_ready(contribs)
    timed("segsum only", segsum_only, contribs)

# correctness check vs current ELL path
if want("check"):
    from ceres_tpu.linear.schur_explicit import compute_cell_blocks
    op = SchurOperator(ctx_s, D0, ss)
    sites, blocks = jax.jit(
        lambda D: compute_cell_blocks(SchurOperator(ctx_s, D, ss), plan)
    )(D0)
    new = jax.jit(chain_einsum)(WF, YF)
    # corr sites come after ftf sites in compute_cell_blocks order
    n_ftf = sum(
        (p.plan_diag is not None) + (p.plan_low is not None)
        + (p.plan_lowt is not None) for p in plan.ftf
    )
    for gi in dev_idx:
        old = np.asarray(blocks[n_ftf + gi]).reshape(-1, 81)
        got = -np.asarray(new[gi])[: old.shape[0]]
        err = np.max(np.abs(old - got)) / (np.max(np.abs(old)) + 1e-30)
        print(f"group {gi}: max rel err {err:.2e}", flush=True)
