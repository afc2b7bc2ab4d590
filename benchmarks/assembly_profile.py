"""Sub-stage device timing of the explicit Schur assembly (round-5 kernel work).

Breaks the 562 ms/iter `dense_reduced_system` into its pieces on the real
chip, amortized inside a jitted fori_loop (same protocol as
stage_profile2.py), and times candidate reformulations side by side.

Usage: python benchmarks/assembly_profile.py [C P O [K]]
"""
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
K = int(sys.argv[4]) if len(sys.argv) > 4 else 10
import os
STAGES = set(os.environ.get("STAGES", "").split(",")) - {""}

def want(s):
    return not STAGES or s in STAGES

print("devices:", jax.devices(), flush=True)
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
print(f"setup: {time.time()-t0:.1f}s", flush=True)

# ---- plan statistics --------------------------------------------------------
print(f"plan: nf={plan.nf} grid_ok={plan.grid_ok} "
      f"grouped_identity={plan.grouped_identity}")
print(f"  ftf parts: {len(plan.ftf)}")
for p_ in plan.ftf:
    for nm in ("diag", "low", "lowt"):
        pl_ = getattr(p_, f"plan_{nm}")
        if pl_ is not None:
            r = getattr(p_, f"rows_{nm}")
            print(f"    fi={p_.fi} j1={p_.j1} j2={p_.j2} {nm}: kind={pl_.kind} "
                  f"C={r.shape[0]} T=({r.shape[1]})")
print(f"  corr cells: {len(plan.corr)} groups")
tot_pair_slots = 0
for cc in plan.corr:
    Cc, Kc = cc.a_idx.shape
    valid = int(np.sum(np.asarray(cc.a_idx) < 10**9))
    nvalid = int(np.sum(np.asarray(cc.a_idx) != (cc.a_idx.max())))
    tot_pair_slots += Cc * Kc
    print(f"    T=({cc.T1},{cc.T2}) diag={cc.diagonal} C={Cc} K={Kc} "
          f"slots={Cc*Kc}")
print(f"  total ELL pair slots: {tot_pair_slots}")

# ---- build the fixed ctx / operator ----------------------------------------
full_jit = jax.jit(lambda x: _full_impl(x, fams, True, program.num_tangent, groups))
cost, grad, ctx = full_jit(x0)
jax.block_until_ready(cost)
scaling = 1.0 / (1.0 + jnp.sqrt(ctx.squared_column_norms()))
ctx_s = jax.jit(lambda c, s: c.scale_columns(s))(ctx, scaling)
diag = jnp.clip(ctx_s.squared_column_norms(), sc.min_lm_diagonal, sc.max_lm_diagonal)
D0 = jnp.sqrt(diag / 1e4).astype(jnp.float32)
jax.block_until_ready(D0)

from ceres_tpu.linear.schur import SchurOperator


def timed(name, fn, *args, k=K):
    """Amortized: run fn k times in a fori_loop with a fake data dep."""
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


# 1. Full assembly (what the LM step calls)
def full_assembly(D):
    op = SchurOperator(ctx_s, D, ss)
    from ceres_tpu.linear.schur_explicit import assemble_reduced_system
    return assemble_reduced_system(op, plan)

if want("full"):
    timed("full assembly (S)", full_assembly, D0)


# 2. Operator construction alone (E'E inverse etc.)
def op_build(D):
    op = SchurOperator(ctx_s, D, ss)
    return op._ete_inv

if want("op"):
    timed("op build (ete_inv)", op_build, D0)


# 3. W/Y slabs alone
def wy_build(D):
    op = SchurOperator(ctx_s, D, ss)
    dt_ = op.dtype
    Te = ss.e_tangent_size
    Minv = jnp.concatenate(
        [op._ete_inv, jnp.zeros((1, Te, Te), dtype=dt_)], axis=0)
    outs = []
    for T, args in plan.slot_args:
        for fi, j in args:
            ea = ss.e_arg[fi]
            E = ctx_s.jacs[fi][ea]
            F = ctx_s.jacs[fi][j]
            w = jnp.einsum("bre,brt->bet", E, F)
            m = Minv[ss.e_pos[fi]]
            y = jnp.einsum("bef,bft->bet", m, w)
            outs.append((w, y))
    return outs

if want("wy"):
    timed("W/Y build", wy_build, D0)


# 4. cell blocks (compute_cell_blocks = W/Y + gathers + dots, no placement)
def cells_only(D):
    op = SchurOperator(ctx_s, D, ss)
    from ceres_tpu.linear.schur_explicit import compute_cell_blocks
    _, blocks = compute_cell_blocks(op, plan)
    return blocks

if want("cells"):
    timed("cell blocks (no placement)", cells_only, D0)


# 5. correction contraction alone, given precomputed W/Y (current form)
def _wy_concat(D):
    op = SchurOperator(ctx_s, D, ss)
    dt_ = op.dtype
    Te = ss.e_tangent_size
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
        W[T] = jnp.concatenate(ws + [pad], axis=0)
        Y[T] = jnp.concatenate(ys + [pad], axis=0)
    return W, Y

NEED_WY = not STAGES or STAGES & {"corr", "gather", "flat27", "gather27"}
WY = jax.jit(_wy_concat)(D0) if NEED_WY else None
if NEED_WY: jax.block_until_ready(WY)
Te = ss.e_tangent_size


def corr_current(W, Y):
    outs = []
    for cc in plan.corr:
        Cc, Kc = cc.a_idx.shape
        Wa = W[cc.T1][cc.a_idx.reshape(-1)].reshape(Cc, Kc * Te, cc.T1)
        Yb = Y[cc.T2][cc.b_idx.reshape(-1)].reshape(Cc, Kc * Te, cc.T2)
        blocks = -jax.lax.dot_general(Wa, Yb, (((1,), (1,)), ((0,), (0,))))
        outs.append(blocks)
    return outs

if want("corr"):
    timed("corr contraction (current ELL)", corr_current, *WY)


# 5b. raw gather cost alone
def corr_gather_only(W, Y):
    outs = []
    for cc in plan.corr:
        Wa = W[cc.T1][cc.a_idx.reshape(-1)]
        Yb = Y[cc.T2][cc.b_idx.reshape(-1)]
        outs.append((Wa, Yb))
    return outs

if want("gather"):
    timed("corr gathers only", corr_gather_only, *WY)


# 5c. variant: flatten W to (N,27) first, gather 27-wide, dot over (K*3)
def _wflat(W):
    return {T: w.reshape(w.shape[0], -1) for T, w in W.items()}

NEED_F = not STAGES or STAGES & {"flat27", "gather27"}
WF = jax.jit(_wflat)(WY[0]) if NEED_F else None
YF = jax.jit(_wflat)(WY[1]) if NEED_F else None
if NEED_F: jax.block_until_ready((WF, YF))


def corr_flat27(WFv, YFv):
    outs = []
    for cc in plan.corr:
        Cc, Kc = cc.a_idx.shape
        Wa = WFv[cc.T1][cc.a_idx.reshape(-1)]  # (C*K, 27)
        Yb = YFv[cc.T2][cc.b_idx.reshape(-1)]
        Wa = Wa.reshape(Cc, Kc, Te * cc.T1)
        Yb = Yb.reshape(Cc, Kc, Te * cc.T2)
        T27 = jax.lax.dot_general(Wa, Yb, (((1,), (1,)), ((0,), (0,))))
        # blocks[c,i,j] = sum_e T27[c, e*T1+i, e*T2+j]
        b = sum(T27[:, e * cc.T1:(e + 1) * cc.T1, e * cc.T2:(e + 1) * cc.T2]
                for e in range(Te))
        outs.append(-b)
    return outs

if want("flat27"):
    timed("corr flat27 gather+dot", corr_flat27, WF, YF)


# 5d. gather flat-27 only
def corr_gather27(WFv, YFv):
    outs = []
    for cc in plan.corr:
        outs.append((WFv[cc.T1][cc.a_idx.reshape(-1)],
                     YFv[cc.T2][cc.b_idx.reshape(-1)]))
    return outs

if want("gather27"):
    timed("corr gathers only (27-wide)", corr_gather27, WF, YF)


# 6. F'F part alone
def ftf_only(D):
    op = SchurOperator(ctx_s, D, ss)
    from ceres_tpu.ops.reduce import apply_reduce
    outs = []
    for part in plan.ftf:
        F1 = ctx_s.jacs[part.fi][part.j1]
        F2 = ctx_s.jacs[part.fi][part.j2]
        X = jnp.einsum("bri,brj->bij", F1, F2)
        for nm in ("diag", "low", "lowt"):
            pl_ = getattr(part, f"plan_{nm}")
            if pl_ is not None:
                outs.append(apply_reduce(pl_, X))
    return outs

if want("ftf"):
    timed("F'F reduce", ftf_only, D0)


# 7. placement alone (precompute blocks once, then place)
from ceres_tpu.linear.schur_explicit import compute_cell_blocks


def _blocks(D):
    op = SchurOperator(ctx_s, D, ss)
    return compute_cell_blocks(op, plan)

NEED_B = not STAGES or "place" in STAGES
sites, blocks0 = jax.jit(lambda D: _blocks(D))(D0) if NEED_B else (None, None)
if NEED_B: jax.block_until_ready(blocks0)


def place_only(blocks):
    nf = plan.nf
    S_d = jnp.zeros((nf, nf), jnp.float32)
    S_l = jnp.zeros((nf, nf), jnp.float32)
    for site, blocks_ in zip(sites, blocks):
        if site.inv is not None:
            Cc, T1, T2 = blocks_.shape
            bp = jnp.concatenate(
                [blocks_, jnp.zeros((1, T1, T2), blocks_.dtype)], axis=0)
            grid = bp[site.inv]
            rect = grid.transpose(0, 2, 1, 3).reshape(
                site.inv.shape[0] * T1, site.inv.shape[1] * T2)
            r0, c0 = site.offs
            S = S_d if site.diagonal else S_l
            cur = jax.lax.dynamic_slice(S, (r0, c0), rect.shape)
            S = jax.lax.dynamic_update_slice(S, cur + rect, (r0, c0))
            if site.diagonal:
                S_d = S
            else:
                S_l = S
    return S_d + S_l + S_l.T

if want("place"):
    timed("placement (grid gather + DUS)", place_only, blocks0)
