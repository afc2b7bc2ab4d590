"""Fine-grained sub-stage timing of the r5 flat explicit Schur assembly.

Splits compute_cell_blocks into: W/Y slab build, combo-stream compute
(no gather), the cell-sorting permutation gather, the Pallas segment
reduction, the F'F sites, and placement. Usage:

  python benchmarks/assembly_profile2.py [C P O [K]]
"""
import sys
import time

import jax
import jax.numpy as jnp

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
K = int(sys.argv[4]) if len(sys.argv) > 4 else 20

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

full_jit = jax.jit(lambda x: _full_impl(x, fams, True, program.num_tangent, groups))
cost, grad, ctx = full_jit(x0)
jax.block_until_ready(cost)
ctx_s = jax.jit(lambda c, s: c.scale_columns(s))(
    ctx, 1.0 / (1.0 + jnp.sqrt(ctx.squared_column_norms())))
diag = jnp.clip(ctx_s.squared_column_norms(), sc.min_lm_diagonal, sc.max_lm_diagonal)
D0 = jnp.sqrt(diag / 1e4).astype(jnp.float32)
jax.block_until_ready(D0)

from ceres_tpu.linear.schur import SchurOperator
from ceres_tpu.linear.schur_explicit import (
    _flat_apply_minv, _flat_outer, _flat_pair_product,
)
from ceres_tpu.ops.reduce import apply_reduce


def timed(name, fn, *args, k=K):
    @jax.jit
    def run(eps, *a):
        def body(i, acc):
            aa = [
                x + (eps * acc).astype(x.dtype)
                if hasattr(x, "dtype")
                and jnp.issubdtype(x.dtype, jnp.floating)
                else x
                for x in a
            ]
            out = fn(*aa)
            leaves = [l for l in jax.tree_util.tree_leaves(out)
                      if hasattr(l, "dtype")
                      and jnp.issubdtype(l.dtype, jnp.floating)]
            s = sum(jnp.sum(l[..., :1] if l.ndim else l).astype(jnp.float32)
                    for l in leaves)
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


op0 = SchurOperator(ctx_s, D0, ss)
Te = ss.e_tangent_size

# --- build W/Y slot slabs (as compute_cell_blocks does) -------------------
def build_wy(D):
    op = SchurOperator(ctx_s, D, ss)
    Minv = op._ete_inv.reshape(-1, Te * Te)
    Minv = jnp.concatenate([Minv, jnp.zeros((1, Te * Te), op.dtype)], axis=0)
    W = {}
    Y = {}
    for T, args in plan.slot_args:
        ws, ys = [], []
        for fi, j in args:
            ea = ss.e_arg[fi]
            E = ctx_s.jacs[fi][ea]
            F = ctx_s.jacs[fi][j]
            w = _flat_pair_product(E, F)
            m = Minv[ss.e_pos[fi]]
            ws.append(w)
            ys.append(_flat_apply_minv(m, w, Te, T))
        pad = jnp.zeros((1, Te * T), dtype=op.dtype)
        W[T] = jnp.concatenate(ws + [pad], axis=0)
        Y[T] = jnp.concatenate(ys + [pad], axis=0)
    return W, Y


timed("W/Y slab build (incl. ete inv)", build_wy, D0)

WY = jax.jit(build_wy)(D0)
jax.block_until_ready(WY)
W0, Y0 = WY

offdiag = [
    g_ for g_ in plan.corr if not g_.diagonal and g_.a_idx.shape[0]
]
g = offdiag[0] if offdiag else None
if g is not None:
    T = g.T1
    print(f"offdiag group: pairs={g.a_idx.shape[0]} C={g.num_cells} "
          f"kind={g.plan.kind}")

    timed("pair operand gathers (W+Y)",
          lambda Wt, Yt: (Wt[g.a_idx], Yt[g.b_idx]), W0[T], Y0[T])

    WaYb = jax.jit(lambda Wt, Yt: (Wt[g.a_idx], Yt[g.b_idx]))(W0[T], Y0[T])
    jax.block_until_ready(WaYb)
    Wa0, Yb0 = WaYb

    if g.plan.kind == "sorted_blocked":
        from ceres_tpu.ops.pallas_segment import outer_segment_sum_blocked

        timed("fused outer+reduce kernel",
              lambda Wa, Yb: outer_segment_sum_blocked(
                  Wa, Yb, g.plan, Te, g.T1, g.T2
              )[: g.num_cells],
              Wa0, Yb0)
        timed("gathers + fused kernel (whole stage)",
              lambda Wt, Yt: outer_segment_sum_blocked(
                  Wt[g.a_idx], Yt[g.b_idx], g.plan, Te, g.T1, g.T2
              )[: g.num_cells],
              W0[T], Y0[T])

    timed("XLA outer + reduce (fallback path)",
          lambda Wa, Yb: apply_reduce(
              g.plan, _flat_outer(Wa, Yb, Te, g.T1, g.T2)
          )[: g.num_cells],
          Wa0, Yb0)

# --- F'F sites ------------------------------------------------------------
def ftf_all(D):
    out = []
    for s in plan.ftf:
        FA = ctx_s.jacs[s.fi][s.jA]
        FB = ctx_s.jacs[s.fi][s.jB]
        Cc = s.rows.shape[0]
        X = _flat_pair_product(FA, FB)[s.perm]
        blocks = apply_reduce(s.plan, X)[:Cc]
        out.append(blocks + D[:1] * 0.0)
    return out


timed("F'F sites", ftf_all, D0)

# diag corr groups (self pairs)
for g2 in plan.corr:
    if g2.combo_n:
        continue
    def diag_corr(Wt, Yt, g2=g2):
        if g2.self_pairs:
            nat = _flat_outer(Wt, Yt, Te, g2.T1, g2.T1)
            contrib = nat[g2.a_idx]
        else:
            Wa = Wt[g2.a_idx]
            Yb = Yt[g2.b_idx]
            contrib = _flat_outer(Wa, Yb, Te, g2.T1, g2.T2)
        return apply_reduce(g2.plan, contrib)[: g2.num_cells]
    timed(f"corr group T=({g2.T1},{g2.T2}) diag={g2.diagonal} "
          f"self={g2.self_pairs}", diag_corr, W0[g2.T1], Y0[g2.T2])
