"""Sub-stage device timing of the explicit Schur assembly (r5 flat form).

Usage: STAGES=full,op,wy,cells,place python benchmarks/assembly_profile.py [C P O [K]]
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
print(f"plan: nf={plan.nf} grid_ok={plan.grid_ok} "
      f"ftf_sites={len(plan.ftf)} corr_groups={len(plan.corr)}")
for s_ in plan.ftf:
    print(f"  ftf fi={s_.fi} ({s_.jA},{s_.jB}) diag={s_.diagonal} "
          f"C={s_.rows.shape[0]} "
          f"perm={'none' if s_.perm is None else s_.perm.shape[0]} "
          f"kind={s_.plan.kind}")
for g_ in plan.corr:
    print(f"  corr T=({g_.T1},{g_.T2}) diag={g_.diagonal} C={g_.num_cells} "
          f"pairs={g_.a_idx.shape[0]} natural={g_.natural} "
          f"kind={g_.plan.kind}")

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
    assemble_reduced_system, compute_cell_blocks, plan_sites,
)


def timed(name, fn, *args, k=K):
    """Amortized device timing, stage_profile2 protocol: every float arg
    is perturbed by eps*carry (eps=0.0 at runtime) so rep i+1 DEPENDS on
    rep i — without this, XLA's while-loop-invariant code motion hoists
    the whole stage out of the loop and the measurement reads ~k x low
    (the r5 harness bug)."""
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


if want("full"):
    timed("full assembly (S)",
          lambda D: assemble_reduced_system(SchurOperator(ctx_s, D, ss), plan),
          D0)

if want("op"):
    timed("op build (ete_inv)",
          lambda D: SchurOperator(ctx_s, D, ss)._ete_inv, D0)

if want("cells"):
    timed("cell blocks (no placement)",
          lambda D: compute_cell_blocks(SchurOperator(ctx_s, D, ss), plan)[1],
          D0)

if want("place"):
    sites = plan_sites(plan)
    blocks0 = jax.jit(
        lambda D: compute_cell_blocks(SchurOperator(ctx_s, D, ss), plan)[1]
    )(D0)
    jax.block_until_ready(blocks0)

    def place_only(blocks):
        nf = plan.nf
        S_d = jnp.zeros((nf, nf), jnp.float32)
        S_l = jnp.zeros((nf, nf), jnp.float32)
        for site, b in zip(sites, blocks):
            Cc = b.shape[0]
            T1, T2 = site.T1, site.T2
            bp = jnp.concatenate([b, jnp.zeros((1, T1 * T2), b.dtype)], 0)
            grid = bp[site.inv]
            rect = (grid.reshape(site.inv.shape[0], site.inv.shape[1], T1, T2)
                    .transpose(0, 2, 1, 3)
                    .reshape(site.inv.shape[0] * T1, site.inv.shape[1] * T2))
            r0, c0 = site.offs
            S = S_d if site.diagonal else S_l
            cur = jax.lax.dynamic_slice(S, (r0, c0), rect.shape)
            S = jax.lax.dynamic_update_slice(S, cur + rect, (r0, c0))
            if site.diagonal:
                S_d = S
            else:
                S_l = S
        return S_d + S_l + S_l.T

    timed("placement (grid gather + DUS)", place_only, blocks0)

if want("chol"):
    S0 = jax.jit(
        lambda D: assemble_reduced_system(SchurOperator(ctx_s, D, ss), plan)
    )(D0)
    jax.block_until_ready(S0)

    def chol(S):
        c, low = jax.scipy.linalg.cho_factor(S, lower=True)
        return jax.scipy.linalg.cho_solve((c, low), S[0])

    timed("cho_factor+solve", chol, S0)

if want("iter"):
    from ceres_tpu.trust_region import _tr_iteration_impl
    from ceres_tpu.evaluator import _full_impl as _fi

    scaling0 = 1.0 / (1.0 + jnp.sqrt(ctx.squared_column_norms()))
    radius0 = jnp.asarray(1e4, jnp.float64)

    def one_iter(x):
        cand, cand_ctx, cand_grad, scalars = _tr_iteration_impl(
            x, ctx, radius0, scaling0, program.plus_struct, solve_aux,
            sc, True, True,
        )
        return cand, scalars

    timed("FULL fused iteration", one_iter, x0)

    # variant without the speculative candidate evaluation
    import ceres_tpu.trust_region as _tr

    def iter_no_spec(x):
        ctx_used = ctx.scale_columns(scaling0)
        diag2 = jnp.clip(ctx_used.squared_column_norms(),
                         sc.min_lm_diagonal, sc.max_lm_diagonal)
        D = _tr._lm_damping(diag2, radius0)
        y, li, lt = _tr._linear_solve(ctx_used, D, solve_aux, sc)
        step = -y.astype(diag2.dtype)
        Js = ctx_used.matvec(step)
        mcc = jnp.asarray(0.0, jnp.float64)
        for fi2 in range(len(ctx_used.families)):
            mcc = mcc - jnp.sum(Js[fi2].astype(jnp.float64) * (
                ctx_used.residuals[fi2].astype(jnp.float64)
                + Js[fi2].astype(jnp.float64) / 2.0))
        from ceres_tpu.problem import plus_apply
        cand = plus_apply(program.plus_struct, x, step * scaling0)
        return cand, mcc

    timed("iteration w/o spec eval", iter_no_spec, x0)

    def linsolve_only(x):
        ctx_used = ctx.scale_columns(scaling0)
        diag2 = jnp.clip(ctx_used.squared_column_norms(),
                         sc.min_lm_diagonal, sc.max_lm_diagonal)
        D = _tr._lm_damping(diag2, radius0)
        y, li, lt = _tr._linear_solve(ctx_used, D, solve_aux, sc)
        return y

    timed("scale+linear_solve only", linsolve_only, x0)
