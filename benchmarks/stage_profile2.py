"""Amortized stage-by-stage device timing of the fused-LM body.

stage_profile.py timed one dispatch per stage; on the axon tunnel a
host sync costs ~0.1 ms but any host readback ~400 ms, and one-shot
timings are noisy. Here each stage runs K times inside a single jitted
lax.fori_loop with a data dependence between reps (carry perturbed by
eps * a scalar slice of the stage output, eps=0.0 passed at runtime so
XLA cannot fold the chain), so per-rep time is pure device time.

Usage: python benchmarks/stage_profile2.py [C P O [K]]
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
from ceres_tpu.evaluator import _cost_impl, _full_impl
from ceres_tpu.problem import cast_program, plus_apply
from ceres_tpu.trust_region import (
    _build_solve_aux,
    _config_from_options,
    _linear_solve,
)

C = int(sys.argv[1]) if len(sys.argv) > 1 else 464
P = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
O = int(sys.argv[3]) if len(sys.argv) > 3 else 1_200_000
K = int(sys.argv[4]) if len(sys.argv) > 4 else 10

print("devices:", jax.devices(), flush=True)
t0 = time.time()
prob = bal.synthesize_bal(num_cameras=C, num_points=P, num_observations=O,
                          noise=2.0, perturb=0.7, seed=7)
problem, _, _ = bal.build_problem(prob)
_dense = __import__("os").environ.get("CERES_PROFILE_DENSE", "0") == "1"
opts = bal.default_options(iterative=not _dense)
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
print(f"setup: {time.time()-t0:.1f}s", flush=True)


def first_scalar(tree):
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
    return leaves[0].reshape(-1)[0]


def timed_loop(name, stage, carry0, k=K):
    """stage: carry -> (out_scalar_source, carry') pattern via closure."""
    @jax.jit
    def run(c0, eps):
        def body(i, c):
            s = stage(c)
            return c + eps * first_scalar(s).astype(c.dtype)
        return jax.lax.fori_loop(0, k, body, c0)

    eps = jnp.asarray(0.0, carry0.dtype)
    r = run(carry0, eps)
    jax.block_until_ready(r)  # compile + warm
    t0 = time.time()
    r = run(carry0, eps)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / k
    print(f"{name:36s} {dt*1e3:9.2f} ms/rep  (x{k})", flush=True)
    return dt


# Build a fixed ctx once for the linear-solve stages.
full_jit = jax.jit(lambda x: _full_impl(x, fams, True, program.num_tangent, groups))
cost, grad, ctx = full_jit(x0)
jax.block_until_ready(cost)
scaling = 1.0 / (1.0 + jnp.sqrt(ctx.squared_column_norms()))
ctx_s = jax.jit(lambda c, s: c.scale_columns(s))(ctx, scaling)
diag = jnp.clip(ctx_s.squared_column_norms(), sc.min_lm_diagonal, sc.max_lm_diagonal)
D0 = jnp.sqrt(diag / 1e4).astype(jnp.float32)
jax.block_until_ready(D0)

timed_loop("eval full (r+J+grad)",
           lambda x: _full_impl(x, fams, True, program.num_tangent, groups)[0],
           x0)
timed_loop("eval cost-only",
           lambda x: _cost_impl(x, fams, True), x0)
timed_loop("squared_column_norms + scale",
           lambda x: ctx.scale_columns(1.0 / (1.0 + jnp.sqrt(
               ctx.squared_column_norms()))).squared_column_norms().astype(x.dtype)[:1] + x[:0].sum(),
           x0, k=K)

timed_loop("linear_solve (full CG, eta=.1)",
           lambda D: _linear_solve(ctx_s, D, solve_aux, sc)[0], D0)

tan0 = jnp.zeros((program.num_tangent,), jnp.float32) + 1e-3
timed_loop("matvec (J*v)", lambda v: ctx_s.matvec(v), tan0)
timed_loop("rmatvec(matvec(v))  [J'Jv]",
           lambda v: ctx_s.rmatvec(ctx_s.matvec(v)), tan0)

ss = solve_aux.get("ss")
if ss is not None:
    from ceres_tpu.linear.schur import SchurOperator

    @jax.jit
    def mk_rhs(D):
        return SchurOperator(ctx_s, D, ss).rhs()

    rhs = mk_rhs(D0)
    jax.block_until_ready(rhs)
    timed_loop("Schur op build+rhs", mk_rhs, D0)
    timed_loop("S*x (op rebuild + s_times)",
               lambda v: SchurOperator(ctx_s, D0, ss).s_times(v), rhs)
    timed_loop("schur_jacobi_blocks",
               lambda D: SchurOperator(ctx_s, D, ss).schur_jacobi_blocks(), D0)
    timed_loop("back_substitute",
               lambda v: SchurOperator(ctx_s, D0, ss).back_substitute(v), rhs)

if _dense and ss is not None:
    from ceres_tpu.linear.schur import SchurOperator as _SO

    @jax.jit
    def dense_S(D):
        return _SO(ctx_s, D, ss).dense_reduced_system()[0]

    S0 = dense_S(D0)
    jax.block_until_ready(S0)
    timed_loop("explicit S assembly", dense_S, D0)

    @jax.jit
    def chol(S):
        c, low = jax.scipy.linalg.cho_factor(S, lower=True)
        return jax.scipy.linalg.cho_solve((c, low), S[0])

    timed_loop("cho_factor+solve (nf^2)", chol, S0)

timed_loop("plus_apply",
           lambda x: plus_apply(program.plus_struct, x, jnp.zeros_like(
               x, shape=(program.num_tangent,))), x0)

# f64 bookkeeping bits from the fused body
timed_loop("f64 norms+gmax bookkeeping",
           lambda x: (jnp.linalg.norm(x.astype(jnp.float64))
                      + jnp.max(jnp.abs(x.astype(jnp.float64)))).astype(x.dtype)[None],
           x0)


def mcc_stage(v):
    Js = ctx_s.matvec(v)
    mcc = jnp.asarray(0.0, jnp.float64)
    for fi in range(len(ctx_s.families)):
        mcc = mcc - jnp.sum(Js[fi] * (ctx_s.residuals[fi] + Js[fi] / 2.0))
    return mcc.astype(v.dtype)[None]


timed_loop("matvec + f64 mcc", mcc_stage, tan0)
