"""Isolate the while_loop-vs-fori_loop performance gap on the large
DENSE_SCHUR iteration body.

The amortized stage harness (fori_loop, threaded carry) measures the
full trust-region iteration at ~94 ms; the production fused
lax.while_loop measures ~352 ms/iter for the same math. This script
runs the SAME body under (a) fori_loop with threaded carry, (b)
while_loop with a counter condition, (c) while_loop with the real
termination-style condition on an f64 scalar carry.
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
from ceres_tpu.evaluator import _full_impl, _cost_impl
from ceres_tpu.problem import cast_program, plus_apply
from ceres_tpu.trust_region import (
    _build_solve_aux,
    _config_from_options,
    _lm_damping,
    _linear_solve,
)

C = int(sys.argv[1]) if len(sys.argv) > 1 else 464
P = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
O = int(sys.argv[3]) if len(sys.argv) > 3 else 1_200_000
K = int(sys.argv[4]) if len(sys.argv) > 4 else 5

print("devices:", jax.devices(), flush=True)
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
plus_struct = program.plus_struct


def body_math(x, radius):
    """The fused _body's math: full eval, scale, solve, mcc, candidate
    cost, norms."""
    cost, grad, ctx = _full_impl(x, fams, True, program.num_tangent, groups)
    scaling = 1.0 / (1.0 + jnp.sqrt(ctx.squared_column_norms()))
    ctx = ctx.scale_columns(scaling)
    diag = jnp.clip(ctx.squared_column_norms(), sc.min_lm_diagonal,
                    sc.max_lm_diagonal)
    D = _lm_damping(diag, radius)
    y, lin_iters, lin_term = _linear_solve(ctx, D, solve_aux, sc)
    step_scaled = -y.astype(diag.dtype)
    Js = ctx.matvec(step_scaled)
    mcc = jnp.asarray(0.0, jnp.float64)
    for fi in range(len(ctx.families)):
        mcc = mcc - jnp.sum(
            Js[fi].astype(jnp.float64)
            * (ctx.residuals[fi].astype(jnp.float64)
               + Js[fi].astype(jnp.float64) / 2.0))
    step = step_scaled * scaling
    candidate = plus_apply(plus_struct, x, step)
    cand_cost = _cost_impl(candidate, fams, True)
    rho = (cost - cand_cost) / mcc
    accept = jnp.isfinite(mcc) & (mcc > 0.0) & (rho > 1e-3)
    new_x = jnp.where(accept, candidate, x)
    r = jnp.where(accept, radius * 2.0, radius / 2.0)
    return new_x, r, cand_cost


def run_timed(name, fn):
    t0 = time.time()
    out = fn()
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / K
    print(f"{name:40s} {dt*1e3:9.1f} ms/iter (compile {compile_s:.1f}s)",
          flush=True)


r0 = jnp.asarray(1e4, jnp.float64)


@jax.jit
def fori5(x):
    def body(i, carry):
        x, r, _ = carry
        return body_math(x, r)
    return jax.lax.fori_loop(0, K, body, (x, r0, jnp.asarray(0.0)))


@jax.jit
def while_counter(x):
    def cond(c):
        return c[0] < K

    def body(c):
        i, x, r, _ = c
        nx, nr, cc = body_math(x, r)
        return (i + 1, nx, nr, cc)

    return jax.lax.while_loop(cond, body, (0, x, r0, jnp.asarray(0.0)))


@jax.jit
def while_datadep(x):
    def cond(c):
        i, x_, r, cc = c
        return (i < K) & (r > 1e-10)

    def body(c):
        i, x_, r, cc = c
        nx, nr, ncc = body_math(x_, r)
        return (i + 1, nx, nr, ncc)

    return jax.lax.while_loop(cond, body, (0, x, r0, jnp.asarray(0.0)))


run_timed("fori_loop(K)", lambda: fori5(x0))
run_timed("while_loop counter", lambda: while_counter(x0))
run_timed("while_loop data-dep cond", lambda: while_datadep(x0))
