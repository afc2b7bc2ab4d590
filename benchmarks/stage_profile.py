"""Stage-by-stage device timing of one LM iteration on a large BAL
instance (VERDICT r2 item #2: find why s/iter is far from speed-of-light).

Times each jitted stage of the fused LM body independently with
block_until_ready, so the 539 ms/iter can be attributed.
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from ceres_tpu.models import bal
from ceres_tpu.evaluator import _cost_impl, _full_impl
from ceres_tpu.problem import cast_program, plus_apply
from ceres_tpu.trust_region import (
    _build_solve_aux,
    _config_from_options,
    _linear_solve,
)
import dataclasses

C, P, O = (
    int(sys.argv[1]) if len(sys.argv) > 1 else 464,
    int(sys.argv[2]) if len(sys.argv) > 2 else 200_000,
    int(sys.argv[3]) if len(sys.argv) > 3 else 1_200_000,
)
print("devices:", jax.devices(), flush=True)
t0 = time.time()
prob = bal.synthesize_bal(num_cameras=C, num_points=P, num_observations=O,
                          noise=2.0, perturb=0.7, seed=7)
problem, _, _ = bal.build_problem(prob)
opts = bal.default_options(iterative=True)
opts.max_num_iterations = 50
opts.function_tolerance = 1e-9
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
print(f"setup: {time.time()-t0:.1f}s", flush=True)
fams = program.families
for f in fams:
    print("family batch:", f.batch, "plans:", None if f.reduce_plans is None
          else [None if p is None else p.kind for p in f.reduce_plans])


def timeit(name, fn, *args, n=5, **kw):
    r = fn(*args, **kw)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*args, **kw)
        jax.block_until_ready(r)
    dt = (time.time() - t0) / n
    print(f"{name:34s} {dt*1e3:9.2f} ms", flush=True)
    return r


full_jit = jax.jit(lambda x: _full_impl(x, fams, True, program.num_tangent, groups))
cost_jit = jax.jit(lambda x: _cost_impl(x, fams, True))

cost, grad, ctx = timeit("eval full (r+J+grad)", full_jit, x0)
timeit("eval cost-only", cost_jit, x0)

scn_jit = jax.jit(lambda c: c.squared_column_norms())
scn = timeit("squared_column_norms", scn_jit, ctx)

scale_jit = jax.jit(lambda c, s: c.scale_columns(1.0 / (1.0 + jnp.sqrt(s))))
ctx_s = timeit("scale_columns", scale_jit, ctx, scn)

D = jnp.sqrt(jnp.clip(scn, sc.min_lm_diagonal, sc.max_lm_diagonal) / 1e4)

ls_jit = jax.jit(lambda c, d: _linear_solve(c, d, solve_aux, sc))
y, iters, term = timeit("linear_solve (full CG)", ls_jit, ctx_s, D)
print(f"  cg iterations: {int(iters)}", flush=True)

mv_jit = jax.jit(lambda c, v: c.matvec(v))
Js = timeit("matvec (J*v)", mv_jit, ctx_s, y.astype(jnp.float32))

rmv_jit = jax.jit(lambda c, w: c.rmatvec(w))
timeit("rmatvec (J'*w)", rmv_jit, ctx_s, Js)

# Schur operator stages
from ceres_tpu.linear.schur import SchurOperator, build_schur_structure

ss = solve_aux.get("schur_structure") if isinstance(solve_aux, dict) else None
if ss is None:
    try:
        ss = build_schur_structure(program)
    except Exception as e:
        print("no schur structure:", e)
if ss is not None:
    def op_of(c, d):
        return SchurOperator(c, d, ss)

    @jax.jit
    def build_op_rhs(c, d):
        op = op_of(c, d)
        return op.rhs()

    rhs = timeit("SchurOperator build + rhs", build_op_rhs, ctx_s, D)

    @jax.jit
    def stimes(c, d, v):
        return op_of(c, d).s_times(v)

    # amortize the (E'E)^-1 etc — op rebuilt each call; measures one S*x
    timeit("S*x (op rebuild + s_times)", stimes, ctx_s, D, rhs)

    @jax.jit
    def precon_build(c, d):
        op = op_of(c, d)
        return op.schur_jacobi_blocks()

    timeit("schur_jacobi_blocks", precon_build, ctx_s, D)

    @jax.jit
    def backsub(c, d, v):
        return op_of(c, d).back_substitute(v)

    timeit("back_substitute", backsub, ctx_s, D, rhs)

step = -y.astype(jnp.float32)
plus_jit = jax.jit(lambda x, s: plus_apply(program.plus_struct, x, s))
cand = timeit("plus_apply", plus_jit, x0, step)
timeit("candidate cost", cost_jit, cand)
