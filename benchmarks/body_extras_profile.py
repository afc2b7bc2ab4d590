"""Micro-profile of the fused-body pieces AROUND the linear solve at
large-BAL scale: column norms + scaling, the second diag pass, f64
norm/mcc emulation costs, matvec, plus.

Protocol: two-point amortized fori_loop with the carry threaded through
the stage inputs (args only — no closure capture of the varying data).
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
from ceres_tpu.trust_region import _build_solve_aux, _config_from_options

C = int(sys.argv[1]) if len(sys.argv) > 1 else 464
P = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
O = int(sys.argv[3]) if len(sys.argv) > 3 else 1_200_000
K = int(sys.argv[4]) if len(sys.argv) > 4 else 10

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

cost, grad, ctx0 = jax.jit(
    lambda x: _full_impl(x, fams, True, program.num_tangent, groups)
)(x0)
jax.block_until_ready(cost)


def timed(name, fn, *args, k=K):
    @jax.jit
    def run(eps, reps, *a):
        def body(i, acc):
            def perturb(x):
                if (hasattr(x, "dtype")
                        and jnp.issubdtype(x.dtype, jnp.floating)):
                    return x + (eps * acc).astype(x.dtype)
                return x

            aa = [jax.tree_util.tree_map(perturb, x) for x in a]
            out = fn(*aa)
            leaves = [l for l in jax.tree_util.tree_leaves(out)
                      if hasattr(l, "dtype")
                      and jnp.issubdtype(l.dtype, jnp.floating)]
            s = sum(jnp.sum(l[..., :1] if l.ndim else l).astype(jnp.float32)
                    for l in leaves)
            return acc + eps * s
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    eps = jnp.float32(0.0)

    def t_of(reps):
        t0 = time.time()
        jax.block_until_ready(run(eps, jnp.int32(reps), *args))
        return time.time() - t0

    t_of(1)
    t1 = t_of(1)
    t2 = t_of(1 + k)
    dt = (t2 - t1) / k
    print(f"{name:44s} {dt*1e3:9.2f} ms/rep", flush=True)
    return dt


# column norms of the raw ctx (threaded through a jac leaf perturbation:
# pass ctx as arg so the carry threads through its float leaves)
timed("squared_column_norms", lambda c: c.squared_column_norms(), ctx0)
timed("scale_columns", lambda c, s: c.scale_columns(s),
      ctx0, jnp.full((program.num_tangent,), 0.9, jnp.float32))
timed("colnorms+scale+colnorms (current)",
      lambda c: c.scale_columns(
          1.0 / (1.0 + jnp.sqrt(c.squared_column_norms()))
      ).squared_column_norms(),
      ctx0)
timed("colnorms once + scaling^2 (proposed)",
      lambda c: (lambda n, s: (c.scale_columns(s), s * s * n))(
          c.squared_column_norms(),
          1.0 / (1.0 + jnp.sqrt(c.squared_column_norms()))
      ),
      ctx0)

step0 = jnp.full((program.num_tangent,), 1e-4, jnp.float32)
timed("matvec (J.step)", lambda c, s: c.matvec(s), ctx0, step0)


def mcc_f64(c, s):
    Js = c.matvec(s)
    mcc = jnp.asarray(0.0, jnp.float64)
    for fi in range(len(c.families)):
        mcc = mcc - jnp.sum(
            Js[fi].astype(jnp.float64)
            * (c.residuals[fi].astype(jnp.float64)
               + Js[fi].astype(jnp.float64) / 2.0))
    return mcc


def mcc_f32acc(c, s):
    Js = c.matvec(s)
    mcc = jnp.asarray(0.0, jnp.float64)
    for fi in range(len(c.families)):
        t = Js[fi] * (c.residuals[fi] + Js[fi] * 0.5)
        mcc = mcc - jnp.sum(t.astype(jnp.float64))
    return mcc


timed("mcc f64 products (current)", mcc_f64, ctx0, step0)
timed("mcc f32 products, f64 sum", mcc_f32acc, ctx0, step0)

timed("x_norm f64 (current)",
      lambda x: jnp.linalg.norm(x.astype(jnp.float64)), x0)
timed("x_norm f32sq-f64sum",
      lambda x: jnp.sqrt(jnp.sum((x * x).astype(jnp.float64))), x0)

g64 = grad
timed("gmax+gnorm f64 (current)",
      lambda g: (jnp.max(jnp.abs(g.astype(jnp.float64))),
                 jnp.linalg.norm(g.astype(jnp.float64))), g64)

timed("plus", lambda x: plus_apply(program.plus_struct, x, step0 * 0.5), x0)
timed("cost only", lambda x: _cost_impl(x, fams, True), x0)
timed("full eval", lambda x: _full_impl(x, fams, True,
                                        program.num_tangent, groups)[0], x0)
