"""Per-stage XLA compile cost of the large DENSE_SCHUR fused body.

The large-problem fused loop compiles in ~79s (compile_profile.py
--large) while its StableHLO is only 0.3 MB — the cost is backend
codegen (generated_code_size 194 MB, temps 14.4 GB), not tracing. This
script lowers+compiles each stage of the body in isolation to find
which op owns the cliff.

Usage: python benchmarks/compile_stages.py [C P O]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ceres_tpu.evaluator import _cost_impl, _full_impl
from ceres_tpu.models import bal
from ceres_tpu.problem import cast_program
from ceres_tpu.trust_region import (
    _build_solve_aux,
    _config_from_options,
)

C = int(sys.argv[1]) if len(sys.argv) > 1 else 464
P = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
O = int(sys.argv[3]) if len(sys.argv) > 3 else 1_200_000

print("devices:", jax.devices(), flush=True)
t0 = time.time()
prob = bal.synthesize_bal(num_cameras=C, num_points=P, num_observations=O,
                          noise=2.0, perturb=0.7, seed=7)
problem, _, _ = bal.build_problem(prob)
opts = bal.default_options(iterative=False)  # DENSE_SCHUR
opts.evaluation_dtype = "float32"
program = problem.program()
cast_program(program, opts.evaluation_dtype)
resolved = dataclasses.replace(
    opts,
    linear_solver_type=opts.resolved_linear_solver_type(program.num_tangent),
)
sc = _config_from_options(resolved, program)
solve_aux = _build_solve_aux(resolved, program)
x0 = program.initial_ambient().astype(jnp.float32)
groups = program.jnp_bd_groups()
fams = program.families
ss = solve_aux["ss"]
print(f"setup: {time.time()-t0:.1f}s", flush=True)


def timed_compile(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    try:
        mem = compiled.memory_analysis()
        extra = (f" code={mem.generated_code_size_in_bytes/1e6:.0f}MB "
                 f"temp={mem.temp_size_in_bytes/1e9:.2f}GB")
    except Exception:
        extra = ""
    print(f"{name:30s} lower {t_lower:6.1f}s  compile {t_compile:6.1f}s{extra}",
          flush=True)
    return compiled


# Stage 1: full evaluation
def eval_full(x):
    return _full_impl(x, fams, True, sc.num_tangent, groups)


timed_compile("eval_full", eval_full, x0)

cost0, grad0, ctx = eval_full(x0)
radius = jnp.asarray(1e4, jnp.float64)


# Stage 2: column norms + scaling
def scale(ctx):
    s = 1.0 / (1.0 + jnp.sqrt(ctx.squared_column_norms()))
    return ctx.scale_columns(s)


timed_compile("colnorms+scale", scale, ctx)


# Stage 3: explicit S assembly
def assemble(ctx, radius):
    from ceres_tpu.linear.schur import SchurOperator

    diag = jnp.clip(ctx.squared_column_norms(), sc.min_lm_diagonal,
                    sc.max_lm_diagonal)
    D = jnp.sqrt(diag / radius.astype(diag.dtype))
    op = SchurOperator(ctx, D, ss)
    return op.dense_reduced_system()


timed_compile("assemble_S", assemble, ctx, radius)


# Stage 3b: assembly split into cell computation vs placement
def cells_only(ctx, radius):
    from ceres_tpu.linear.schur import SchurOperator
    from ceres_tpu.linear.schur_explicit import compute_cell_blocks

    diag = jnp.clip(ctx.squared_column_norms(), sc.min_lm_diagonal,
                    sc.max_lm_diagonal)
    D = jnp.sqrt(diag / radius.astype(diag.dtype))
    op = SchurOperator(ctx, D, ss)
    _, blocks = compute_cell_blocks(op, ss.explicit)
    return blocks


timed_compile("cells_only", cells_only, ctx, radius)


# Stage 4: dense Cholesky of S + back substitution
def chol_solve(ctx, radius):
    from ceres_tpu.linear.schur import SchurOperator

    diag = jnp.clip(ctx.squared_column_norms(), sc.min_lm_diagonal,
                    sc.max_lm_diagonal)
    D = jnp.sqrt(diag / radius.astype(diag.dtype))
    op = SchurOperator(ctx, D, ss)
    S, rhs_red, f_idx = op.dense_reduced_system()
    chol, low = jax.scipy.linalg.cho_factor(S, lower=True)
    xf = jax.scipy.linalg.cho_solve((chol, low), rhs_red)
    x_f = jnp.zeros((ctx.num_tangent,), dtype=S.dtype).at[f_idx].set(xf)
    return op.back_substitute(x_f)


timed_compile("assemble+chol+backsub", chol_solve, ctx, radius)


# Stage 5: candidate cost
def cost(x):
    return _cost_impl(x, fams, True)


timed_compile("cost", cost, x0)
