"""Stage timing of the DENSE_SCHUR large-problem path: explicit one-pass
assembly vs dense Cholesky vs back-substitution (finds the 11.8 s/iter
culprit from BENCH r3's large_problem metric).

Usage: python benchmarks/dense_schur_profile.py [C P O [K]]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import dataclasses

from ceres_tpu.models import bal
from ceres_tpu.evaluator import _full_impl
from ceres_tpu.problem import cast_program
from ceres_tpu.linear.schur import (
    SchurOperator,
    build_schur_structure,
    ensure_explicit_plan,
)
from ceres_tpu.linear.schur_explicit import assemble_reduced_system

C = int(sys.argv[1]) if len(sys.argv) > 1 else 464
P = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
O = int(sys.argv[3]) if len(sys.argv) > 3 else 1_200_000
K = int(sys.argv[4]) if len(sys.argv) > 4 else 5

print("devices:", jax.devices(), flush=True)
t0 = time.time()
prob = bal.synthesize_bal(num_cameras=C, num_points=P, num_observations=O,
                          noise=2.0, perturb=0.7, seed=7)
problem, _, _ = bal.build_problem(prob)
opts = bal.default_options(iterative=False)
opts.evaluation_dtype = "float32"
program = problem.program()
cast_program(program, opts.evaluation_dtype)
ss = build_schur_structure(program)
ensure_explicit_plan(program, ss)
x0 = program.initial_ambient().astype(jnp.float32)
groups = program.jnp_bd_groups()
fams = program.families
print(f"setup: {time.time()-t0:.1f}s", flush=True)

full_jit = jax.jit(lambda x: _full_impl(x, fams, True, program.num_tangent, groups))
cost, grad, ctx = full_jit(x0)
jax.block_until_ready(cost)
D0 = jnp.full((program.num_tangent,), 1e-2, jnp.float32)


def timed(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(K):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / K
    print(f"{name:32s} {dt*1e3:9.1f} ms  (x{K})", flush=True)
    return r


S = timed("assemble S (one-pass)",
          lambda D: assemble_reduced_system(SchurOperator(ctx, D, ss),
                                            ss.explicit), D0)
print("S shape:", S.shape, flush=True)
rhs = jax.jit(lambda D: SchurOperator(ctx, D, ss).rhs()[ss.f_idx])(D0)
jax.block_until_ready(rhs)

import jax.scipy.linalg as jsl

xf = timed("cho_factor + cho_solve",
           lambda S_, r_: jsl.cho_solve(jsl.cho_factor(S_, lower=True), r_),
           S, rhs)


def backsub(xf_red, D):
    op = SchurOperator(ctx, D, ss)
    x_f = jnp.zeros((ctx.num_tangent,), jnp.float32).at[ss.f_idx].set(xf_red)
    return op.back_substitute(x_f)


timed("back_substitute", backsub, xf, D0)
timed("rhs()[f_idx]", lambda D: SchurOperator(ctx, D, ss).rhs()[ss.f_idx], D0)
timed("eval full (r+J)", lambda x: full_jit(x)[0], x0)

# Marginal per-trip cost of the fused while_loop at this scale.
from ceres_tpu.fused_lm import _fused_minimize, _FusedConfig, _config_from_options as _cfo
from ceres_tpu.trust_region import _build_solve_aux as _bsa, _config_from_options as _tr_cfo

opts2 = bal.default_options(iterative=False)
opts2.evaluation_dtype = "float32"
resolved = dataclasses.replace(
    opts2, linear_solver_type=opts2.resolved_linear_solver_type(program.num_tangent)
)
fc = _FusedConfig(
    solve=_tr_cfo(resolved, program),
    function_tolerance=resolved.function_tolerance,
    gradient_tolerance=resolved.gradient_tolerance,
    parameter_tolerance=resolved.parameter_tolerance,
    min_relative_decrease=resolved.min_relative_decrease,
    initial_trust_region_radius=resolved.initial_trust_region_radius,
    max_trust_region_radius=resolved.max_trust_region_radius,
    min_trust_region_radius=resolved.min_trust_region_radius,
    max_invalid_steps=resolved.max_num_consecutive_invalid_steps,
    jacobi_scaling=resolved.jacobi_scaling,
    apply_loss=True,
    num_tangent=program.num_tangent,
)
solve_aux = _bsa(resolved, program)

for budget in (0, 1, 2, 4):
    t0 = time.time()
    final, c0 = _fused_minimize(
        x0, program.families, program.plus_struct, solve_aux,
        jnp.asarray(budget, jnp.int32), fc, groups)
    jax.block_until_ready(final.x)
    print(f"fused budget={budget}: {time.time()-t0:.2f}s "
          f"(trips={int(final.iteration)})", flush=True)
