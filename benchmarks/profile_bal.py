"""Per-phase microbenchmark of the BAL LM iteration on the real TPU.

Times each pipeline stage (evaluation, reductions, E'E factor/solve,
Schur matvec, preconditioner build, full LM body) to localize the
per-iteration wall-clock. Run on the TPU (or CPU for relative numbers).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(name, fn, *args, n=20):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    per = (time.time() - t0) / n
    print(f"{name:42s} {per*1e3:9.3f} ms   (compile {compile_s:6.1f}s)")
    return out


def main():
    import ceres_tpu as ct
    from ceres_tpu.evaluator import _full_impl, _cost_impl
    from ceres_tpu.models import bal
    from ceres_tpu.trust_region import (
        _build_solve_aux,
        _config_from_options,
        _lm_step_impl,
    )

    prob = bal.synthesize_bal(
        num_cameras=16, num_points=22106, num_observations=83718, seed=16
    )
    problem, _, _ = bal.build_problem(prob)
    opts = bal.default_options(iterative=True)
    opts.evaluation_dtype = "float32"
    program = problem.program()
    from ceres_tpu.problem import cast_program

    cast_program(program, "float32")
    resolved_lst = opts.resolved_linear_solver_type(program.num_tangent)
    import dataclasses

    opts = dataclasses.replace(opts, linear_solver_type=resolved_lst)
    config = _config_from_options(opts, program)
    aux = _build_solve_aux(opts, program)
    groups = program.jnp_bd_groups()
    fams = program.families
    x = program.initial_ambient().astype("float32")
    nt = program.num_tangent

    print(f"devices: {jax.devices()}  nt={nt}")

    f_eval = jax.jit(lambda x: _full_impl(x, fams, True, nt, groups))
    cost, grad, ctx = timed("full eval (r+J+grad)", f_eval, x)
    timed("cost only", jax.jit(lambda x: _cost_impl(x, fams, True)), x)

    ctx = jax.block_until_ready(ctx)

    timed(
        "squared_column_norms",
        jax.jit(lambda c: c.squared_column_norms()),
        ctx,
    )
    v = jnp.ones((nt,), jnp.float32)
    timed("matvec", jax.jit(lambda c, v: c.matvec(v)), ctx, v)
    w = ctx.matvec(v)
    timed("rmatvec", jax.jit(lambda c, w: c.rmatvec(w)), ctx, w)

    ss = aux["ss"]
    from ceres_tpu.linear.schur import SchurOperator

    D = jnp.ones((nt,), jnp.float32)

    def op_init(c, D):
        op = SchurOperator(c, D, ss)
        return op._ete_chol

    timed("SchurOperator init (E'E factor)", jax.jit(op_init), ctx, D)

    op = SchurOperator(ctx, D, ss)

    timed("solve_ete (22106x3x3 cho_solve)", jax.jit(op._solve_ete), op._edot(w))
    timed("s_times (implicit S.x)", jax.jit(op.s_times), v)
    timed(
        "schur_jacobi blocks",
        jax.jit(lambda: jax.tree.leaves(op.schur_jacobi_blocks())),
    )

    def full_schur(c, D, rhs_r):
        from ceres_tpu.linear.schur import solve_schur

        return solve_schur(c, D, None, config, ss=ss)[0]

    timed("full linear solve (PCG on S)", jax.jit(full_schur), ctx, D, None)

    radius = jnp.asarray(1e4, jnp.float64)
    timed(
        "full LM step impl",
        jax.jit(lambda c, r: _lm_step_impl(c, r, aux, config)[0]),
        ctx,
        radius,
    )


if __name__ == "__main__":
    main()
