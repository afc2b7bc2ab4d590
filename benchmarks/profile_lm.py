"""Per-op profile of the BAL LM hot path on the current JAX backend.

Every op is timed DIFFERENTIALLY: one jitted call chains K (then 2K)
applications in a fori_loop; per-op cost = (t_2K - t_K)/K. This cancels
both the axon tunnel round-trip (~29 ms/dispatch) and any fixed call
overhead, leaving pure on-device time per application.

Usage: python benchmarks/profile_lm.py [--small] [--reps N] [--chain K]
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t_best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        t_best = min(t_best, time.perf_counter() - t0)
    return t_best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()

    import ceres_tpu as ct
    from ceres_tpu.models import bal
    from ceres_tpu.evaluator import _full_impl, _cost_impl
    from ceres_tpu.linear.schur import SchurOperator, build_schur_structure
    from ceres_tpu.problem import cast_program

    if args.small:
        prob = bal.synthesize_bal(8, 500, 2000, seed=42)
    else:
        prob = bal.synthesize_bal(16, 22106, 83718, seed=16)
    problem, _, _ = bal.build_problem(prob)
    program = problem.program()
    cast_program(program, jnp.float32)
    ss = build_schur_structure(program)
    program._schur_structure = ss

    x0 = program.initial_ambient().astype(jnp.float32)
    fams = program.families
    bd_groups = program.jnp_bd_groups()
    nt = program.num_tangent
    K = args.chain
    results = {}
    t_wall0 = time.time()

    def report(name, per_call_s):
        results[name] = {"ms": per_call_s * 1e3}
        print(f"  {name:34s} {per_call_s*1e3:10.3f} ms", flush=True)

    def diff_time(make_chain, *chain_args):
        """make_chain(k) -> jitted fn of chain_args running k applications."""
        f1, f2 = make_chain(K), make_chain(2 * K)
        t1 = timed(f1, *chain_args, reps=args.reps)
        t2 = timed(f2, *chain_args, reps=args.reps)
        return (t2 - t1) / K

    # ---- full eval (r + J + grad), chained via x-dependency
    def mk_full(k):
        @jax.jit
        def run(x):
            def body(_, x):
                cost, grad, _ = _full_impl(x, fams, True, nt, bd_groups)
                return x + 0.0 * cost.astype(x.dtype)

            return jax.lax.fori_loop(0, k, body, x)

        return run

    report("full_eval(r,J,grad)", diff_time(mk_full, x0))

    def mk_cost(k):
        @jax.jit
        def run(x):
            def body(_, x):
                return x + 0.0 * _cost_impl(x, fams, True).astype(x.dtype)

            return jax.lax.fori_loop(0, k, body, x)

        return run

    report("cost_eval", diff_time(mk_cost, x0))

    _, _, ctx = jax.jit(lambda x: _full_impl(x, fams, True, nt, bd_groups))(x0)
    jax.block_until_ready(ctx.residuals)
    D = jnp.sqrt(
        jnp.clip(ctx.squared_column_norms(), 1e-6, 1e32) / 1e4
    ).astype(jnp.float32)
    v0 = jnp.ones((nt,), jnp.float32)

    def chained(opfn):
        def mk(k):
            @jax.jit
            def run(*a):
                v = a[-1]

                def body(_, v):
                    return opfn(*a[:-1], v) * 1e-9

                return jax.lax.fori_loop(0, k, body, v)

            return run

        return mk

    report(
        "normal_matvec (Jv+J'w)",
        diff_time(chained(lambda c, v: c.rmatvec(c.matvec(v))), ctx, v0),
    )
    report(
        "matvec only (Jv, sum back)",
        diff_time(
            chained(
                lambda c, v: v
                + 1e-9 * sum(jnp.sum(w) for w in c.matvec(v))
            ),
            ctx,
            v0,
        ),
    )
    report(
        "squared_column_norms",
        diff_time(chained(lambda c, v: v + c.squared_column_norms()), ctx, v0),
    )

    def mk_schur_init(k):
        @jax.jit
        def run(ctx, D):
            def body(_, D):
                op = SchurOperator(ctx, D, ss)
                return D + 0.0 * jnp.sum(op._ete_chol).astype(D.dtype)

            return jax.lax.fori_loop(0, k, body, D)

        return run

    report("schur_init(ete+chol)", diff_time(mk_schur_init, ctx, D))

    op_holder = {}

    def with_op(fn):
        def inner(ctx, D, v):
            op = SchurOperator(ctx, D, ss)
            return fn(op, v)

        return inner

    def mk_with_op(fn):
        def mk(k):
            @jax.jit
            def run(ctx, D, v):
                op = SchurOperator(ctx, D, ss)

                def body(_, v):
                    return fn(op, v) * 1e-9

                return jax.lax.fori_loop(0, k, body, v)

            return run

        return mk

    report("s_times (S·x)", diff_time(mk_with_op(lambda op, v: op.s_times(v)), ctx, D, v0))
    report(
        "back_substitute",
        diff_time(mk_with_op(lambda op, v: op.back_substitute(v)), ctx, D, v0),
    )

    def mk_ete(k):
        @jax.jit
        def run(ctx, D, t):
            op = SchurOperator(ctx, D, ss)

            def body(_, t):
                return op._solve_ete(t) * 1e-9

            return jax.lax.fori_loop(0, k, body, t)

        return run

    t0g = jnp.ones((ss.num_points, ss.e_tangent_size), jnp.float32)
    report("solve_ete (batched 3x3)", diff_time(mk_ete, ctx, D, t0g))

    def mk_edot(k):
        @jax.jit
        def run(ctx, D, v):
            op = SchurOperator(ctx, D, ss)

            def body(_, v):
                w = ctx.matvec(v)
                t = op._edot(w)
                return v + 1e-9 * jnp.sum(t).astype(v.dtype)

            return jax.lax.fori_loop(0, k, body, v)

        return run

    report("matvec+edot (scatter P)", diff_time(mk_edot, ctx, D, v0))

    def mk_sj_build(k):
        @jax.jit
        def run(ctx, D):
            def body(_, D):
                op = SchurOperator(ctx, D, ss)
                blocks = op.schur_jacobi_blocks()
                s = sum(jnp.sum(b) for b in blocks.values())
                return D + 0.0 * s.astype(D.dtype)

            return jax.lax.fori_loop(0, k, body, D)

        return run

    report("schur_jacobi build", diff_time(mk_sj_build, ctx, D))

    def mk_pc(k):
        @jax.jit
        def run(ctx, D, v):
            op = SchurOperator(ctx, D, ss)
            pc = op.schur_jacobi_preconditioner()

            def body(_, v):
                return pc(v) * 1e-9

            return jax.lax.fori_loop(0, k, body, v)

        return run

    report("schur_jacobi apply", diff_time(mk_pc, ctx, D, v0))

    # ---- gather/scatter microbenches on the biggest family
    fam = max(fams, key=lambda f: f.batch)
    tidx = fam.tangent_idx

    def mk_gs(k):
        @jax.jit
        def run(v):
            def body(_, v):
                s = jnp.zeros((nt + 1,), v.dtype)
                vp = jnp.concatenate([v, jnp.zeros((1,), v.dtype)])
                for j in range(len(tidx)):
                    g = vp[tidx[j]]
                    s = s.at[tidx[j]].add(g * 1e-9, mode="drop")
                return s[:nt]

            return jax.lax.fori_loop(0, k, body, v)

        return run

    report("gather+scatter_add/arg-pair", diff_time(mk_gs, v0))

    def mk_g(k):
        @jax.jit
        def run(v):
            def body(_, v):
                vp = jnp.concatenate([v, jnp.zeros((1,), v.dtype)])
                acc = 0.0
                for j in range(len(tidx)):
                    acc = acc + jnp.sum(vp[tidx[j]]) * 1e-9
                return v + acc

            return jax.lax.fori_loop(0, k, body, v)

        return run

    report("gather only/arg-pair", diff_time(mk_g, v0))

    # ---- fused LM per-iteration (differential over iteration budget)
    from ceres_tpu.fused_lm import _fused_minimize, _FusedConfig
    from ceres_tpu.trust_region import _config_from_options, _build_solve_aux
    import dataclasses as dc

    opts = bal.default_options(iterative=True)
    opts.evaluation_dtype = "float32"
    resolved = dc.replace(
        opts, linear_solver_type=opts.resolved_linear_solver_type(nt)
    )
    config = _FusedConfig(
        solve=_config_from_options(resolved, program),
        function_tolerance=0.0,
        gradient_tolerance=0.0,
        parameter_tolerance=0.0,
        min_relative_decrease=resolved.min_relative_decrease,
        initial_trust_region_radius=resolved.initial_trust_region_radius,
        max_trust_region_radius=resolved.max_trust_region_radius,
        min_trust_region_radius=resolved.min_trust_region_radius,
        max_invalid_steps=resolved.max_num_consecutive_invalid_steps,
        jacobi_scaling=resolved.jacobi_scaling,
        apply_loss=True,
        num_tangent=nt,
    )
    solve_aux = _build_solve_aux(resolved, program)

    def run_iters(n):
        final, c0 = _fused_minimize(
            x0,
            program.families,
            program.plus_struct,
            solve_aux,
            jnp.asarray(n, jnp.int32),
            config,
            bd_groups,
        )
        return final.cost

    t2 = timed(run_iters, 2, reps=max(2, args.reps // 2))
    t10 = timed(run_iters, 10, reps=max(2, args.reps // 2))
    report("fused LM per-iteration", (t10 - t2) / 8.0)
    results["fused_2it_s"] = t2
    results["fused_10it_s"] = t10

    results["_backend"] = jax.devices()[0].platform
    results["_wall_s"] = time.time() - t_wall0
    print(json.dumps(results))


if __name__ == "__main__":
    main()
