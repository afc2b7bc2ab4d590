"""Per-kernel benchmarks — analog of internal/ceres/evaluation_benchmark.cc
(residual+Jacobian evaluation, partitioned matrix products, implicit
Schur products) plus spmv_benchmark.cc / schur_eliminator_benchmark.cc.

Usage:
    python benchmarks/evaluation_benchmark.py [--num_points N] [--f64]

Prints one line per kernel: compile time, steady-state time, effective
rates. Runs on whatever device JAX selects (TPU under axon, CPU with
JAX_PLATFORMS=cpu).
"""

import argparse
import time

import jax
import jax.numpy as jnp


def timeit(label, fn, n=10):
    t0 = time.time()
    out = fn()
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    best = min(ts)
    print(f"{label:<42s} compile {compile_s:8.2f}s   steady {best*1e3:9.3f}ms")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_cameras", type=int, default=16)
    ap.add_argument("--num_points", type=int, default=22106)
    ap.add_argument("--num_observations", type=int, default=83718)
    ap.add_argument("--f64", action="store_true")
    args = ap.parse_args()

    import ceres_tpu as ct
    from ceres_tpu.evaluator import Evaluator
    from ceres_tpu.models import bal
    from ceres_tpu.problem import cast_program
    from ceres_tpu.linear.schur import SchurOperator, build_schur_structure

    dtype = "float64" if args.f64 else "float32"
    print(
        f"devices: {jax.devices()}  dtype: {dtype}  "
        f"({args.num_cameras} cams, {args.num_points} pts, "
        f"{args.num_observations} obs)"
    )

    prob = bal.synthesize_bal(
        args.num_cameras, args.num_points, args.num_observations, seed=16
    )
    p, _, _ = bal.build_problem(prob)
    program = p.program()
    cast_program(program, dtype)
    ev = Evaluator(program)
    x = program.initial_ambient().astype(dtype)
    fams = program.families

    # Residual evaluation (evaluation_benchmark.cc Residuals)
    timeit("residuals", lambda: ev._cost_fn(x, fams))
    # Residuals + jacobian (ResidualsAndJacobian)
    full = timeit(
        "residuals+jacobian+gradient", lambda: ev._full_fn(x, fams)
    )
    _, grad, ctx = full

    v = jnp.ones((program.num_tangent,), dtype=grad.dtype)
    # J v / J'w (PMV products; block_sparse SpMV analog) — jitted like
    # the solvers use them.
    mv = jax.jit(lambda c, u: c.matvec(u))
    rmv = jax.jit(lambda c, w_: c.rmatvec(w_))
    nmv = jax.jit(lambda c, u: c.normal_matvec(u))
    timeit("J v (matvec)", lambda: mv(ctx, v))
    w = mv(ctx, v)
    timeit("J'w (rmatvec)", lambda: rmv(ctx, w))
    timeit("J'J v (normal_matvec)", lambda: nmv(ctx, v))

    ss = build_schur_structure(program)
    D = jnp.ones((program.num_tangent,), dtype=grad.dtype)

    ete = jax.jit(lambda c, d, s_: SchurOperator(c, d, s_)._ete_chol)
    timeit(
        "schur: E'E assembly + batched chol", lambda: ete(ctx, D, ss)
    )
    sx = jax.jit(
        lambda c, d, s_, u: SchurOperator(c, d, s_).s_times(u)
    )
    rhs_f = jax.jit(lambda c, d, s_: SchurOperator(c, d, s_).rhs())
    bs = jax.jit(
        lambda c, d, s_, u: SchurOperator(c, d, s_).back_substitute(u)
    )
    sj = jax.jit(
        lambda c, d, s_: SchurOperator(c, d, s_).schur_jacobi_blocks()
    )
    vf = v * ss.f_mask
    timeit("schur: S x (implicit product)", lambda: sx(ctx, D, ss, vf))
    timeit("schur: reduced rhs", lambda: rhs_f(ctx, D, ss))
    timeit("schur: SCHUR_JACOBI build", lambda: sj(ctx, D, ss), n=3)
    timeit("schur: back substitute", lambda: bs(ctx, D, ss, vf))


if __name__ == "__main__":
    main()
