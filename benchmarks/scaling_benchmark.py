"""Multi-device scaling benchmark: iterations/s vs mesh size.

The BASELINE target is >=75% iterations/s scaling efficiency at 4 hosts
with residual/point blocks sharded and the reduced camera system
psum-assembled. Real multi-chip hardware is not reachable from this
environment; this script measures the same sharded program on an
N-virtual-device CPU mesh (xla_force_host_platform_device_count), which
validates the collective structure and gives a coarse scaling signal,
and runs as-is on a real pod slice.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python benchmarks/scaling_benchmark.py --mesh_sizes 1 2 4 8
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

# The environment's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon, so the env var alone is too late — flip the
# already-imported config too (same pattern as tests/conftest.py).
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh_sizes", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--num_cameras", type=int, default=16)
    ap.add_argument("--num_points", type=int, default=8000)
    ap.add_argument("--num_observations", type=int, default=32000)
    ap.add_argument("--iterations", type=int, default=8)
    args = ap.parse_args()

    import ceres_tpu as ct
    from ceres_tpu.fused_lm import fused_solve
    from ceres_tpu.models import bal
    from ceres_tpu.parallel import make_mesh

    ndev = len(jax.devices())
    print(f"devices available: {ndev}")
    prob = bal.synthesize_bal(
        args.num_cameras, args.num_points, args.num_observations, seed=7
    )

    results = {}
    for n in args.mesh_sizes:
        if n > ndev:
            print(f"mesh {n}: skipped (only {ndev} devices)")
            continue
        opts = ct.SolverOptions(
            linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
            max_num_iterations=args.iterations,
            function_tolerance=1e-300,  # force the full iteration budget
            parameter_tolerance=1e-300,
            gradient_tolerance=1e-300,
            evaluation_dtype="float32",
            mesh=make_mesh(n) if n > 1 else None,
        )
        # warm-up (compile)
        p, _, _ = bal.build_problem(prob)
        fused_solve(opts, p)
        # timed
        p, _, _ = bal.build_problem(prob)
        t0 = time.time()
        s = fused_solve(opts, p)
        dt = time.time() - t0
        iters = max(len(s.iterations), 1)
        rate = iters / dt
        results[n] = rate
        print(
            f"mesh {n}: {iters} iterations in {dt:.2f}s = {rate:.2f} it/s "
            f"(final cost {s.final_cost:.4e})"
        )

    if 1 in results:
        base = results[1]
        for n, rate in sorted(results.items()):
            print(
                f"mesh {n}: {rate:.2f} it/s "
                f"({rate / base * 100:.0f}% of 1-device rate)"
            )


if __name__ == "__main__":
    main()
