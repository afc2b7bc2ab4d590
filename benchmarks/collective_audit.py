"""Collective-cost accounting for the sharded LM step (VERDICT r3 #10).

Compiles the fused LM iteration body over an N-device virtual CPU mesh
and parses the optimized HLO for communication ops (all-reduce,
all-gather, reduce-scatter, collective-permute), reporting per-op
shapes and total bytes per LM iteration + per CG iteration. The counts
are structural (from GSPMD partitioning), so they predict real-pod ICI
traffic even though the devices here are virtual.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_PLATFORMS=cpu python benchmarks/collective_audit.py [C P O N]
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np

from ceres_tpu.models import bal
from ceres_tpu.problem import cast_program

C = int(sys.argv[1]) if len(sys.argv) > 1 else 64
P = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
O = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000
N = int(sys.argv[4]) if len(sys.argv) > 4 else 8

DTYPE_BYTES = {"f32": 4, "f64": 8, "s32": 4, "u32": 4, "pred": 1, "bf16": 2}

# Op costs on a ring of n devices (bytes moved over ICI per link-step
# summed across the algorithm; see jax-ml.github.io/scaling-book):
#   all-reduce:      2 (n-1)/n * |buf|
#   all-gather:      (n-1)/n * |out|
#   reduce-scatter:  (n-1)/n * |in|
#   collective-permute: |buf|


def parse_collectives(hlo: str, n: int):
    out = []
    # Matches single- and tuple-typed collectives:
    #   %all-reduce.1 = f32[100]{0} all-reduce(...)
    #   %ar.2 = (f32[10]{0}, f32[3,9]{1,0}) all-reduce(%a, %b)
    line_pat = re.compile(
        r"= ((?:\([^)]*\))|(?:\w+\[[\d,]*\](?:\{[^}]*\})?))\s+"
        r"(all-reduce|all-gather|reduce-scatter|collective-permute)"
        r"(?:-start|-done)?\(",
    )
    shape_pat = re.compile(r"(\w+)\[([\d,]*)\]")
    for m in line_pat.finditer(hlo):
        types, kind = m.group(1), m.group(2)
        nbytes = 0
        for sm in shape_pat.finditer(types):
            dtype, dims = sm.group(1), sm.group(2)
            shape = [int(d) for d in dims.split(",") if d] if dims else []
            elems = int(np.prod(shape)) if shape else 1
            nbytes += elems * DTYPE_BYTES.get(dtype, 4)
        if kind == "all-reduce":
            ici = 2 * (n - 1) / n * nbytes
        elif kind in ("all-gather", "reduce-scatter"):
            ici = (n - 1) / n * nbytes
        else:
            ici = nbytes
        shape0 = shape_pat.search(types)
        tag = (
            f"{shape0.group(1)}[{shape0.group(2)}]" if shape0 else types
        )
        out.append((kind, tag, (), nbytes, ici))
    return out


def audit(name, fn, *args):
    # fn may already be jitted (call .lower directly, avoiding an outer
    # jit wrapper whose as_text may hide the inner module).
    lowered = fn.lower(*args) if hasattr(fn, "lower") else jax.jit(
        fn
    ).lower(*args)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    colls = parse_collectives(hlo, N)
    total_ici = sum(c[4] for c in colls)
    print(f"\n== {name}: {len(colls)} collectives, "
          f"ICI bytes/call = {total_ici/1e6:.3f} MB", flush=True)
    agg = {}
    for kind, dtype, shape, nbytes, ici in colls:
        key = (kind, dtype, shape)
        if key not in agg:
            agg[key] = [0, 0.0]
        agg[key][0] += 1
        agg[key][1] += ici
    for (kind, dtype, shape), (cnt, ici) in sorted(
        agg.items(), key=lambda kv: -kv[1][1]
    ):
        print(f"  {cnt:3d}x {kind:20s} {dtype}{list(shape)}"
              f"  ici={ici/1e6:.3f} MB", flush=True)
    return total_ici


def main():
    print(f"devices: {len(jax.devices())}, mesh N={N}", flush=True)
    from ceres_tpu.parallel import make_mesh, make_mesh_2d

    run_mesh(make_mesh(N), f"1-D obs mesh ({N})")
    if N % 2 == 0:
        run_mesh(
            make_mesh_2d(N // 2, 2), f"2-D obs x pt mesh ({N//2}x2)"
        )


def run_mesh(mesh, label):
    prob = bal.synthesize_bal(
        num_cameras=C, num_points=P, num_observations=O,
        noise=1.0, perturb=0.3, seed=0,
    )
    problem, _, _ = bal.build_problem(prob)
    opts = bal.default_options(iterative=True)
    opts.evaluation_dtype = "float32"
    opts.mesh = mesh

    program = problem.program()
    cast_program(program, opts.evaluation_dtype)
    from ceres_tpu.parallel import replicate, shard_program

    shard_program(program, mesh)
    resolved = dataclasses.replace(
        opts,
        linear_solver_type=opts.resolved_linear_solver_type(
            program.num_tangent
        ),
    )
    # Audit the PRODUCTION graph: the fully-fused LM solve. Collectives
    # inside the LM while_loop appear once per LM iteration; collectives
    # inside the nested CG while_loop appear once per CG iteration.
    from ceres_tpu.fused_lm import (
        _FusedConfig,
        _fused_minimize,
        _build_solve_aux,
        _config_from_options,
    )

    config = _FusedConfig(
        solve=_config_from_options(resolved, program),
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
    aux = _build_solve_aux(resolved, program)
    x0 = replicate(
        program.initial_ambient().astype(jnp.float32), mesh
    )

    total = audit(
        f"fused LM solve (ITERATIVE_SCHUR) on {label}",
        _fused_minimize,
        x0,
        program.families,
        program.plus_struct,
        aux,
        jnp.asarray(resolved.max_num_iterations, jnp.int32),
        config,
        program.jnp_bd_groups(),
    )
    nt = program.num_tangent
    print(
        f"\nContext: num_tangent={nt} ({nt*4/1e6:.2f} MB f32); a "
        "replicating all-reduce of the tangent vector moves "
        f"2(n-1)/n*|v| = {2*(N-1)/N*nt*4/1e6:.2f} MB over ICI on an "
        f"{N}-ring. Per-LM-iteration entries appear once; entries from "
        "the nested CG loop amortize per CG iteration.",
        flush=True,
    )


if __name__ == "__main__":
    main()
