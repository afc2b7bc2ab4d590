"""Where does the fused-loop compile time go?

Separates trace/lower time from XLA compile time and reports the size
of the lowered StableHLO module, to direct compile-time work (VERDICT
round-1 item #2: fresh-cache compile_s < 60).

Run: python benchmarks/compile_profile.py [--small]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    small = "--small" in sys.argv
    large = "--large" in sys.argv
    t0 = time.time()
    from bench import build_instance, make_options

    if small:
        from ceres_tpu.models import bal

        problem = bal.synthesize_bal(
            num_cameras=4,
            num_points=200,
            num_observations=800,
            noise=2.0,
            perturb=0.7,
            seed=16,
        )
    elif large:
        from bench import LARGE_C, LARGE_O, LARGE_P
        from ceres_tpu.models import bal

        problem = bal.synthesize_bal(
            num_cameras=LARGE_C,
            num_points=LARGE_P,
            num_observations=LARGE_O,
            noise=2.0,
            perturb=0.7,
            seed=7,
        )
    else:
        problem = build_instance()
    if not hasattr(problem, "program"):
        from ceres_tpu.models import bal as _balmod

        problem, _, _ = _balmod.build_problem(problem)
    print(f"build_instance: {time.time()-t0:.1f}s", flush=True)

    from ceres_tpu.fused_lm import (
        _FusedConfig,
        _fused_minimize,
        _build_solve_aux,
        _config_from_options,
    )

    if large:
        # Match bench.run_large: DENSE_SCHUR explicit eliminator, f32.
        from ceres_tpu.models import bal as _bal

        options = _bal.default_options(iterative=False)
        options.max_num_iterations = 50
        options.function_tolerance = 1e-9
        options.evaluation_dtype = "float32"
    else:
        options = make_options()
    t0 = time.time()
    program = problem.program()
    # Cast FIRST, matching fused_solve's order (fused_lm.py): config and
    # solve_aux (Schur structure) must be built at the evaluation dtype
    # or the profiled lowering differs from the production graph.
    if options.evaluation_dtype is not None:
        from ceres_tpu.problem import cast_program

        cast_program(program, options.evaluation_dtype)
    resolved = dataclasses.replace(
        options,
        linear_solver_type=options.resolved_linear_solver_type(
            program.num_tangent
        ),
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
    solve_aux = _build_solve_aux(resolved, program)
    x0 = program.initial_ambient()
    if options.evaluation_dtype is not None:
        x0 = x0.astype(options.evaluation_dtype)
    print(f"setup: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    lowered = _fused_minimize.lower(
        x0,
        program.families,
        program.plus_struct,
        solve_aux,
        jnp.asarray(resolved.max_num_iterations, jnp.int32),
        config,
        program.jnp_bd_groups(),
    )
    t_lower = time.time() - t0
    hlo = lowered.as_text()
    n_lines = hlo.count("\n")
    print(
        f"lower: {t_lower:.1f}s, stablehlo: {len(hlo)/1e6:.1f} MB, "
        f"{n_lines} lines",
        flush=True,
    )
    # Top op kinds in the lowered module.
    import collections
    import re

    ops = collections.Counter(
        m.group(1) for m in re.finditer(r"= (?:stablehlo|mhlo)\.(\w+)", hlo)
    )
    print("top ops:", ops.most_common(15), flush=True)

    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    print(f"xla compile: {t_compile:.1f}s", flush=True)
    try:
        mem = compiled.memory_analysis()
        print("memory:", mem, flush=True)
    except Exception:
        pass


if __name__ == "__main__":
    main()
