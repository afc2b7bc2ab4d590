"""Fully-fused Levenberg-Marquardt: the whole minimizer in one XLA loop.

The host-loop minimizer (trust_region.py) mirrors the reference's
control flow and bookkeeping; its per-iteration cost on a TPU tunnel is
dominated by host↔device round-trips (~2 per iteration after fusion).
This module is the speed-of-light alternative: the COMPLETE LM loop —
evaluation, linear solve, step quality, accept/reject, radius update,
convergence tests — as one ``lax.while_loop`` that runs start-to-finish
on device with a single host transfer at the end. The full-scale analog
of TinySolver (tiny_solver.h:30-398) built on the real solver stack.

Trade-offs vs the host loop: no per-iteration callbacks/summaries, no
non-monotonic steps, no bounds, no inner iterations. Semantics otherwise
match LevenbergMarquardtStrategy + TrustRegionMinimizer's convergence
tests (function/gradient/parameter tolerance, min radius).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ceres_tpu.evaluator import _cost_impl, _full_impl
from ceres_tpu.problem import Program, plus_apply
from ceres_tpu.trust_region import (
    _SolveConfig,
    _build_solve_aux,
    _config_from_options,
    _linear_solve,
)
from ceres_tpu.types import TerminationType


class _FusedState(NamedTuple):
    x: jax.Array
    cost: jax.Array  # f64 scalar
    radius: jax.Array
    decrease_factor: jax.Array
    iteration: jax.Array
    successful_steps: jax.Array
    unsuccessful_steps: jax.Array
    invalid_in_a_row: jax.Array
    termination: jax.Array  # 0 = running, else TerminationType-ish code
    linear_iterations: jax.Array  # cumulative CG/linear iterations


_RUNNING = 0
_CONVERGENCE = 1
_NO_CONVERGENCE = 2
_FAILURE = 3


@dataclasses.dataclass(frozen=True)
class _FusedConfig:
    solve: _SolveConfig
    function_tolerance: float
    gradient_tolerance: float
    parameter_tolerance: float
    min_relative_decrease: float
    initial_trust_region_radius: float
    max_trust_region_radius: float
    min_trust_region_radius: float
    max_invalid_steps: int
    jacobi_scaling: bool
    apply_loss: bool
    num_tangent: int


@functools.partial(jax.jit, static_argnames=("config",))
def _fused_minimize(
    x0,
    families,
    plus_struct,
    solve_aux,
    max_num_iterations,
    config: _FusedConfig,
    groups=None,
):
    # max_num_iterations is a DEVICE scalar (not static): warm-up solves
    # with a different budget share the compiled while_loop.
    sc = config.solve

    def eval_full(x):
        return _full_impl(
            x, families, config.apply_loss, config.num_tangent, groups
        )

    cost0, grad0, _ = eval_full(x0)

    def body(s: _FusedState):
        cost, grad, ctx = eval_full(s.x)

        scaling = None
        if config.jacobi_scaling:
            scaling = 1.0 / (1.0 + jnp.sqrt(ctx.squared_column_norms()))
            ctx = ctx.scale_columns(scaling)

        diag = jnp.clip(
            ctx.squared_column_norms(), sc.min_lm_diagonal, sc.max_lm_diagonal
        )
        D = jnp.sqrt(diag / s.radius.astype(diag.dtype))
        y, lin_iters, lin_term = _linear_solve(ctx, D, solve_aux, sc)
        step_scaled = -y.astype(diag.dtype)
        Js = ctx.matvec(step_scaled)
        mcc = jnp.asarray(0.0, jnp.float64)
        for fi in range(len(ctx.families)):
            mcc = mcc - jnp.sum(Js[fi] * (ctx.residuals[fi] + Js[fi] / 2.0))

        step = (
            step_scaled * scaling if config.jacobi_scaling else step_scaled
        )
        # Linear-solver FAILURE (breakdown/indefiniteness) invalidates the
        # step like the host loop's HandleInvalidStep (linear_solver.h:57).
        from ceres_tpu.linear.cg import CG_FAILURE

        step_is_valid = (
            jnp.isfinite(mcc) & (mcc > 0.0) & (lin_term < CG_FAILURE)
        )

        candidate = plus_apply(plus_struct, s.x, step)
        # Cost-only candidate evaluation (the reference's cost-only
        # Evaluate in ComputeCandidatePointAndEvaluateCost) — no Jacobian.
        cand_cost = _cost_impl(candidate, families, config.apply_loss)
        cand_cost = jnp.where(
            jnp.isfinite(cand_cost), cand_cost, jnp.asarray(np.inf)
        )

        rho = (cost - cand_cost) / mcc
        accept = step_is_valid & (rho > config.min_relative_decrease)

        # LM radius update (levenberg_marquardt_strategy.cc:158-171).
        r_acc = s.radius / jnp.maximum(
            1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3
        )
        r_acc = jnp.minimum(r_acc, config.max_trust_region_radius)
        r_rej = s.radius / s.decrease_factor
        radius = jnp.where(accept, r_acc, r_rej)
        decrease_factor = jnp.where(accept, 2.0, s.decrease_factor * 2.0)

        new_x = jnp.where(accept, candidate, s.x)
        new_cost = jnp.where(accept, cand_cost, cost)

        invalid_in_a_row = jnp.where(
            step_is_valid, 0, s.invalid_in_a_row + 1
        )

        # Convergence tests (trust_region_minimizer.cc:640-764).
        x_norm = jnp.linalg.norm(s.x.astype(jnp.float64))
        step_norm = jnp.linalg.norm(
            (candidate - s.x).astype(jnp.float64)
        )
        cost_change = jnp.abs(cost - cand_cost)
        gmax = jnp.max(jnp.abs(grad.astype(jnp.float64)))

        param_tol = step_is_valid & (
            step_norm
            <= config.parameter_tolerance
            * (x_norm + config.parameter_tolerance)
        ) & (s.successful_steps > 0)
        func_tol = step_is_valid & (
            cost_change <= config.function_tolerance * cost
        )
        # Tested unconditionally at the loop-top iterate (like the host
        # minimizer): a converged point whose trailing steps are rejected
        # still terminates with CONVERGENCE, not min-radius/NO_CONVERGENCE.
        grad_tol = gmax <= config.gradient_tolerance
        radius_tol = radius <= config.min_trust_region_radius
        too_invalid = invalid_in_a_row >= config.max_invalid_steps

        termination = jnp.where(
            param_tol | func_tol | grad_tol | radius_tol,
            _CONVERGENCE,
            jnp.where(too_invalid, _FAILURE, _RUNNING),
        ).astype(jnp.int32)

        return _FusedState(
            x=new_x,
            cost=new_cost,
            radius=radius,
            decrease_factor=decrease_factor,
            iteration=s.iteration + 1,
            successful_steps=s.successful_steps + accept.astype(jnp.int32),
            unsuccessful_steps=s.unsuccessful_steps
            + (1 - accept.astype(jnp.int32)),
            invalid_in_a_row=invalid_in_a_row,
            termination=termination,
            linear_iterations=s.linear_iterations
            + lin_iters.astype(jnp.int32),
        )

    def cond(s: _FusedState):
        return (s.termination == _RUNNING) & (
            s.iteration < max_num_iterations
        )

    init = _FusedState(
        x=x0,
        cost=cost0,
        radius=jnp.asarray(
            config.initial_trust_region_radius, jnp.float64
        ),
        decrease_factor=jnp.asarray(2.0, jnp.float64),
        iteration=jnp.asarray(0, jnp.int32),
        successful_steps=jnp.asarray(0, jnp.int32),
        unsuccessful_steps=jnp.asarray(0, jnp.int32),
        invalid_in_a_row=jnp.asarray(0, jnp.int32),
        termination=jnp.where(
            jnp.max(jnp.abs(grad0)) <= config.gradient_tolerance,
            _CONVERGENCE,
            _RUNNING,
        ).astype(jnp.int32),
        linear_iterations=jnp.asarray(0, jnp.int32),
    )
    final = jax.lax.while_loop(cond, body, init)
    return final, cost0


def fused_solve(options, problem):
    """Solve with the fused on-device LM loop; returns a SolverSummary
    and writes the solution back (the fast-path analog of ct.solve)."""
    from ceres_tpu.solver import SolverSummary

    t0 = time.time()
    program = problem.program()
    if options.evaluation_dtype is not None:
        from ceres_tpu.problem import cast_program

        cast_program(program, options.evaluation_dtype)
    if options.mesh is not None:
        from ceres_tpu.parallel import shard_program

        shard_program(program, options.mesh)

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
    if options.mesh is not None:
        from ceres_tpu.parallel import replicate

        x0 = replicate(x0, options.mesh)

    final, cost0 = _fused_minimize(
        x0,
        program.families,
        program.plus_struct,
        solve_aux,
        jnp.asarray(resolved.max_num_iterations, jnp.int32),
        config,
        program.jnp_bd_groups(),
    )
    (x, cost, term, iters, succ, unsucc, lin_iters, c0) = jax.device_get(
        (
            final.x,
            final.cost,
            final.termination,
            final.iteration,
            final.successful_steps,
            final.unsuccessful_steps,
            final.linear_iterations,
            cost0,
        )
    )

    summary = SolverSummary()
    summary.fixed_cost = program.fixed_cost
    summary.initial_cost = float(c0) + program.fixed_cost
    summary.final_cost = float(cost) + program.fixed_cost
    summary.num_successful_steps = int(succ)
    summary.num_unsuccessful_steps = int(unsucc)
    summary.minimizer_type = resolved.minimizer_type
    summary.linear_solver_type_used = resolved.linear_solver_type
    term = int(term)
    if term == _CONVERGENCE:
        summary.termination_type = TerminationType.CONVERGENCE
        summary.message = "Fused minimizer converged."
    elif term == _FAILURE:
        summary.termination_type = TerminationType.FAILURE
        summary.message = "Too many consecutive invalid steps."
    else:
        summary.termination_type = TerminationType.NO_CONVERGENCE
        summary.message = f"Maximum iterations reached ({int(iters)})."
    summary.num_linear_solver_iterations = int(lin_iters)
    summary.num_parameter_blocks = program.num_parameter_blocks()
    summary.num_parameters = program.num_ambient
    summary.num_effective_parameters = program.num_tangent
    summary.num_residuals = program.num_residuals()
    summary.total_time_in_seconds = time.time() - t0
    summary.iterations = [None] * int(iters)  # count only; no per-iter data
    if summary.is_solution_usable():
        problem.write_back(np.asarray(x, dtype=np.float64))
    return summary
