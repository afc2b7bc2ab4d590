"""Minimal flat "C API" analog (``include/ceres/c_api.h:1-148``).

The reference ships a tiny C89 wrapper — problem create/free, one
callback-based ``ceres_problem_add_residual_block``, stock loss-function
constructors, and a fixed-options ``ceres_solve`` — so foreign-language
callers can drive the solver without the C++ API. This module is the
Python-native equivalent of that *shape of API*: the same function names
and fill-in callback contract, for porting code written against the C
API (or binding from another language via any Python bridge).

Semantics mirrored from ``internal/ceres/c_api.cc``:

- cost callbacks receive (user_data, parameters, residuals, jacobians)
  and FILL the residual / jacobian arrays, returning truthy on success
  (``c_api.h ceres_cost_function_t``);
- parameter blocks are identified by the array object the caller passes
  (the analog of the ``double*`` identity in C) and are updated IN PLACE
  by ``ceres_solve``;
- ``ceres_solve`` uses the fixed options of ``c_api.cc:175-185``
  (max 100 iterations, dense QR-class solver, progress to stdout) and
  prints the full report.

Black-box callbacks cannot trace, so they are bridged into the jitted
evaluator with ``jax.pure_callback`` behind the ``analytic_cost``
custom-JVP wrapper — the evaluator's fused ``vmap(jacfwd)`` consumes the
user Jacobian exactly like the reference consumes ``Evaluate``'s.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ceres_tpu import loss as _loss
from ceres_tpu.cost_functions import analytic_cost
from ceres_tpu.problem import Problem
from ceres_tpu.solver import SolverOptions, solve

__all__ = [
    "ceres_init",
    "ceres_create_problem",
    "ceres_free_problem",
    "ceres_problem_add_residual_block",
    "ceres_solve",
    "ceres_stock_loss_function",
    "ceres_create_huber_loss_function_data",
    "ceres_create_softl1_loss_function_data",
    "ceres_create_cauchy_loss_function_data",
    "ceres_create_arctan_loss_function_data",
    "ceres_create_tolerant_loss_function_data",
    "ceres_free_stock_loss_function_data",
]


def ceres_init() -> None:
    """``ceres_init()`` — the reference initializes logging; a no-op here."""


class CeresProblem:
    """Opaque problem handle (``ceres_problem_t``)."""

    def __init__(self) -> None:
        self.problem = Problem()
        self._param_ids: dict = {}  # id(array) -> (pid, array)
        self._next_block = 0

    def _param_id(self, arr: np.ndarray) -> int:
        key = id(arr)
        if key not in self._param_ids:
            pid = self.problem.add_parameter_block(np.asarray(arr, float))
            self._param_ids[key] = (pid, arr)
        return self._param_ids[key][0]


def ceres_create_problem() -> CeresProblem:
    return CeresProblem()


def ceres_free_problem(problem: CeresProblem) -> None:
    """Release the handle (GC does the real work; kept for API parity)."""
    problem.problem = None
    problem._param_ids = {}


class _CallbackLoss(_loss.LossFunction):
    """Adapts a ``ceres_loss_function_t`` callback: fn(user_data, s, out[3])."""

    def __init__(self, fn: Callable, user_data) -> None:
        self._fn = fn
        self._user_data = user_data

    def evaluate(self, s):
        def host(sv):
            out = np.zeros((3,) + np.shape(sv), dtype=np.float64)
            flat = np.atleast_1d(np.asarray(sv, dtype=np.float64))
            o = out.reshape(3, -1)
            for i, si in enumerate(flat):
                buf = np.zeros(3)
                self._fn(self._user_data, float(si), buf)
                o[:, i] = buf
            return out

        s = jnp.asarray(s)
        out = jax.pure_callback(
            host,
            jax.ShapeDtypeStruct((3,) + s.shape, jnp.float64),
            s,
            vmap_method="sequential",
        )
        dt = s.dtype
        return out[0].astype(dt), out[1].astype(dt), out[2].astype(dt)

    def tree_flatten(self):
        return (), (self._fn, self._user_data)

    @classmethod
    def tree_unflatten(cls, aux, children):
        del children
        return cls(*aux)


jax.tree_util.register_pytree_node(
    _CallbackLoss, _CallbackLoss.tree_flatten, _CallbackLoss.tree_unflatten
)


def ceres_stock_loss_function(loss_function_data, squared_norm, out) -> None:
    """``ceres_stock_loss_function`` — evaluate a stock loss created by a
    ``ceres_create_*_loss_function_data`` call into ``out[0:3]``."""
    r0, r1, r2 = loss_function_data.evaluate(jnp.float64(squared_norm))
    out[0], out[1], out[2] = float(r0), float(r1), float(r2)


def ceres_create_huber_loss_function_data(a: float):
    return _loss.HuberLoss(a)


def ceres_create_softl1_loss_function_data(a: float):
    return _loss.SoftLOneLoss(a)


def ceres_create_cauchy_loss_function_data(a: float):
    return _loss.CauchyLoss(a)


def ceres_create_arctan_loss_function_data(a: float):
    return _loss.ArctanLoss(a)


def ceres_create_tolerant_loss_function_data(a: float, b: float):
    return _loss.TolerantLoss(a, b)


def ceres_free_stock_loss_function_data(loss_function_data) -> None:
    """API parity no-op (Python objects are GC'd)."""


def ceres_problem_add_residual_block(
    problem: CeresProblem,
    cost_function: Callable,
    cost_function_data,
    loss_function: Optional[Callable],
    loss_function_data,
    num_residuals: int,
    num_parameter_blocks: int,
    parameter_block_sizes: Sequence[int],
    parameter_pointers: Sequence[np.ndarray],
) -> int:
    """``ceres_problem_add_residual_block`` (c_api.cc:141-171).

    ``cost_function(user_data, parameters, residuals, jacobians)`` fills
    ``residuals`` (len ``num_residuals``) and, when ``jacobians`` is not
    None, each non-None ``jacobians[i]`` with the (num_residuals,
    size_i) row-major Jacobian; returns truthy on success.
    """
    sizes = [int(s) for s in parameter_block_sizes]
    if len(sizes) != int(num_parameter_blocks) or len(parameter_pointers) != len(sizes):
        raise ValueError("parameter block count/size mismatch")
    for arr, sz in zip(parameter_pointers, sizes):
        if np.asarray(arr).size != sz:
            raise ValueError("parameter array size != declared size")
    nr = int(num_residuals)

    def _residuals_np(*blocks):
        params = [np.asarray(b, dtype=np.float64).reshape(-1) for b in blocks]
        res = np.zeros(nr, dtype=np.float64)
        ok = cost_function(cost_function_data, params, res, None)
        if not ok:
            res[:] = np.nan  # evaluator treats non-finite as failure
        return res

    def _jacobians_np(*blocks):
        params = [np.asarray(b, dtype=np.float64).reshape(-1) for b in blocks]
        res = np.zeros(nr, dtype=np.float64)
        jacs = [np.zeros((nr, sz), dtype=np.float64) for sz in sizes]
        ok = cost_function(cost_function_data, params, res, jacs)
        if not ok:
            for J in jacs:
                J[:] = np.nan
        return tuple(jacs)

    def residual_fn(*args):
        return jax.pure_callback(
            _residuals_np,
            jax.ShapeDtypeStruct((nr,), jnp.float64),
            *args,
            vmap_method="sequential",
        ).astype(args[0].dtype)

    def jacobian_fn(*args):
        out = jax.pure_callback(
            _jacobians_np,
            tuple(jax.ShapeDtypeStruct((nr, sz), jnp.float64) for sz in sizes),
            *args,
            vmap_method="sequential",
        )
        return tuple(J.astype(args[0].dtype) for J in out)

    fn = analytic_cost(residual_fn, jacobian_fn)

    if loss_function is None:
        loss_obj: Optional[_loss.LossFunction] = None
    elif loss_function is ceres_stock_loss_function:
        loss_obj = loss_function_data  # already a LossFunction
    else:
        loss_obj = _CallbackLoss(loss_function, loss_function_data)

    pids = [problem._param_id(arr) for arr in parameter_pointers]
    rid = problem.problem.add_residual_block(fn, loss_obj, pids)
    problem._next_block += 1
    return rid


def ceres_solve(problem: CeresProblem, max_num_iterations: int = 100) -> None:
    """``ceres_solve`` (c_api.cc:173-186): fixed options — 100 iterations,
    dense QR-class linear solver, per-iteration progress to stdout —
    then print the full report and write the solution back into the
    caller's parameter arrays (the C API mutates through double*)."""
    from ceres_tpu.types import LinearSolverType

    opts = SolverOptions()
    opts.max_num_iterations = int(max_num_iterations)
    opts.linear_solver_type = LinearSolverType.DENSE_QR
    opts.minimizer_progress_to_stdout = True
    summary = solve(opts, problem.problem)
    print(summary.full_report())
    for pid, arr in problem._param_ids.values():
        value = np.asarray(
            problem.problem.parameter_block_value(pid)
        ).reshape(np.shape(arr))
        np.asarray(arr)[...] = value
    return summary
