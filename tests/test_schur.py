"""Schur-complement solver tests.

Mirrors the reference's strategy (SURVEY.md §4.4): specialized/new paths
are validated against the reference path — here DENSE_SCHUR /
ITERATIVE_SCHUR steps and solutions are compared against DENSE_QR on the
same problems (schur_complement_solver_test.cc, iterative_schur tests),
on BA-shaped random fixtures (fake_bundle_adjustment_jacobian.h analog).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.evaluator import Evaluator
from ceres_tpu.linear.schur import (
    SchurOperator,
    build_schur_structure,
    compute_schur_ordering,
    solve_schur,
)
from ceres_tpu.models import bal

pytestmark = pytest.mark.tpu  # curated real-device subset (CERES_TPU_TESTS=1)


def _small_bal(seed=0, C=4, P=40, O=120):
    prob = bal.synthesize_bal(
        num_cameras=C, num_points=P, num_observations=O, seed=seed
    )
    return bal.build_problem(prob)[0]


def _jac_context(problem):
    program = problem.program()
    ev = Evaluator(program)
    full = ev.cost_gradient_jacobian(program.initial_ambient())
    return program, full.jacobian_context


class TestOrdering:
    def test_points_are_e_blocks(self):
        problem = _small_bal()
        program = problem.program()
        e = compute_schur_ordering(program)
        sizes = {rec.pid: rec.tangent_size for rec in program.blocks}
        # all e-blocks are points (tangent size 3), and all points chosen
        assert all(sizes[pid] == 3 for pid in e)
        assert len(e) == 40

    def test_structure_masks_partition(self):
        problem = _small_bal()
        program = problem.program()
        ss = build_schur_structure(program)
        f_mask = np.asarray(ss.f_mask)
        # e coords + f coords = all coords, disjoint
        e_coords = np.asarray(ss.e_group).reshape(-1)
        assert f_mask[e_coords].sum() == 0
        assert f_mask.sum() + e_coords.size == program.num_tangent


class TestSchurOperator:
    """S·x and rhs must equal the explicitly formed Schur complement."""

    def _dense_parts(self, program, ctx, D):
        # Build dense J and form S by brute force.
        J = np.asarray(ctx.to_dense())
        r = np.asarray(ctx.residual_vector())
        ss = build_schur_structure(program)
        e_idx = np.asarray(ss.e_group).reshape(-1)
        f_idx = np.asarray(ss.f_idx)
        Dv = np.asarray(D)
        H = J.T @ J + np.diag(Dv * Dv)
        g = J.T @ r
        Hee = H[np.ix_(e_idx, e_idx)]
        Hef = H[np.ix_(e_idx, f_idx)]
        Hff = H[np.ix_(f_idx, f_idx)]
        S = Hff - Hef.T @ np.linalg.solve(Hee, Hef)
        rhs = g[f_idx] - Hef.T @ np.linalg.solve(Hee, g[e_idx])
        return ss, S, rhs, e_idx, f_idx

    def test_s_times_matches_explicit(self):
        problem = _small_bal(seed=3, C=3, P=25, O=70)
        program, ctx = _jac_context(problem)
        D = jnp.full((program.num_tangent,), 0.7)
        ss, S, rhs, e_idx, f_idx = self._dense_parts(program, ctx, D)
        op = SchurOperator(ctx, D, ss)
        rng = np.random.default_rng(0)
        v_f = rng.standard_normal(f_idx.size)
        v = np.zeros(program.num_tangent)
        v[f_idx] = v_f
        got = np.asarray(op.s_times(jnp.asarray(v)))[f_idx]
        np.testing.assert_allclose(got, S @ v_f, rtol=1e-8, atol=1e-8)

    def test_rhs_matches_explicit(self):
        problem = _small_bal(seed=4, C=3, P=25, O=70)
        program, ctx = _jac_context(problem)
        D = jnp.full((program.num_tangent,), 0.3)
        ss, S, rhs, e_idx, f_idx = self._dense_parts(program, ctx, D)
        op = SchurOperator(ctx, D, ss)
        got = np.asarray(op.rhs())[f_idx]
        np.testing.assert_allclose(got, rhs, rtol=1e-8, atol=1e-8)

    def test_schur_jacobi_is_block_diag_of_s(self):
        problem = _small_bal(seed=5, C=3, P=25, O=70)
        program, ctx = _jac_context(problem)
        D = jnp.full((program.num_tangent,), 0.5)
        ss, S, rhs, e_idx, f_idx = self._dense_parts(program, ctx, D)
        op = SchurOperator(ctx, D, ss)
        blocks = op.schur_jacobi_blocks()
        pos_of = {int(c): i for i, c in enumerate(f_idx)}
        for T, idx in ss.f_groups.items():
            got = np.asarray(blocks[T])
            for g, row in enumerate(np.asarray(idx)):
                sub = np.ix_(
                    [pos_of[int(c)] for c in row],
                    [pos_of[int(c)] for c in row],
                )
                np.testing.assert_allclose(
                    got[g], S[sub], rtol=1e-7, atol=1e-7
                )


class TestSolveParity:
    """Schur solves equal DENSE_QR solves of the same damped system
    (the reference compares eliminators against full factorization)."""

    @pytest.mark.parametrize(
        "solver", ["DENSE_SCHUR", "SPARSE_SCHUR", "ITERATIVE_SCHUR"]
    )
    def test_step_matches_dense_qr(self, solver):
        from ceres_tpu.linear.dense import solve_dense_qr

        problem = _small_bal(seed=6, C=3, P=30, O=90)
        program, ctx = _jac_context(problem)
        D = jnp.full((program.num_tangent,), 1.0)
        opts = ct.SolverOptions(
            linear_solver_type=getattr(ct.LinearSolverType, solver),
            preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
            eta=1e-12,
            max_linear_solver_iterations=500,
        )
        y, _, _ = solve_schur(ctx, D, program, opts)
        y_ref = solve_dense_qr(ctx, D)
        # dense paths are exact; the iterative path converges to CG's
        # floor (~1e-7 relative residual), same as the reference's
        # ITERATIVE_SCHUR accuracy under tight eta
        tol = 1e-6 if solver != "ITERATIVE_SCHUR" else 5e-4
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=tol, atol=1e-6
        )

    @pytest.mark.parametrize(
        "precond", ["SCHUR_JACOBI", "SCHUR_POWER_SERIES_EXPANSION", "JACOBI", "IDENTITY"]
    )
    def test_iterative_schur_preconditioners(self, precond):
        from ceres_tpu.linear.dense import solve_dense_qr

        problem = _small_bal(seed=7, C=3, P=30, O=90)
        program, ctx = _jac_context(problem)
        D = jnp.full((program.num_tangent,), 2.0)
        opts = ct.SolverOptions(
            linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=getattr(ct.PreconditionerType, precond),
            eta=1e-12,
            max_linear_solver_iterations=1000,
        )
        y, _, _ = solve_schur(ctx, D, program, opts)
        y_ref = solve_dense_qr(ctx, D)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=2e-3, atol=1e-6
        )


class TestEndToEnd:
    """BA system test: all Schur configs reach the same minimum as
    DENSE_QR (bundle_adjustment_test_util.h:57-94, tolerance analog)."""

    def test_bal_solver_configs_agree(self):
        prob = bal.synthesize_bal(
            num_cameras=4, num_points=60, num_observations=200, seed=11
        )
        finals = {}
        for solver in ("DENSE_QR", "DENSE_SCHUR", "ITERATIVE_SCHUR"):
            p, _, _ = bal.build_problem(prob)
            opts = ct.SolverOptions(
                linear_solver_type=getattr(ct.LinearSolverType, solver),
                preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
                max_num_iterations=40,
            )
            s = ct.solve(opts, p)
            finals[solver] = s.final_cost
        ref = finals["DENSE_QR"]
        for k, v in finals.items():
            assert abs(v - ref) / max(ref, 1e-12) < 1e-4, finals

    def test_robust_loss_bal(self):
        prob = bal.synthesize_bal(
            num_cameras=3, num_points=40, num_observations=120, seed=12
        )
        p, _, _ = bal.build_problem(prob, loss=ct.loss.HuberLoss(1.0))
        s = ct.solve(bal.default_options(), p)
        assert s.final_cost < s.initial_cost * 0.1


class TestNIST:
    def test_parse_and_solve_misra1a(self):
        from ceres_tpu.models import nist

        prob = nist.parse_nist_file(
            "/root/reference/data/nist/Misra1a.dat"
        )
        assert prob.starts.shape == (2, 2)
        res = nist.run_suite(names=["Misra1a"])
        assert len(res) == 2
        for r in res:
            assert r["lre"] >= 4.0, res

    def test_thurber_hard_start(self):
        from ceres_tpu.models import nist

        res = nist.run_suite(names=["Thurber"])
        assert max(r["lre"] for r in res) >= 4.0, res
