"""Randomized BA-structure fuzzing of the Schur stack.

Analog of the reference's fake-Jacobian fixtures
(fake_bundle_adjustment_jacobian.h:43-49, block_sparse_matrix.h:159
CreateRandomMatrix): generate BA-shaped problems with RANDOM camera /
point / residual block sizes and random visibility, then check the
eliminator (SchurOperator) and the full solve against dense numpy
ground truth — the reference's cross-implementation testing strategy
(schur_eliminator_test.cc compares specializations against the generic
eliminator; here the 'generic implementation' is numpy f64).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.evaluator import _full_impl
from ceres_tpu.linear.schur import SchurOperator, build_schur_structure

pytestmark = pytest.mark.slow  # randomized fuzzing tier


def make_fake_ba_problem(seed, ncam, npt, cam_size, pt_size, r_size,
                         visibility):
    """Random linear BA-shaped problem: every residual block couples one
    camera block and one point block through random dense matrices."""
    rng = np.random.default_rng(seed)
    p = ct.Problem()
    cam_ids = p.add_parameter_blocks(rng.standard_normal((ncam, cam_size)))
    pt_ids = p.add_parameter_blocks(rng.standard_normal((npt, pt_size)))

    ci, pj = [], []
    for j in range(npt):
        vis = np.nonzero(rng.random(ncam) < visibility)[0]
        if vis.size == 0:
            vis = np.array([rng.integers(0, ncam)])
        for c in vis:
            ci.append(int(c))
            pj.append(j)
    ci = np.asarray(ci)
    pj = np.asarray(pj)
    B = ci.shape[0]

    Ac = rng.standard_normal((B, r_size, cam_size))
    Ap = rng.standard_normal((B, r_size, pt_size))
    b0 = rng.standard_normal((B, r_size))

    def resid(cam, pt, data):
        A_c, A_p, b = data
        return A_c @ cam + A_p @ pt + b

    p.add_residual_blocks(resid, None, [cam_ids[ci], pt_ids[pj]],
                          data=(Ac, Ap, b0))
    return p


CONFIGS = [
    # (seed, ncam, npt, cam_size, pt_size, r_size, visibility)
    (0, 4, 30, 9, 3, 2, 0.4),     # BAL shapes
    (1, 3, 25, 6, 3, 2, 0.5),     # reference's 6x3 fake jacobian shape
    (2, 5, 20, 4, 2, 3, 0.3),     # odd sizes
    (3, 2, 40, 7, 5, 1, 0.6),     # scalar residuals, fat points
    (4, 6, 15, 3, 1, 4, 0.5),     # 1-d points
]


def make_two_size_problem(seed, ncam_a, ncam_b, npt, sa, sb, ps, rs, vis):
    """Like make_fake_ba_problem but every residual couples TWO f-blocks
    of DIFFERENT sizes (pose + intrinsics style) and one e-block: drives
    the multi-size F'F cross parts (j1 != j2 / transposed cells) and the
    size-grouped permutation of the scatter-free assembler."""
    rng = np.random.default_rng(seed)
    p = ct.Problem()
    a_ids = p.add_parameter_blocks(rng.standard_normal((ncam_a, sa)))
    b_ids = p.add_parameter_blocks(rng.standard_normal((ncam_b, sb)))
    pt_ids = p.add_parameter_blocks(rng.standard_normal((npt, ps)))

    ai, bi, pj = [], [], []
    for j in range(npt):
        vis_a = np.nonzero(rng.random(ncam_a) < vis)[0]
        if vis_a.size == 0:
            vis_a = np.array([rng.integers(0, ncam_a)])
        for c in vis_a:
            ai.append(int(c))
            bi.append(int(rng.integers(0, ncam_b)))
            pj.append(j)
    ai, bi, pj = map(np.asarray, (ai, bi, pj))
    B = ai.shape[0]
    Aa = rng.standard_normal((B, rs, sa))
    Ab = rng.standard_normal((B, rs, sb))
    Ap = rng.standard_normal((B, rs, ps))
    b0 = rng.standard_normal((B, rs))

    def resid(ca, cb, pt, data):
        A_a, A_b, A_p, b = data
        return A_a @ ca + A_b @ cb + A_p @ pt + b

    p.add_residual_blocks(resid, None, [a_ids[ai], b_ids[bi], pt_ids[pj]],
                          data=(Aa, Ab, Ap, b0))
    return p


@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_two_f_sizes_matches_dense(seed):
    problem = make_two_size_problem(seed, ncam_a=4, ncam_b=3, npt=25,
                                    sa=5, sb=3, ps=2, rs=2, vis=0.4)
    op, ctx, D, _ = _operator_for(problem)
    S_e, rhs_e, f_idx = op.dense_reduced_system()
    _, _, S_np, rhs_np, f, _ = _dense_schur(ctx, D, f_idx)
    scale = max(1.0, float(np.abs(S_np).max()))
    np.testing.assert_allclose(np.asarray(S_e), S_np, atol=1e-8 * scale)
    np.testing.assert_allclose(np.asarray(rhs_e), rhs_np, atol=1e-8 * scale)


def _operator_for(problem):
    program = problem.program()
    ss = build_schur_structure(program)
    x0 = program.initial_ambient()
    _, _, ctx = _full_impl(x0, program.families, True, program.num_tangent,
                           program.jnp_bd_groups())
    D = jnp.sqrt(jnp.clip(ctx.squared_column_norms(), 1e-6, 1e32) / 1e2)
    return SchurOperator(ctx, D, ss), ctx, D, program


def _dense_schur(ctx, D, f_idx):
    """Numpy ground truth: S = H_ff - H_fe H_ee^-1 H_ef from the dense J."""
    J = np.asarray(ctx.to_dense(), dtype=np.float64)
    Dv = np.asarray(D, dtype=np.float64)
    H = J.T @ J + np.diag(Dv**2)
    g = np.asarray(ctx.gradient(), dtype=np.float64)
    n = H.shape[0]
    f = np.asarray(f_idx)
    e = np.setdiff1d(np.arange(n), f)
    Hff = H[np.ix_(f, f)]
    Hfe = H[np.ix_(f, e)]
    Hee = H[np.ix_(e, e)]
    S = Hff - Hfe @ np.linalg.solve(Hee, Hfe.T)
    rhs = g[f] - Hfe @ np.linalg.solve(Hee, g[e])
    return H, g, S, rhs, f, e


@pytest.mark.parametrize("cfg", CONFIGS, ids=[f"cfg{c[0]}" for c in CONFIGS])
def test_fuzz_s_times_matches_dense(cfg):
    seed, ncam, npt, cs, ps, rs, vis = cfg
    problem = make_fake_ba_problem(seed, ncam, npt, cs, ps, rs, vis)
    op, ctx, D, _ = _operator_for(problem)
    S_e, rhs_e, f_idx = op.dense_reduced_system()
    _, _, S_np, rhs_np, f, _ = _dense_schur(ctx, D, f_idx)

    scale = max(1.0, float(np.abs(S_np).max()))
    np.testing.assert_allclose(np.asarray(S_e), S_np, atol=1e-8 * scale)
    np.testing.assert_allclose(np.asarray(rhs_e), rhs_np, atol=1e-8 * scale)

    rng = np.random.default_rng(seed + 100)
    nt = op.ctx.num_tangent
    for _ in range(2):
        v = np.zeros(nt)
        v[f] = rng.standard_normal(f.shape[0])
        sv = np.asarray(op.s_times(jnp.asarray(v)))[f]
        np.testing.assert_allclose(sv, S_np @ v[f], atol=1e-7 * scale)


@pytest.mark.parametrize("cfg", CONFIGS[:3], ids=[f"cfg{c[0]}" for c in CONFIGS[:3]])
def test_fuzz_back_substitute_full_step(cfg):
    """Schur-eliminated step == dense normal-equations step."""
    seed, ncam, npt, cs, ps, rs, vis = cfg
    problem = make_fake_ba_problem(seed, ncam, npt, cs, ps, rs, vis)
    op, ctx, D, _ = _operator_for(problem)
    S_e, rhs_e, f_idx = op.dense_reduced_system()
    H, g, S_np, rhs_np, f, e = _dense_schur(ctx, D, f_idx)

    xf = np.linalg.solve(S_np, rhs_np)
    nt = op.ctx.num_tangent
    v = np.zeros(nt)
    v[f] = xf
    y = np.asarray(op.back_substitute(jnp.asarray(v)))
    y_ref = np.linalg.solve(H, g)
    np.testing.assert_allclose(y, y_ref, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("cfg", CONFIGS[:3], ids=[f"cfg{c[0]}" for c in CONFIGS[:3]])
def test_fuzz_solver_config_equivalence(cfg):
    """The reference's SystemTest pattern at random shapes: DENSE_QR,
    DENSE_SCHUR and ITERATIVE_SCHUR all reach the same final cost."""
    seed, ncam, npt, cs, ps, rs, vis = cfg
    finals = []
    for lst, pt in [
        (ct.LinearSolverType.DENSE_QR, ct.PreconditionerType.JACOBI),
        (ct.LinearSolverType.DENSE_SCHUR, ct.PreconditionerType.SCHUR_JACOBI),
        (ct.LinearSolverType.ITERATIVE_SCHUR,
         ct.PreconditionerType.SCHUR_JACOBI),
    ]:
        problem = make_fake_ba_problem(seed, ncam, npt, cs, ps, rs, vis)
        opts = ct.SolverOptions(linear_solver_type=lst,
                                preconditioner_type=pt,
                                max_num_iterations=30,
                                function_tolerance=1e-12)
        s = ct.solve(opts, problem)
        assert s.termination_type in (ct.TerminationType.CONVERGENCE,
                                      ct.TerminationType.NO_CONVERGENCE)
        finals.append(s.final_cost)
    ref = finals[0]
    for fc in finals[1:]:
        assert abs(fc - ref) <= 1e-4 * (1.0 + ref)
