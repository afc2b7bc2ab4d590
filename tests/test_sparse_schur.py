"""True SPARSE_SCHUR: block-sparse reduced system vs the dense path.

Mirrors the reference's cross-implementation strategy
(schur_complement_solver_test.cc): the sparse-assembled S and the step
it produces must match the dense explicit assembly exactly, and the
end-to-end solve must match DENSE_SCHUR's result.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.models import bal
from ceres_tpu.types import LinearSolverType


def _small_bal(num_cameras=6, num_points=40, num_obs=160, seed=3):
    prob = bal.synthesize_bal(
        num_cameras=num_cameras,
        num_points=num_points,
        num_observations=num_obs,
        noise=1.0,
        perturb=0.3,
        seed=seed,
    )
    problem, _, _ = bal.build_problem(prob)
    return problem


def _schur_setup(problem, linear_solver_type):
    import dataclasses

    from ceres_tpu.trust_region import (
        _build_solve_aux,
        _config_from_options,
    )

    opts = bal.default_options(iterative=False)
    opts.linear_solver_type = linear_solver_type
    program = problem.program()
    resolved = dataclasses.replace(
        opts,
        linear_solver_type=opts.resolved_linear_solver_type(
            program.num_tangent
        ),
    )
    config = _config_from_options(resolved, program)
    aux = _build_solve_aux(resolved, program)
    return program, config, aux


def test_sparse_assembly_matches_dense_S():
    """Scatter the sparse CSC back to dense and compare with the
    explicit dense assembler (cross-implementation equivalence)."""
    from ceres_tpu.evaluator import Evaluator
    from ceres_tpu.linear.schur import SchurOperator
    from ceres_tpu.linear.schur_explicit import compute_cell_blocks
    from ceres_tpu.linear.sparse_schur import build_sparse_schur_assembly

    problem = _small_bal()
    program, config, aux = _schur_setup(
        problem, LinearSolverType.SPARSE_SCHUR
    )
    ss = aux["ss"]
    assert ss.explicit is not None

    ev = Evaluator(program)
    full = ev.cost_gradient_jacobian(program.initial_ambient())
    ctx = full.jacobian_context
    D = jnp.full((program.num_tangent,), 0.37)
    op = SchurOperator(ctx, D, ss)

    S_dense = np.asarray(op.dense_reduced_system()[0])

    assembly = build_sparse_schur_assembly(ss.explicit, ss)
    _, blocks = compute_cell_blocks(op, ss.explicit)
    vals = np.concatenate(
        [np.asarray(b, dtype=np.float64).ravel() for b in blocks]
    )
    data = np.bincount(
        assembly.pos, weights=vals, minlength=assembly.nnz + 1
    )[: assembly.nnz]
    df = np.asarray(D)[np.asarray(ss.f_idx)]
    data[assembly.diag_pos] += df * df

    import scipy.sparse as sp

    H = sp.csc_matrix(
        (data, assembly.indices, assembly.indptr),
        shape=(assembly.nf, assembly.nf),
    ).toarray()
    S_sparse = H + np.triu(H, k=1).T
    np.testing.assert_allclose(S_sparse, S_dense, rtol=1e-10, atol=1e-8)


def test_sparse_schur_step_matches_dense_schur_step():
    from ceres_tpu.evaluator import Evaluator
    from ceres_tpu.linear.sparse_schur import make_sparse_schur_step_fn
    from ceres_tpu.trust_region import _lm_step_impl

    problem = _small_bal(seed=11)
    program, config_s, aux = _schur_setup(
        problem, LinearSolverType.SPARSE_SCHUR
    )
    _, config_d, aux_d = _schur_setup(
        problem, LinearSolverType.DENSE_SCHUR
    )

    ev = Evaluator(program)
    full = ev.cost_gradient_jacobian(program.initial_ambient())
    ctx = full.jacobian_context
    radius = jnp.asarray(1e3, jnp.float64)

    sparse_fn = make_sparse_schur_step_fn(config_s, aux)
    step_s, mcc_s, _, term_s = sparse_fn(ctx, radius)
    step_d, mcc_d, _, term_d = _lm_step_impl(ctx, radius, aux_d, config_d)
    np.testing.assert_allclose(
        np.asarray(step_s), np.asarray(step_d), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        float(mcc_s), float(mcc_d), rtol=1e-7
    )


def test_sparse_schur_solve_matches_dense():
    problem_s = _small_bal(seed=5)
    problem_d = _small_bal(seed=5)
    opts_s = bal.default_options(iterative=False)
    opts_s.linear_solver_type = LinearSolverType.SPARSE_SCHUR
    opts_s.max_num_iterations = 10
    opts_d = bal.default_options(iterative=False)
    opts_d.linear_solver_type = LinearSolverType.DENSE_SCHUR
    opts_d.max_num_iterations = 10
    s1 = ct.solve(opts_s, problem_s)
    s2 = ct.solve(opts_d, problem_d)
    assert s1.is_solution_usable()
    assert s1.final_cost == pytest.approx(s2.final_cost, rel=1e-5)


@pytest.mark.slow
def test_sparse_schur_many_cameras():
    """2,048-camera sparse-visibility problem: dense S would be
    (18432)^2 — the regime schur_complement_solver.h:169-183 exists for.
    Verifies nnz(S) is a small fraction of nf^2 and the solve works."""
    import jax

    rng = np.random.default_rng(0)
    ncam, npt = 2048, 6000
    cams = 0.02 * rng.standard_normal((ncam, 9))
    cams[:, 6] = 1.0  # focal
    pts = rng.standard_normal((npt, 3)) + np.array([0.0, 0.0, 4.0])
    # Band visibility: each point seen by 3 consecutive cameras.
    obs_cam, obs_pt = [], []
    for p in range(npt):
        c0 = (p * ncam // npt) % (ncam - 3)
        for dc in range(3):
            obs_cam.append(c0 + dc)
            obs_pt.append(p)
    obs_cam = np.asarray(obs_cam, dtype=np.int64)
    obs_pt = np.asarray(obs_pt, dtype=np.int64)
    uv = np.asarray(
        jax.vmap(
            lambda c, p: bal.snavely_reprojection_residual(
                c, p, jnp.zeros(2)
            )
        )(jnp.asarray(cams[obs_cam]), jnp.asarray(pts[obs_pt]))
    )
    prob = bal.BALProblem(
        cameras=cams,
        points=pts + 0.02 * rng.standard_normal(pts.shape),
        camera_index=obs_cam,
        point_index=obs_pt,
        observations=uv + 0.005 * rng.standard_normal(uv.shape),
    )
    problem, _, _ = bal.build_problem(prob)
    opts = ct.SolverOptions()
    opts.linear_solver_type = LinearSolverType.SPARSE_SCHUR
    opts.max_num_iterations = 4
    summary = ct.solve(opts, problem)
    assert summary.is_solution_usable()

    program = problem.program()
    ss = getattr(program, "_schur_structure", None)
    assert ss is not None and getattr(ss, "_sparse_assembly", None) is not None
    asm = ss._sparse_assembly
    nf = asm.nf
    assert nf == 9 * ncam
    # Band visibility => S block-banded: nnz a tiny fraction of dense.
    assert asm.nnz < 0.02 * nf * (nf + 1) / 2
