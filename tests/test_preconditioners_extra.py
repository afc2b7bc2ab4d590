"""SPSE initialization + visibility-clustered preconditioners."""

import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.models import bal

pytestmark = pytest.mark.slow  # clustered/SPSE/subset sweeps: ~2 min tier


@pytest.fixture(scope="module")
def instance():
    return bal.synthesize_bal(6, 80, 320, seed=12)


def _solve(instance, **kwargs):
    p, _, _ = bal.build_problem(instance)
    kwargs.setdefault(
        "linear_solver_type", ct.LinearSolverType.ITERATIVE_SCHUR
    )
    opts = ct.SolverOptions(max_num_iterations=15, **kwargs)
    s = ct.solve(opts, p)
    return s, sum(i.linear_solver_iterations for i in s.iterations)


def test_spse_initialization_reduces_cg_iterations(instance):
    base, it_base = _solve(
        instance, preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI
    )
    spse, it_spse = _solve(
        instance,
        preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
        use_spse_initialization=True,
    )
    assert it_spse <= it_base
    np.testing.assert_allclose(
        spse.final_cost, base.final_cost, rtol=1e-5
    )


@pytest.mark.parametrize(
    "precond", ["CLUSTER_JACOBI", "CLUSTER_TRIDIAGONAL"]
)
def test_clustered_preconditioner(instance, precond):
    base, it_base = _solve(
        instance, preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI
    )
    cl, it_cl = _solve(
        instance,
        preconditioner_type=getattr(ct.PreconditionerType, precond),
    )
    # Clustered blocks are usually at least as strong as single-camera
    # blocks, but not provably on every instance (cluster shapes depend
    # on the canonical-views greedy) — allow small slack.
    assert it_cl <= it_base + 2
    np.testing.assert_allclose(cl.final_cost, base.final_cost, rtol=1e-5)


def test_subset_preconditioner(instance):
    """SUBSET with all rows == full normal matrix => CG converges almost
    immediately; partial subsets still converge to the same minimum
    (subset_preconditioner.h:44-80)."""
    p, _, _ = bal.build_problem(instance)
    prog = p.program()
    rids = list(prog.families[0].residual_ids)
    base, it_base = _solve(
        instance,
        linear_solver_type=ct.LinearSolverType.CGNR,
        preconditioner_type=ct.PreconditionerType.JACOBI,
    )
    full, it_full = _solve(
        instance,
        linear_solver_type=ct.LinearSolverType.CGNR,
        preconditioner_type=ct.PreconditionerType.SUBSET,
        residual_blocks_for_subset_preconditioner=rids,
    )
    half, it_half = _solve(
        instance,
        linear_solver_type=ct.LinearSolverType.CGNR,
        preconditioner_type=ct.PreconditionerType.SUBSET,
        residual_blocks_for_subset_preconditioner=rids[::2],
    )
    assert it_full < it_base
    np.testing.assert_allclose(full.final_cost, base.final_cost, rtol=1e-5)
    np.testing.assert_allclose(half.final_cost, base.final_cost, rtol=1e-4)


def test_cluster_groups_structure(instance):
    from ceres_tpu.linear.schur import build_schur_structure

    p, _, _ = bal.build_problem(instance)
    program = p.program()
    ss = build_schur_structure(program, with_clusters=True)
    assert ss.cluster_groups is not None
    cg = np.asarray(ss.cluster_groups)
    # all real coords are f coords, each exactly once
    real = cg[cg < program.num_tangent]
    f_idx = set(int(v) for v in np.asarray(ss.f_idx))
    assert set(int(v) for v in real) == f_idx
    assert len(real) == len(set(real))
