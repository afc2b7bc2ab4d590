"""CLUSTER_TRIDIAGONAL preconditioner (visibility_based_preconditioner.h).

Validates:
  - canonical-views clustering + linear forest structure building
  - the batched block-Thomas apply equals a dense solve against the
    explicitly assembled block-tridiagonal part of S
  - end-to-end BA solves with CLUSTER_TRIDIAGONAL converge to the same
    cost as SCHUR_JACOBI and the preconditioner is distinct from
    CLUSTER_JACOBI
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.models import bal


def _setup(num_cameras=8, num_points=60, num_obs=300, seed=3):
    prob = bal.synthesize_bal(
        num_cameras=num_cameras,
        num_points=num_points,
        num_observations=num_obs,
        seed=seed,
    )
    problem, _, _ = bal.build_problem(prob)
    opts = bal.default_options(iterative=True)
    opts.preconditioner_type = ct.PreconditionerType.CLUSTER_TRIDIAGONAL
    program = problem.program()
    resolved = dataclasses.replace(
        opts,
        linear_solver_type=opts.resolved_linear_solver_type(
            program.num_tangent
        ),
    )
    from ceres_tpu.trust_region import _build_solve_aux

    aux = _build_solve_aux(resolved, program)
    return problem, program, resolved, aux


def test_chain_structure_built():
    _, _, _, aux = _setup()
    ss = aux["ss"]
    assert ss.cluster_groups is not None
    assert ss.chain_clusters is not None
    C = ss.cluster_groups.shape[0]
    chains = np.asarray(ss.chain_clusters)
    real = chains[chains < C]
    # every cluster appears exactly once across all chains
    assert sorted(real.tolist()) == list(range(C))


def test_block_thomas_matches_dense_tridiagonal_solve():
    """With strong LM damping the tridiagonal truncation of S is SPD, no
    guard triggers, and the block-Thomas apply must equal the dense
    solve against the explicitly assembled block-tridiagonal matrix."""
    problem, program, resolved, aux = _setup()
    ss = aux["ss"]
    from ceres_tpu.evaluator import Evaluator
    from ceres_tpu.linear.schur import SchurOperator

    ev = Evaluator(program)
    x = program.initial_ambient()
    full = ev.cost_gradient_jacobian(x)
    ctx = full.jacobian_context
    n = ctx.num_tangent

    # Dense S (probe path is exact) restricted to all coordinates.
    def dense_S(op):
        def col(i):
            e = jnp.zeros((n,), dtype=op.dtype).at[i].set(1.0)
            return op.s_times(e)

        return np.asarray(jnp.stack([col(i) for i in range(n)], axis=1))

    groups = np.asarray(ss.cluster_groups)
    chains = np.asarray(ss.chain_clusters)
    C, m = groups.shape

    def assemble_tridiag(S):
        M = np.zeros((n, n))
        for c in range(C):
            coords = groups[c][groups[c] < n]
            M[np.ix_(coords, coords)] = S[np.ix_(coords, coords)]
        for chain in chains:
            real = chain[chain < C]
            for a, b in zip(real[:-1], real[1:]):
                ca = groups[a][groups[a] < n]
                cb = groups[b][groups[b] < n]
                M[np.ix_(ca, cb)] = S[np.ix_(ca, cb)]
                M[np.ix_(cb, ca)] = S[np.ix_(cb, ca)]
        return M

    f_mask = np.asarray(ss.f_mask)
    f = np.nonzero(f_mask > 0)[0]
    rng = np.random.default_rng(0)
    v = rng.standard_normal(n) * f_mask

    # Find a damping strong enough that the truncation is SPD.
    for damping in (3.0, 10.0, 100.0, 1000.0):
        D = jnp.full((n,), damping, ctx.residuals[0].dtype)
        op = SchurOperator(ctx, D, ss)
        S = dense_S(op)
        M = assemble_tridiag(S)
        if np.linalg.eigvalsh(M[np.ix_(f, f)]).min() > 1e-8:
            break
    else:
        pytest.skip("no SPD tridiagonal truncation found")

    apply = op.cluster_tridiagonal_preconditioner(
        ss.cluster_groups, ss.chain_clusters
    )
    got = np.asarray(apply(jnp.asarray(v)))
    expect = np.zeros(n)
    expect[f] = np.linalg.solve(M[np.ix_(f, f)], v[f])
    np.testing.assert_allclose(got, expect, rtol=1e-7, atol=1e-8)


def test_guarded_apply_is_spd_and_finite_when_truncation_indefinite():
    """With weak damping the truncation can go indefinite; the guarded
    factorization must still produce a finite, SPD preconditioner."""
    problem, program, resolved, aux = _setup()
    ss = aux["ss"]
    from ceres_tpu.evaluator import Evaluator
    from ceres_tpu.linear.schur import SchurOperator

    ev = Evaluator(program)
    full = ev.cost_gradient_jacobian(program.initial_ambient())
    ctx = full.jacobian_context
    n = ctx.num_tangent
    D = jnp.full((n,), 1e-2, ctx.residuals[0].dtype)
    op = SchurOperator(ctx, D, ss)
    apply = op.cluster_tridiagonal_preconditioner(
        ss.cluster_groups, ss.chain_clusters
    )
    rng = np.random.default_rng(0)
    f_mask = np.asarray(ss.f_mask)
    for k in range(3):
        v = jnp.asarray(rng.standard_normal(n) * f_mask)
        out = np.asarray(apply(v))
        assert np.all(np.isfinite(out))
        # SPD preconditioner: v' M^{-1} v > 0
        assert float(np.dot(np.asarray(v), out)) > 0.0


def test_tridiagonal_differs_from_cluster_jacobi():
    problem, program, resolved, aux = _setup()
    ss = aux["ss"]
    C = ss.cluster_groups.shape[0]
    chains = np.asarray(ss.chain_clusters)
    # at least one real chain edge exists in this visibility graph
    assert (chains[:, 1:] < C).any(), "no forest edges -> test vacuous"

    from ceres_tpu.evaluator import Evaluator
    from ceres_tpu.linear.schur import SchurOperator

    ev = Evaluator(program)
    full = ev.cost_gradient_jacobian(program.initial_ambient())
    ctx = full.jacobian_context
    n = ctx.num_tangent
    D = jnp.full((n,), 1e-2, ctx.residuals[0].dtype)
    op = SchurOperator(ctx, D, ss)
    v = jnp.asarray(np.random.default_rng(1).standard_normal(n)) * ss.f_mask
    tri = np.asarray(
        op.cluster_tridiagonal_preconditioner(
            ss.cluster_groups, ss.chain_clusters
        )(v)
    )
    jac = np.asarray(op.clustered_preconditioner(ss.cluster_groups)(v))
    assert np.max(np.abs(tri - jac)) > 1e-10


@pytest.mark.parametrize(
    "ptype",
    [
        ct.PreconditionerType.CLUSTER_TRIDIAGONAL,
        ct.PreconditionerType.CLUSTER_JACOBI,
    ],
)
def test_ba_solve_converges(ptype):
    prob = bal.synthesize_bal(
        num_cameras=8, num_points=60, num_observations=300, seed=3
    )
    problem, _, _ = bal.build_problem(prob)
    opts = bal.default_options(iterative=True)
    opts.preconditioner_type = ptype
    opts.max_num_iterations = 40
    s = ct.solve(opts, problem)
    assert s.is_solution_usable()
    # reference run: SCHUR_JACOBI on the same instance
    problem2, _, _ = bal.build_problem(prob)
    opts2 = bal.default_options(iterative=True)
    opts2.max_num_iterations = 40
    s2 = ct.solve(opts2, problem2)
    assert s.final_cost <= s2.final_cost * 1.05 + 1e-8
