"""Problem construction / Program tests (mirrors problem_test.cc and
program_test.cc essentials)."""

import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.evaluator import Evaluator


def _r2(a, b):
    return a - b  # size-2 residual over two 2-vectors


def test_counts_and_family_grouping():
    p = ct.Problem()
    a = p.add_parameter_block(np.zeros(2))
    b = p.add_parameter_block(np.ones(2))
    c = p.add_parameter_block(np.full(3, 2.0))

    p.add_residual_block(_r2, None, [a, b])
    p.add_residual_block(_r2, None, [b, a])

    def r3(x):
        return x * 2.0

    p.add_residual_block(r3, None, [c])

    assert p.num_parameter_blocks() == 3
    assert p.num_parameters() == 7
    assert p.num_residual_blocks() == 3
    prog = p.program()
    assert len(prog.families) == 2  # two _r2 instances batch together
    assert p.num_residuals() == 7


def test_constant_blocks_drop_gradient():
    p = ct.Problem()
    a = p.add_parameter_block(np.array([1.0, 2.0]))
    b = p.add_parameter_block(np.array([3.0, 4.0]))
    p.add_residual_block(_r2, None, [a, b])
    p.set_parameter_block_constant(b)
    prog = p.program()
    assert prog.num_tangent == 2
    ev = Evaluator(prog)
    full = ev.cost_gradient_jacobian(prog.initial_ambient())
    g = np.asarray(full.gradient)
    assert g.shape == (2,)
    # gradient = J^T r = (a - b) for the 'a' block
    np.testing.assert_allclose(g, [-2.0, -2.0])


def test_evaluate_api():
    p = ct.Problem()
    a = p.add_parameter_block(np.array([1.0, 2.0]))

    def r(x):
        return x - jnp.asarray([5.0, 5.0])

    p.add_residual_block(r, None, [a])
    out = p.evaluate(residuals=True, gradient=True, jacobian=True)
    assert out["cost"] == pytest.approx(0.5 * (16 + 9))
    np.testing.assert_allclose(out["residuals"], [-4.0, -3.0])
    np.testing.assert_allclose(out["gradient"], [-4.0, -3.0])
    np.testing.assert_allclose(out["jacobian"], np.eye(2))


def test_evaluate_applies_loss():
    p = ct.Problem()
    a = p.add_parameter_block(np.array([2.0]))

    def r(x):
        return x

    p.add_residual_block(r, ct.HuberLoss(1.0), [a])
    out = p.evaluate()
    # s = 4, huber: 2*1*2 - 1 = 3, cost = 1.5
    assert out["cost"] == pytest.approx(1.5)
    out2 = p.evaluate(apply_loss_function=False)
    assert out2["cost"] == pytest.approx(2.0)


def test_bounds_and_feasibility():
    p = ct.Problem()
    a = p.add_parameter_block(np.array([1.0, 2.0]))
    p.set_parameter_lower_bound(a, 0, 0.0)
    p.set_parameter_upper_bound(a, 0, 5.0)
    assert p.get_parameter_lower_bound(a, 0) == 0.0
    assert p.get_parameter_upper_bound(a, 0) == 5.0
    assert p.get_parameter_lower_bound(a, 1) == -np.inf

    def r(x):
        return x

    p.add_residual_block(r, None, [a])
    assert p.program().is_feasible()
    p.set_parameter_lower_bound(a, 1, 10.0)
    assert not p.program().is_feasible()


def test_remove_parameter_block_removes_residuals():
    p = ct.Problem()
    a = p.add_parameter_block(np.zeros(2))
    b = p.add_parameter_block(np.zeros(2))
    p.add_residual_block(_r2, None, [a, b])

    def r1(x):
        return x

    p.add_residual_block(r1, None, [a])
    p.remove_parameter_block(b)
    assert p.num_parameter_blocks() == 1
    assert p.num_residual_blocks() == 1


def test_batched_add():
    p = ct.Problem()
    pts = p.add_parameter_blocks(np.arange(12.0).reshape(4, 3))
    assert p.num_parameter_blocks() == 4

    def r(x, data):
        return x - data

    targets = np.ones((4, 3))
    p.add_residual_blocks(r, None, [pts], data=targets)
    prog = p.program()
    assert len(prog.families) == 1
    assert prog.families[0].batch == 4
    ev = Evaluator(prog)
    cost = float(ev.cost(prog.initial_ambient()))
    expected = 0.5 * np.sum((np.arange(12.0).reshape(4, 3) - 1.0) ** 2)
    assert cost == pytest.approx(expected)


def test_manifold_block_tangent_layout():
    p = ct.Problem()
    q = p.add_parameter_block(
        np.array([1.0, 0.0, 0.0, 0.0]), manifold=ct.QuaternionManifold()
    )
    t = p.add_parameter_block(np.zeros(3))

    def r(qb, tb):
        return jnp.concatenate([qb[1:], tb])

    p.add_residual_block(r, None, [q, t])
    prog = p.program()
    assert prog.num_ambient == 7
    assert prog.num_tangent == 6
    ev = Evaluator(prog)
    full = ev.cost_gradient_jacobian(prog.initial_ambient())
    J = np.asarray(full.jacobian_context.to_dense())
    assert J.shape == (6, 6)


def test_plus_with_manifolds():
    p = ct.Problem()
    q = p.add_parameter_block(
        np.array([1.0, 0.0, 0.0, 0.0]), manifold=ct.QuaternionManifold()
    )
    t = p.add_parameter_block(np.array([1.0, 2.0]))

    def r(qb, tb):
        return tb

    p.add_residual_block(r, None, [q, t])
    prog = p.program()
    x = prog.initial_ambient()
    delta = jnp.asarray([0.0, 0.0, 0.0, 0.5, -0.5])
    x_new = np.asarray(prog.plus(x, delta))
    np.testing.assert_allclose(x_new[:4], [1.0, 0.0, 0.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(x_new[4:], [1.5, 1.5])
