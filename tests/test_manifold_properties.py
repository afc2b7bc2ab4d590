"""Exhaustive manifold invariant suite.

Port of the reference's generic property checker
(``include/ceres/manifold_test_utils.h:78-345``) run over every manifold
family x randomized points x multiple seeds, plus the near-singular
torture points from ``manifold_test.cc`` (quaternions near identity and
near the pi shell, sphere points near the Householder pole, tiny and
huge deltas).

Invariant list (manifold_test_utils.h:78-99):
  1.  plus(x, 0) == x
  2.  minus(x, x) == 0
  3.  minus(plus(x, delta), x) == delta
  4.  minus(plus(x, 0), x) == 0
  5.  plus(x, minus(x, x)) == x
  6.  plus(x, minus(y, x)) == y
  7.  plus_jacobian(x) matches forward-mode autodiff of plus at delta=0
  8.  minus_jacobian(x) matches forward-mode autodiff of minus at y=x
  9.  minus_jacobian(x) @ plus_jacobian(x) == I_tangent
  10. norm constraints preserved (unit quaternion / sphere radius / line
      direction) for every plus().
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceres_tpu.manifold import (
    EuclideanManifold,
    EigenQuaternionManifold,
    LineManifold,
    ProductManifold,
    QuaternionManifold,
    SphereManifold,
    SubsetManifold,
)

pytestmark = pytest.mark.slow  # 737 property cases; test_manifold.py covers the default run

TOL = 1e-9
SEEDS = [0, 1, 2, 7]


def _zoo():
    return [
        EuclideanManifold(1),
        EuclideanManifold(3),
        EuclideanManifold(11),
        SubsetManifold(4, [0]),
        SubsetManifold(4, [3]),
        SubsetManifold(5, [1, 3]),
        SubsetManifold(3, [0, 1, 2]),  # fully constant: T = 0
        QuaternionManifold(),
        EigenQuaternionManifold(),
        SphereManifold(2),
        SphereManifold(3),
        SphereManifold(4),
        SphereManifold(8),
        LineManifold(2),
        LineManifold(3),
        LineManifold(4),
        ProductManifold(QuaternionManifold(), EuclideanManifold(3)),
        ProductManifold(SphereManifold(3), SubsetManifold(2, [0])),
        ProductManifold(
            EuclideanManifold(2),
            ProductManifold(EigenQuaternionManifold(), LineManifold(3)),
        ),
    ]


MANIFOLDS = _zoo()
IDS = [f"{i}:{repr(m)}" for i, m in enumerate(MANIFOLDS)]


def _rand_point(m, rng):
    name = type(m).__name__
    if name in ("QuaternionManifold", "EigenQuaternionManifold"):
        q = rng.standard_normal(4)
        return q / np.linalg.norm(q)
    if name == "SphereManifold":
        v = rng.standard_normal(m.ambient_size)
        return v / np.linalg.norm(v)
    if name == "LineManifold":
        n = m.ambient_size // 2
        o = rng.standard_normal(n)
        d = rng.standard_normal(n)
        return np.concatenate([o, d / np.linalg.norm(d)])
    if name == "ProductManifold":
        return np.concatenate([_rand_point(sub, rng) for sub in m.manifolds])
    return rng.standard_normal(m.ambient_size)


def _rand_delta(m, rng, scale=0.3):
    return scale * rng.standard_normal(m.tangent_size)


def _cases():
    out = []
    for mi, m in enumerate(MANIFOLDS):
        for seed in SEEDS:
            out.append(pytest.param(m, seed, id=f"{IDS[mi]}-s{seed}"))
    return out


CASES = _cases()


@pytest.mark.parametrize("m,seed", CASES)
def test_x_plus_zero_is_x(m, seed):
    rng = np.random.default_rng(seed)
    x = _rand_point(m, rng)
    zero = np.zeros(m.tangent_size)
    np.testing.assert_allclose(np.asarray(m.plus(jnp.asarray(x), jnp.asarray(zero))), x, atol=TOL)


@pytest.mark.parametrize("m,seed", CASES)
def test_x_minus_x_is_zero(m, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(_rand_point(m, rng))
    np.testing.assert_allclose(
        np.asarray(m.minus(x, x)), np.zeros(m.tangent_size), atol=TOL
    )


@pytest.mark.parametrize("m,seed", CASES)
def test_minus_plus_is_identity(m, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(_rand_point(m, rng))
    for scale in (0.5, 1e-3, 1e-8):
        d = jnp.asarray(_rand_delta(m, rng, scale))
        got = np.asarray(m.minus(m.plus(x, d), x))
        np.testing.assert_allclose(got, np.asarray(d), atol=TOL * max(1.0, scale))


@pytest.mark.parametrize("m,seed", CASES)
def test_plus_minus_is_identity_same_point(m, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(_rand_point(m, rng))
    got = np.asarray(m.plus(x, m.minus(x, x)))
    np.testing.assert_allclose(got, np.asarray(x), atol=TOL)


@pytest.mark.parametrize("m,seed", CASES)
def test_plus_minus_is_identity_two_points(m, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(_rand_point(m, rng))
    # y near x so minus(y, x) stays inside the chart's injectivity radius.
    y = jnp.asarray(np.asarray(m.plus(x, jnp.asarray(_rand_delta(m, rng, 0.4)))))
    got = np.asarray(m.plus(x, m.minus(y, x)))
    yv = np.asarray(y)
    name = type(m).__name__
    if name in ("QuaternionManifold", "EigenQuaternionManifold"):
        # q and -q are the same rotation; compare up to sign.
        if np.dot(got, yv) < 0:
            got = -got
    np.testing.assert_allclose(got, yv, atol=1e-8)


@pytest.mark.parametrize("m,seed", CASES)
def test_plus_jacobian_matches_autodiff(m, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(_rand_point(m, rng))
    J = np.asarray(m.plus_jacobian(x))
    assert J.shape == (m.ambient_size, m.tangent_size)
    zero = jnp.zeros(m.tangent_size, dtype=x.dtype)
    J_ad = np.asarray(jax.jacfwd(lambda d: m.plus(x, d))(zero))
    np.testing.assert_allclose(J, J_ad, atol=1e-9)


@pytest.mark.parametrize("m,seed", CASES)
def test_minus_jacobian_matches_numeric(m, seed):
    """Central differences, like manifold_test_utils.h
    HasCorrectMinusJacobianAt: y = x is the chart's branch point for
    sphere/quaternion minus, where exact-point forward AD is undefined
    but the two-sided numeric derivative is well behaved."""
    rng = np.random.default_rng(seed)
    x = jnp.asarray(_rand_point(m, rng))
    J = np.asarray(m.minus_jacobian(x))
    assert J.shape == (m.tangent_size, m.ambient_size)
    h = 1e-7
    J_num = np.zeros_like(J)
    xv = np.asarray(x)
    for k in range(m.ambient_size):
        d = np.zeros(m.ambient_size)
        d[k] = h
        fp = np.asarray(m.minus(jnp.asarray(xv + d), x))
        fm = np.asarray(m.minus(jnp.asarray(xv - d), x))
        J_num[:, k] = (fp - fm) / (2 * h)
    np.testing.assert_allclose(J, J_num, atol=1e-6)


@pytest.mark.parametrize("m,seed", CASES)
def test_minus_plus_jacobian_is_identity(m, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(_rand_point(m, rng))
    Jp = np.asarray(m.plus_jacobian(x))
    Jm = np.asarray(m.minus_jacobian(x))
    T = m.tangent_size
    np.testing.assert_allclose(Jm @ Jp, np.eye(T), atol=1e-9)


@pytest.mark.parametrize("m,seed", CASES)
def test_plus_is_vmappable_and_jittable(m, seed):
    rng = np.random.default_rng(seed)
    xs = jnp.asarray(np.stack([_rand_point(m, rng) for _ in range(5)]))
    ds = jnp.asarray(np.stack([_rand_delta(m, rng) for _ in range(5)]))
    batched = jax.jit(jax.vmap(m.plus))(xs, ds)
    single = np.stack(
        [np.asarray(m.plus(xs[i], ds[i])) for i in range(5)]
    )
    np.testing.assert_allclose(np.asarray(batched), single, atol=1e-12)


# -- Norm-constraint preservation (invariant 10) ------------------------------


@pytest.mark.parametrize("cls", [QuaternionManifold, EigenQuaternionManifold])
@pytest.mark.parametrize("scale", [1e-12, 1e-6, 0.1, 1.0, 3.0])
def test_quaternion_plus_unit_norm(cls, scale):
    m = cls()
    rng = np.random.default_rng(3)
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    d = jnp.asarray(scale * rng.standard_normal(3))
    out = np.asarray(m.plus(jnp.asarray(q), d))
    assert abs(np.linalg.norm(out) - 1.0) < 1e-12


@pytest.mark.parametrize("n", [2, 3, 4, 8])
@pytest.mark.parametrize("scale", [1e-12, 1e-4, 0.5, 2.0])
def test_sphere_plus_preserves_radius(n, scale):
    m = SphereManifold(n)
    rng = np.random.default_rng(4)
    x = rng.standard_normal(n)
    radius = 2.5
    x = radius * x / np.linalg.norm(x)
    d = jnp.asarray(scale * rng.standard_normal(n - 1))
    out = np.asarray(m.plus(jnp.asarray(x), d))
    assert abs(np.linalg.norm(out) - radius) < 1e-10 * max(1.0, radius)


@pytest.mark.parametrize("n", [2, 3, 4])
def test_line_plus_preserves_direction_norm(n):
    m = LineManifold(n)
    rng = np.random.default_rng(5)
    x = _rand_point(m, rng)
    d = jnp.asarray(0.7 * rng.standard_normal(m.tangent_size))
    out = np.asarray(m.plus(jnp.asarray(x), d))
    assert abs(np.linalg.norm(out[n:]) - 1.0) < 1e-12


# -- Torture points (manifold_test.cc near-singular cases) --------------------


def _quat_from_angle_axis(axis, angle):
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    return np.concatenate([[np.cos(angle / 2)], np.sin(angle / 2) * axis])


QUAT_TORTURE_ANGLES = [0.0, 1e-14, 1e-10, 1e-7, 1e-3, np.pi / 2, np.pi - 1e-3, np.pi - 1e-10]


@pytest.mark.parametrize("cls", [QuaternionManifold, EigenQuaternionManifold])
@pytest.mark.parametrize("angle", QUAT_TORTURE_ANGLES)
def test_quaternion_invariants_near_singularities(cls, angle):
    m = cls()
    q = _quat_from_angle_axis([1.0, 2.0, -0.5], angle)
    if cls is EigenQuaternionManifold:
        q = np.concatenate([q[1:], q[:1]])  # xyzw storage
    x = jnp.asarray(q)
    zero = jnp.zeros(3)
    np.testing.assert_allclose(np.asarray(m.plus(x, zero)), q, atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.minus(x, x)), 0.0, atol=1e-12)
    for scale in (1e-12, 1e-6, 0.3):
        d = jnp.asarray(scale * np.array([0.3, -0.7, 0.2]))
        got = np.asarray(m.minus(m.plus(x, d), x))
        np.testing.assert_allclose(got, np.asarray(d), atol=1e-10)
    Jp = np.asarray(m.plus_jacobian(x))
    Jm = np.asarray(m.minus_jacobian(x))
    np.testing.assert_allclose(Jm @ Jp, np.eye(3), atol=1e-9)
    assert np.all(np.isfinite(Jp)) and np.all(np.isfinite(Jm))


@pytest.mark.parametrize("n", [2, 3, 4, 8])
def test_sphere_invariants_near_householder_pole(n):
    """x close to +/- e_n stresses the Householder chart
    (internal/ceres/householder_vector.h)."""
    m = SphereManifold(n)
    for sign in (1.0, -1.0):
        for eps in (0.0, 1e-12, 1e-6):
            x = np.zeros(n)
            x[-1] = sign
            x[0] = eps
            x = x / np.linalg.norm(x)
            xj = jnp.asarray(x)
            zero = jnp.zeros(n - 1)
            np.testing.assert_allclose(np.asarray(m.plus(xj, zero)), x, atol=1e-9)
            d = jnp.asarray(0.2 * np.arange(1, n, dtype=np.float64))
            got = np.asarray(m.minus(m.plus(xj, d), xj))
            np.testing.assert_allclose(got, np.asarray(d), atol=1e-9)
            Jp = np.asarray(m.plus_jacobian(xj))
            Jm = np.asarray(m.minus_jacobian(xj))
            np.testing.assert_allclose(Jm @ Jp, np.eye(n - 1), atol=1e-9)


def test_subset_manifold_validation():
    with pytest.raises(Exception):
        SubsetManifold(3, [5])
    with pytest.raises(Exception):
        SubsetManifold(3, [-1])


def test_subset_tangent_layout():
    m = SubsetManifold(5, [1, 3])
    assert m.ambient_size == 5
    assert m.tangent_size == 3
    x = jnp.arange(5.0)
    d = jnp.asarray([10.0, 20.0, 30.0])
    out = np.asarray(m.plus(x, d))
    np.testing.assert_allclose(out, [10.0, 1.0, 22.0, 3.0, 34.0])


def test_product_manifold_sizes_and_layout():
    m = ProductManifold(QuaternionManifold(), EuclideanManifold(2), SphereManifold(3))
    assert m.ambient_size == 4 + 2 + 3
    assert m.tangent_size == 3 + 2 + 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(_rand_point(m, rng))
    d = jnp.asarray(_rand_delta(m, rng))
    out = np.asarray(m.plus(x, d))
    # quaternion part stays unit, sphere part keeps norm
    assert abs(np.linalg.norm(out[:4]) - 1.0) < 1e-12
    assert abs(np.linalg.norm(out[6:]) - np.linalg.norm(np.asarray(x)[6:])) < 1e-10


def test_zero_tangent_manifold_in_problem():
    """A fully-constant SubsetManifold behaves like a constant block."""
    import ceres_tpu as ct

    p = ct.Problem()
    a = np.array([1.0, 2.0])
    b = np.array([3.0])
    pa = p.add_parameter_block(a, ct.SubsetManifold(2, [0, 1]))
    pb = p.add_parameter_block(b)
    p.add_residual_block(lambda u, v: u[:1] * v[0] - 3.0, None, [pa, pb])
    opts = ct.SolverOptions()
    opts.max_num_iterations = 50
    summary = ct.solve(opts, p)
    np.testing.assert_allclose(a, [1.0, 2.0])  # untouched
    assert summary.final_cost < 1e-10
