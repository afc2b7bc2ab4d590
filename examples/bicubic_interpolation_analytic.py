"""Bicubic grid alignment with hand-written Jacobians — analog of
examples/bicubic_interpolation_analytic.cc: the cost uses the
interpolator's analytic derivative outputs (f, df/dr, df/dc) directly
via ``ct.analytic_cost`` instead of differentiating through the spline.
"""

import jax
import jax.numpy as jnp
import numpy as np

import ceres_tpu as ct


def main():
    def f(r, c):
        return r * r - c * r + c * c

    rows, cols = np.meshgrid(
        np.arange(-2.0, 12.0), np.arange(-2.0, 12.0), indexing="ij"
    )
    interp = ct.BiCubicInterpolator(
        ct.Grid2D(f(rows, cols), row_begin=-2, col_begin=-2)
    )

    rng = np.random.default_rng(5)
    true_shift = np.array([1.3, -0.7])
    samples = rng.uniform(1.0, 7.0, (40, 2))
    values = f(samples[:, 0] + true_shift[0], samples[:, 1] + true_shift[1])
    values += 0.01 * rng.standard_normal(40)

    def residual(shift, data):
        pts, vals = data
        pred = jax.vmap(
            lambda q: interp.evaluate(q[0] + shift[0], q[1] + shift[1])[0][0]
        )(pts)
        return pred - vals

    def jacobian(shift, data):
        # AnalyticBiCubicCost::Evaluate: J row i = [df/dr, df/dc] at
        # point_i + shift — the interpolator's analytic derivatives.
        pts, _ = data

        def one(q):
            _, dfdr, dfdc = interp.evaluate(
                q[0] + shift[0], q[1] + shift[1]
            )
            return jnp.stack([dfdr[0], dfdc[0]])

        J = jax.vmap(one)(pts)  # (40, 2)
        return (J, None)  # data is constant (NULL jacobian slot)

    p = ct.Problem()
    b = p.add_parameter_block(np.zeros(2))
    p.add_residual_block(
        ct.analytic_cost(residual, jacobian),
        None,
        [b],
        data=(jnp.asarray(samples), jnp.asarray(values)),
    )
    s = ct.solve(ct.SolverOptions(max_num_iterations=50), p)
    print(s.brief_report())
    print("shift:", p.parameter_block_value(b), "(truth:", true_shift, ")")


if __name__ == "__main__":
    main()
