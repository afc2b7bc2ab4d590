"""Optimize over a bicubically-interpolated grid — analog of
examples/bicubic_interpolation.cc: recover a translation that aligns
noisy samples of f(x, y) = x*x - y*x + y*y against the interpolated
grid."""

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

    p = ct.Problem()
    b = p.add_parameter_block(np.zeros(2))
    p.add_residual_block(
        residual, None, [b], data=(jnp.asarray(samples), jnp.asarray(values))
    )
    s = ct.solve(ct.SolverOptions(max_num_iterations=50), p)
    print(s.brief_report())
    print(
        "shift:", p.parameter_block_value(b), "(truth:", true_shift, ")"
    )


if __name__ == "__main__":
    main()
