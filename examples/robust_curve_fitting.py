"""Curve fitting with outliers + CauchyLoss — analog of
examples/robust_curve_fitting.cc (same dataset with corrupted points)."""

import jax.numpy as jnp
import numpy as np

import ceres_tpu as ct
from examples.curve_fitting import DATA as CLEAN, residual

# robust_curve_fitting.cc corrupts a copy of the data with outliers.
DATA = CLEAN.copy()
rng = np.random.default_rng(1234)
for i in rng.choice(len(DATA), 8, replace=False):
    DATA[i, 1] += rng.choice([-1, 1]) * rng.uniform(1.5, 4.0)


def main():
    p = ct.Problem()
    mc = p.add_parameter_block(np.zeros(2))
    p.add_residual_block(
        residual,
        ct.CauchyLoss(0.5),
        [mc],
        data=(jnp.asarray(DATA[:, 0]), jnp.asarray(DATA[:, 1])),
    )
    summary = ct.solve(ct.SolverOptions(max_num_iterations=50), p)
    print(summary.brief_report())
    m, c = p.parameter_block_value(mc)
    print(f"Final m: {m:.6f} c: {c:.6f} (truth: 0.3, 0.1, robust to outliers)")


if __name__ == "__main__":
    main()
