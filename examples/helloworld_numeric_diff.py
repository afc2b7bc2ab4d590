"""Minimize 0.5 (10 - x)^2 with numeric differentiation — analog of
examples/helloworld_numeric_diff.cc (NumericDiffCostFunction)."""

import numpy as np

import ceres_tpu as ct
from ceres_tpu.numeric_diff import numeric_diff


def main():
    p = ct.Problem()
    x0 = 0.5
    xb = p.add_parameter_block(np.array([x0]))
    cost = numeric_diff(lambda x: 10.0 - x, method="CENTRAL")
    p.add_residual_block(cost, None, [xb])
    options = ct.SolverOptions(minimizer_progress_to_stdout=True)
    summary = ct.solve(options, p)
    print(summary.brief_report())
    print(f"x : {x0} -> {p.parameter_block_value(xb)[0]}")


if __name__ == "__main__":
    main()
