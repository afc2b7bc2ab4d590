"""Rosenbrock with a numerically differentiated gradient — analog of
examples/rosenbrock_numeric_diff.cc (central differences around f)."""

import numpy as np

import ceres_tpu as ct
from ceres_tpu.numeric_diff import numeric_diff_gradient


def rosenbrock(x):
    return (1.0 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2


def main():
    # NumericDiffFirstOrderFunction analog: central differences supply
    # the gradient, the cost itself is evaluated exactly.
    problem = ct.GradientProblem(
        rosenbrock,
        num_parameters=2,
        gradient_fn=numeric_diff_gradient(rosenbrock, method="CENTRAL"),
    )
    options = ct.GradientProblemOptions(max_num_iterations=200)
    x = np.array([-1.2, 1.0])
    summary = ct.solve_gradient_problem(options, problem, x)
    print(summary.brief_report())
    print("x:", x, "(truth: [1, 1])")


if __name__ == "__main__":
    main()
