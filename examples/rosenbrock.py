"""Rosenbrock minimization with GradientProblem — analog of
examples/rosenbrock.cc (general unconstrained minimization path)."""

import numpy as np

import ceres_tpu as ct


def rosenbrock(x):
    return (1.0 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2


def main():
    problem = ct.GradientProblem(rosenbrock, num_parameters=2)
    options = ct.GradientProblemOptions(max_num_iterations=200)
    x = np.array([-1.2, 1.0])
    summary = ct.solve_gradient_problem(options, problem, x)
    print(summary.brief_report())
    print("x:", x, "(truth: [1, 1])")


if __name__ == "__main__":
    main()
