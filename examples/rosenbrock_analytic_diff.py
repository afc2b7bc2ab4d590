"""Rosenbrock with a hand-written analytic gradient — analog of
examples/rosenbrock_analytic_diff.cc (FirstOrderFunction::Evaluate
filling the gradient manually)."""

import numpy as np

import ceres_tpu as ct


def rosenbrock(x):
    return (1.0 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2


def rosenbrock_gradient(x):
    # rosenbrock_analytic_diff.cc:46-52
    import jax.numpy as jnp

    g0 = -2.0 * (1.0 - x[0]) - 400.0 * x[0] * (x[1] - x[0] ** 2)
    g1 = 200.0 * (x[1] - x[0] ** 2)
    return jnp.stack([g0, g1])


def main():
    problem = ct.GradientProblem(
        rosenbrock, num_parameters=2, gradient_fn=rosenbrock_gradient
    )
    options = ct.GradientProblemOptions(max_num_iterations=200)
    x = np.array([-1.2, 1.0])
    summary = ct.solve_gradient_problem(options, problem, x)
    print(summary.brief_report())
    print("x:", x, "(truth: [1, 1])")


if __name__ == "__main__":
    main()
