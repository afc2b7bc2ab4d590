"""Minimize 0.5 (10 - x)^2 — analog of examples/helloworld.cc."""

import jax.numpy as jnp
import numpy as np

import ceres_tpu as ct


def main():
    p = ct.Problem()
    x0 = 5.0
    xb = p.add_parameter_block(np.array([x0]))
    p.add_residual_block(lambda x: 10.0 - x, None, [xb])
    options = ct.SolverOptions(minimizer_progress_to_stdout=True)
    summary = ct.solve(options, p)
    print(summary.brief_report())
    print(f"x : {x0} -> {p.parameter_block_value(xb)[0]}")


if __name__ == "__main__":
    main()
