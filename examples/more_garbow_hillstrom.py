"""Moré–Garbow–Hillstrom battery CLI — analog of
examples/more_garbow_hillstrom.cc.

Runs canonical unconstrained test functions ("Testing Unconstrained
Optimization Software", TOMS 7(1) 1981) from their standard starts with
either minimizer and reports the achieved vs certified minimum.

Usage:
    python examples/more_garbow_hillstrom.py                 # all
    python examples/more_garbow_hillstrom.py --problem rosenbrock
    python examples/more_garbow_hillstrom.py --minimizer line_search
"""

import argparse

import jax.numpy as jnp
import numpy as np

import ceres_tpu as ct


def _rosenbrock():
    def f(x):
        return jnp.stack([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

    return f, np.array([-1.2, 1.0]), 0.0


def _freudenstein_roth():
    def f(x):
        return jnp.stack(
            [
                -13.0 + x[0] + ((5.0 - x[1]) * x[1] - 2.0) * x[1],
                -29.0 + x[0] + ((x[1] + 1.0) * x[1] - 14.0) * x[1],
            ]
        )

    return f, np.array([0.5, -2.0]), 0.5 * 48.9842


def _powell_badly_scaled():
    def f(x):
        return jnp.stack(
            [1e4 * x[0] * x[1] - 1.0, jnp.exp(-x[0]) + jnp.exp(-x[1]) - 1.0001]
        )

    return f, np.array([0.0, 1.0]), 0.0


def _brown_badly_scaled():
    def f(x):
        return jnp.stack([x[0] - 1e6, x[1] - 2e-6, x[0] * x[1] - 2.0])

    return f, np.array([1.0, 1.0]), 0.0


def _beale():
    def f(x):
        return jnp.stack(
            [
                1.5 - x[0] * (1.0 - x[1]),
                2.25 - x[0] * (1.0 - x[1] ** 2),
                2.625 - x[0] * (1.0 - x[1] ** 3),
            ]
        )

    return f, np.array([1.0, 1.0]), 0.0


def _helical_valley():
    def f(x):
        theta = jnp.arctan2(x[1], x[0]) / (2.0 * jnp.pi)
        return jnp.stack(
            [
                10.0 * (x[2] - 10.0 * theta),
                10.0 * (jnp.sqrt(x[0] ** 2 + x[1] ** 2) - 1.0),
                x[2],
            ]
        )

    return f, np.array([-1.0, 0.0, 0.0]), 0.0


def _gaussian():
    ys = jnp.asarray(
        [0.0009, 0.0044, 0.0175, 0.0540, 0.1295, 0.2420, 0.3521, 0.3989,
         0.3521, 0.2420, 0.1295, 0.0540, 0.0175, 0.0044, 0.0009]
    )

    def f(x):
        i = jnp.arange(1.0, 16.0)
        t = (8.0 - i) / 2.0
        return x[0] * jnp.exp(-x[1] * (t - x[2]) ** 2 / 2.0) - ys

    return f, np.array([0.4, 1.0, 0.0]), 0.5 * 1.12793e-8


def _box_3d():
    def f(x):
        t = jnp.arange(1.0, 11.0) * 0.1
        return (
            jnp.exp(-t * x[0])
            - jnp.exp(-t * x[1])
            - x[2] * (jnp.exp(-t) - jnp.exp(-10.0 * t))
        )

    return f, np.array([0.0, 10.0, 20.0]), 0.0


def _wood():
    def f(x):
        return jnp.stack(
            [
                10.0 * (x[1] - x[0] ** 2),
                1.0 - x[0],
                jnp.sqrt(90.0) * (x[3] - x[2] ** 2),
                1.0 - x[2],
                jnp.sqrt(10.0) * (x[1] + x[3] - 2.0),
                (x[1] - x[3]) / jnp.sqrt(10.0),
            ]
        )

    return f, np.array([-3.0, -1.0, -3.0, -1.0]), 0.0


PROBLEMS = {
    "rosenbrock": _rosenbrock,
    "freudenstein_roth": _freudenstein_roth,
    "powell_badly_scaled": _powell_badly_scaled,
    "brown_badly_scaled": _brown_badly_scaled,
    "beale": _beale,
    "helical_valley": _helical_valley,
    "gaussian": _gaussian,
    "box_3d": _box_3d,
    "wood": _wood,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", choices=sorted(PROBLEMS), default=None)
    ap.add_argument(
        "--minimizer",
        choices=["trust_region", "line_search"],
        default="trust_region",
    )
    ap.add_argument("--max_iterations", type=int, default=200)
    args = ap.parse_args()

    names = [args.problem] if args.problem else sorted(PROBLEMS)
    wins = 0
    for name in names:
        fn, x0, cost_min = PROBLEMS[name]()
        p = ct.Problem()
        b = p.add_parameter_block(x0.copy())
        p.add_residual_block(fn, None, [b])
        opts = ct.SolverOptions(
            minimizer_type=(
                ct.MinimizerType.TRUST_REGION
                if args.minimizer == "trust_region"
                else ct.MinimizerType.LINE_SEARCH
            ),
            max_num_iterations=args.max_iterations,
        )
        s = ct.solve(opts, p)
        ok = abs(s.final_cost - cost_min) < 1e-5 * max(1.0, abs(cost_min))
        wins += ok
        print(
            f"{name:22s} cost {s.final_cost: .6e} "
            f"(certified {cost_min: .6e}) "
            f"{'OK' if ok else 'MISS':4s} [{s.termination_type}]"
        )
    print(f"{wins}/{len(names)} at certified minimum")


if __name__ == "__main__":
    main()
