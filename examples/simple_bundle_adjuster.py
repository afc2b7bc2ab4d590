"""Minimal BAL bundle adjustment — analog of
examples/simple_bundle_adjuster.cc (the tutorial version of
bundle_adjuster.py: load file, Snavely residual, default solve)."""

import argparse

import ceres_tpu as ct
from ceres_tpu.models import bal


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bal_file", nargs="?", default=None)
    args = ap.parse_args()

    if args.bal_file:
        prob = bal.load_bal_file(args.bal_file)
    else:
        prob = bal.synthesize_bal(16, 2000, 8000)

    problem, _, _ = bal.build_problem(prob)
    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
        minimizer_progress_to_stdout=True,
    )
    summary = ct.solve(options, problem)
    print(summary.full_report())


if __name__ == "__main__":
    main()
