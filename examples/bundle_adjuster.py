"""Bundle adjustment on BAL problems — analog of examples/bundle_adjuster.cc.

Reads a BAL text file (or synthesizes an instance of the canonical
problem-16-22106 shape) and solves it with the configured trust-region /
linear-solver / preconditioner combination.
"""

import argparse

import ceres_tpu as ct
from ceres_tpu.models import bal


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None, help="BAL problem file")
    ap.add_argument("--num_cameras", type=int, default=16)
    ap.add_argument("--num_points", type=int, default=22106)
    ap.add_argument("--num_observations", type=int, default=83718)
    ap.add_argument(
        "--linear_solver",
        default="ITERATIVE_SCHUR",
        choices=[t.name for t in ct.LinearSolverType],
    )
    ap.add_argument(
        "--preconditioner",
        default="SCHUR_JACOBI",
        choices=[t.name for t in ct.PreconditionerType],
    )
    ap.add_argument(
        "--trust_region_strategy",
        default="LEVENBERG_MARQUARDT",
        choices=[t.name for t in ct.TrustRegionStrategyType],
    )
    ap.add_argument("--robustify", action="store_true")
    ap.add_argument("--inner_iterations", action="store_true")
    ap.add_argument("--num_iterations", type=int, default=50)
    ap.add_argument("--eta", type=float, default=0.1)
    ap.add_argument(
        "--mesh", type=int, default=0, help="shard over N devices"
    )
    args = ap.parse_args()

    if args.input:
        prob = bal.load_bal_file(args.input)
    else:
        prob = bal.synthesize_bal(
            args.num_cameras, args.num_points, args.num_observations
        )
    print(
        f"cameras {prob.num_cameras}, points {prob.num_points}, "
        f"observations {prob.num_observations}"
    )

    loss = ct.HuberLoss(1.0) if args.robustify else None
    problem, _, _ = bal.build_problem(prob, loss=loss)

    options = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType[args.linear_solver],
        preconditioner_type=ct.PreconditionerType[args.preconditioner],
        trust_region_strategy_type=ct.TrustRegionStrategyType[
            args.trust_region_strategy
        ],
        use_inner_iterations=args.inner_iterations,
        max_num_iterations=args.num_iterations,
        eta=args.eta,
        minimizer_progress_to_stdout=True,
    )
    if args.mesh:
        from ceres_tpu.parallel import make_mesh

        options.mesh = make_mesh(args.mesh)

    summary = ct.solve(options, problem)
    print(summary.full_report())


if __name__ == "__main__":
    main()
