"""Smoke tests: every fast example must run end-to-end.

The reference ships its examples as CI-built binaries; this is the
equivalent guard for the Python ports.
"""

import sys

import pytest

pytestmark = pytest.mark.slow  # 26 example smoke runs tier

sys.path.insert(0, "/root/repo")

FAST_EXAMPLES = [
    ("helloworld", []),
    ("helloworld_analytic_diff", []),
    ("helloworld_numeric_diff", []),
    ("rosenbrock_analytic_diff", []),
    ("rosenbrock_numeric_diff", []),
    ("bicubic_interpolation_analytic", []),
    ("powell", []),
    ("curve_fitting", []),
    ("robust_curve_fitting", []),
    ("circle_fit", ["--num_points", "80", "--outliers", "8"]),
    ("rosenbrock", []),
    ("sampled_function", []),
    ("robot_pose_mle", []),
    ("bicubic_interpolation", []),
    (
        "bundle_adjuster",
        [
            "--num_cameras", "3", "--num_points", "40",
            "--num_observations", "120", "--num_iterations", "5",
        ],
    ),
    ("pose_graph_3d", ["--num_poses", "40"]),
    (
        "nist",
        ["--names", "Misra1a", "--num_iterations", "200"],
    ),
    (
        "libmv_bundle_adjuster",
        ["--num_iterations", "2"],
    ),
    (
        "denoising",
        ["--crop", "16", "--num_iterations", "2"],
    ),
    ("iteration_callback_example", []),
    ("evaluation_callback_example", []),
    (
        "ellipse_approximation",
        ["--num_segments", "40", "--num_points", "60", "--max_iterations", "10"],
    ),
    ("more_garbow_hillstrom", ["--problem", "rosenbrock"]),
    (
        "more_garbow_hillstrom",
        ["--problem", "beale", "--minimizer", "line_search"],
    ),
]


@pytest.mark.parametrize(
    "name,argv", FAST_EXAMPLES, ids=[e[0] for e in FAST_EXAMPLES]
)
def test_example_runs(name, argv, capsys):
    import importlib

    mod = importlib.import_module(f"examples.{name}")
    old_argv = sys.argv
    sys.argv = ["x"] + argv
    try:
        mod.main()
    finally:
        sys.argv = old_argv
    out = capsys.readouterr().out
    assert "Termination" in out or "LRE" in out or "RMSE" in out or out
