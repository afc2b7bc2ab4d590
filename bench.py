"""Headline benchmark: BAL bundle adjustment, problem-16-22106 shape.

Workload: synthetic BAL instance with the reference's canonical in-tree
instance shape (16 cameras, 22106 points, ~83718 observations —
``bundle_adjustment_test_util.h:67``), solved with LM + ITERATIVE_SCHUR +
SCHUR_JACOBI (``bundle_adjuster.cc`` defaults) to default tolerances.

Metric: minimizer wall-clock seconds, excluding jit compilation (the
reference's C++ compile time is likewise not counted in its solves).

Baseline: scipy.optimize.least_squares TRF with sparse Jacobians on the
SAME problem/tolerances on this machine's CPU (the reference Ceres C++
cannot be built here: no Eigen, no network egress). Measured once and
cached in BASELINE_LOCAL.json; vs_baseline = baseline_s / ours_s
(>1 means we are faster).

Prints exactly one JSON line.
"""

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
CACHE = REPO / "BASELINE_LOCAL.json"

# Persistent XLA compilation cache: repeated bench runs (fresh processes)
# skip the ~3-4 min of TPU compiles entirely.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

NUM_CAMERAS = 16
NUM_POINTS = 22106
NUM_OBS = 83718
SEED = 16


def build_instance():
    from ceres_tpu.models import bal

    return bal.synthesize_bal(
        num_cameras=NUM_CAMERAS,
        num_points=NUM_POINTS,
        num_observations=NUM_OBS,
        seed=SEED,
    )


def run_ceres_tpu(prob):
    import ceres_tpu as ct
    from ceres_tpu.models import bal

    problem, _, _ = bal.build_problem(prob)
    opts = bal.default_options(iterative=True)
    opts.max_num_iterations = 50
    # TPU precision policy: f64 is software-emulated on TPU (pathological
    # compile + ~20x slower kernels) — pure f32 here. Final cost agrees
    # with the f64 CPU baseline to ~3e-7 relative (under the 1e-6
    # target); enabling use_mixed_precision_solves adds f64-refined
    # steps at a large extra compile cost on the axon remote compiler.
    opts.evaluation_dtype = "float32"

    # Warm up compilation on the real shapes with a 1-iteration solve of a
    # COPY of the problem (same families/shapes => jit cache hit later).
    # The timed solve uses the fully-fused on-device LM loop
    # (ceres_tpu.fused_lm): one XLA while_loop, one host transfer.
    from ceres_tpu.fused_lm import fused_solve

    warm_problem, _, _ = bal.build_problem(prob)
    warm_opts = bal.default_options(iterative=True)
    warm_opts.max_num_iterations = 1
    warm_opts.evaluation_dtype = "float32"
    t0 = time.time()
    fused_solve(warm_opts, warm_problem)
    compile_s = time.time() - t0

    t0 = time.time()
    summary = fused_solve(opts, problem)
    solve_s = time.time() - t0
    return {
        "solve_s": solve_s,
        "compile_s": compile_s,
        "initial_cost": summary.initial_cost,
        "final_cost": summary.final_cost,
        "iterations": len(summary.iterations),
        "termination": str(summary.termination_type),
    }


def run_scipy_baseline(prob, timeout_s=3600.0):
    """scipy TRF sparse-Jacobian solve of the same problem (CPU)."""
    import numpy as np
    from scipy.optimize import least_squares
    from scipy.sparse import lil_matrix

    cam = prob.cameras.copy()
    pts = prob.points.copy()
    ci, pi, obs = prob.camera_index, prob.point_index, prob.observations
    n_cam, n_pts, n_obs = cam.shape[0], pts.shape[0], obs.shape[0]

    def residuals_np(x):
        c = x[: 9 * n_cam].reshape(n_cam, 9)[ci]
        p = x[9 * n_cam :].reshape(n_pts, 3)[pi]
        # Rodrigues rotation (same math as snavely_reprojection_residual).
        aa = c[:, :3]
        theta = np.linalg.norm(aa, axis=1, keepdims=True)
        small = theta[:, 0] < 1e-12
        k = np.where(theta > 1e-12, aa / np.maximum(theta, 1e-300), 0.0)
        ct_, st = np.cos(theta), np.sin(theta)
        kxp = np.cross(k, p)
        kdp = np.sum(k * p, axis=1, keepdims=True)
        pr = p * ct_ + kxp * st + k * kdp * (1.0 - ct_)
        pr[small] = p[small]
        pc = pr + c[:, 3:6]
        xp = -pc[:, 0] / pc[:, 2]
        yp = -pc[:, 1] / pc[:, 2]
        r2 = xp * xp + yp * yp
        distortion = 1.0 + r2 * (c[:, 7] + c[:, 8] * r2)
        f = c[:, 6]
        return np.concatenate(
            [f * distortion * xp - obs[:, 0], f * distortion * yp - obs[:, 1]]
        )

    sparsity = lil_matrix((2 * n_obs, 9 * n_cam + 3 * n_pts), dtype=int)
    rows = np.arange(n_obs)
    for r in (rows, rows + n_obs):
        for j in range(9):
            sparsity[r, 9 * ci + j] = 1
        for j in range(3):
            sparsity[r, 9 * n_cam + 3 * pi + j] = 1

    x0 = np.concatenate([cam.reshape(-1), pts.reshape(-1)])
    t0 = time.time()
    res = least_squares(
        residuals_np,
        x0,
        jac_sparsity=sparsity,
        method="trf",
        ftol=1e-6,
        xtol=1e-8,
        gtol=1e-10,
        max_nfev=200,
    )
    baseline_s = time.time() - t0
    return {
        "baseline_s": baseline_s,
        "baseline_final_cost": 0.5 * float(np.sum(res.fun**2)),
        "baseline_desc": "scipy least_squares TRF sparse, same problem, CPU",
    }


def main():
    prob = build_instance()
    ours = run_ceres_tpu(prob)

    if CACHE.exists():
        base = json.loads(CACHE.read_text())
    else:
        base = run_scipy_baseline(prob)
        CACHE.write_text(json.dumps(base, indent=2))

    vs = base["baseline_s"] / ours["solve_s"] if ours["solve_s"] > 0 else 0.0
    print(
        json.dumps(
            {
                "metric": "BAL 16cam/22106pt solve wall-clock (LM+iterative Schur)",
                "value": round(ours["solve_s"], 3),
                "unit": "s",
                "vs_baseline": round(vs, 3),
                "detail": {
                    "ours": ours,
                    "baseline": base,
                    "note": "vs_baseline = baseline_s/ours_s (>1 = faster); "
                    "baseline is scipy TRF sparse CPU on this host",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
