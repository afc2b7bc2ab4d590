"""Real-device (TPU) equivalence tests — the analog of the reference's
CUDA-vs-CPU tests (cuda_dense_cholesky_test.cc, cuda_vector_test.cc:1-442,
cuda_sparse_matrix_test.cc): the same computations that the CPU suite
checks numerically are run compiled on the accelerator platform and
compared against host (numpy, f64) ground truth.

Only meaningful with CERES_TPU_TESTS=1 (otherwise the conftest pins the
CPU platform and these duplicate existing coverage); kept in the curated
``tpu`` marker set either way so one command runs the whole device suite:

    CERES_TPU_TESTS=1 python -m pytest tests/ -q -m tpu
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _on_accelerator():
    return jax.default_backend() not in ("cpu",)


def test_pallas_sorted_segment_compiled():
    """Pallas sorted-segment kernel, compiled (NOT interpret mode) on the
    accelerator when present: matches a numpy segment sum exactly in f32.
    """
    from ceres_tpu.ops.pallas_segment import build_sorted_plan, segment_sum_sorted, TILE_B

    rng = np.random.RandomState(0)
    B, G, d = 16384, 700, 6
    seg = np.sort(rng.randint(0, G, size=B)).astype(np.int64)
    contrib = rng.randn(B, d).astype(np.float32)

    local, starts, maxp, _ = build_sorted_plan(seg, G)
    interpret = not _on_accelerator()  # CPU cannot lower Pallas TPU kernels
    out = segment_sum_sorted(
        jnp.asarray(contrib), jnp.asarray(local), jnp.asarray(starts),
        G, maxp, TILE_B, interpret=interpret,
    )
    ref = np.zeros((G + 1, d), np.float64)
    np.add.at(ref, seg, contrib.astype(np.float64))
    np.testing.assert_allclose(np.asarray(out[:G]), ref[:G], rtol=1e-5, atol=1e-4)


def test_f64_emulation_dot():
    """f64 on TPU is emulated; verify it still produces f64-accurate
    results on an ill-conditioned dot that f32 gets wrong."""
    n = 4096
    # random (asymmetric) values: a symmetric grid like linspace lets
    # low-precision rounding errors cancel pairwise and fakes accuracy
    x = ((1.0 + np.random.RandomState(7).rand(n)) * 1e8).astype(
        np.float64
    )
    y = np.ones(n) * 1e-8
    exact = float(np.dot(x, y))
    got = float(jnp.dot(jnp.asarray(x, jnp.float64), jnp.asarray(y, jnp.float64)))
    assert abs(got - exact) / abs(exact) < 1e-12
    # bf16 inputs are meaningfully worse — confirms the f64 path above
    # really exercised extended precision. (An f32 comparison is flaky:
    # the axon backend may accumulate f32 dots in wider precision,
    # making the f32 result coincidentally exact.)
    got16 = float(
        jnp.dot(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(y, jnp.bfloat16)
        ).astype(jnp.float32)
    )
    assert abs(got16 - exact) / abs(exact) > 1e-6


def test_fused_bal_solve_on_device():
    """End-to-end fused LM on the device platform converges to the same
    cost the CPU suite expects (BAL 8cam/500pt, Huber)."""
    import ceres_tpu as ct
    from ceres_tpu.fused_lm import fused_solve
    from ceres_tpu.models import bal

    prob = bal.synthesize_bal(num_cameras=8, num_points=500,
                              num_observations=2000, seed=42)
    problem, _, _ = bal.build_problem(prob, loss=ct.loss.HuberLoss(1.0))
    opts = bal.default_options(iterative=True)
    opts.evaluation_dtype = "float32"
    opts.max_num_iterations = 40
    # Tolerances must match the evaluation precision: with f32
    # residuals the cost plateaus ~1e-2 above the f64 optimum, so the
    # f64-grade default ftol=1e-6 is unreachable — the solve grinds to
    # the f32 noise floor and ends in the invalid-step ladder (the
    # reference would do the same given f32 arithmetic). ftol=1e-5 is
    # the f32-realistic setting; the device trace converges via the
    # function-tolerance test at the cost plateau.
    opts.function_tolerance = 1e-5
    s = fused_solve(opts, problem)
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    assert s.final_cost < 0.1 * s.initial_cost


def test_dense_cholesky_device_vs_host():
    """DENSE_NORMAL_CHOLESKY on device equals numpy lstsq (the direct
    analog of cuda_dense_cholesky_test.cc)."""
    from ceres_tpu.linear.dense import solve_dense_normal_cholesky
    from ceres_tpu.models import bal
    from ceres_tpu.evaluator import _full_impl

    prob = bal.synthesize_bal(num_cameras=4, num_points=60,
                              num_observations=300, seed=3)
    problem, _, _ = bal.build_problem(prob)
    program = problem.program()
    x0 = program.initial_ambient()
    _, _, ctx = jax.jit(
        lambda x: _full_impl(x, program.families, True,
                             program.num_tangent, program.jnp_bd_groups())
    )(x0)
    D = 1e-3 * jnp.ones((program.num_tangent,), x0.dtype)
    y = solve_dense_normal_cholesky(ctx, D)
    J = np.asarray(ctx.to_dense())
    g = np.asarray(ctx.gradient())
    H = J.T @ J + np.diag(np.asarray(D) ** 2)
    ref = np.linalg.solve(H, g)
    # Device accuracy bound: the axon backend emulates f64 matmuls in
    # double-word f32 arithmetic, so the factor/solve lands at ~1e-5
    # absolute on this (moderately conditioned, D=1e-3-damped) system —
    # tight f64 agreement is a CPU-only property. The CUDA reference
    # tests use analogous device-specific bounds
    # (cuda_dense_cholesky_test.cc).
    if jax.default_backend() == "cpu":
        np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=1e-6)
    else:
        np.testing.assert_allclose(np.asarray(y), ref, rtol=5e-2, atol=5e-5)
