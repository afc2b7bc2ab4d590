"""Dense linear solvers: QR and normal-equations Cholesky.

TPU-native analog of ``internal/ceres/dense_qr_solver.{h,cc}`` /
``dense_qr.h:62-152`` and ``dense_normal_cholesky_solver.{h,cc}`` /
``dense_cholesky.h:58-246``. The reference dispatches to
Eigen/LAPACK/cuSOLVER; here both paths are single XLA computations
(``jnp.linalg``) so they fuse with the Jacobian materialization and run on
device. Used for small/medium dense problems (NIST, curve fitting) and the
reduced camera system of DENSE_SCHUR.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ceres_tpu.evaluator import JacobianContext


def solve_dense_normal_cholesky(
    ctx: JacobianContext, D: jax.Array
) -> jax.Array:
    """Solve (J'J + D'D) y = J'f via Cholesky.

    Analog of DenseNormalCholeskySolver (dense_normal_cholesky_solver.cc):
    forms the normal equations (the reference uses small_blas GEMM; here one
    MXU matmul) and factorizes.
    """
    J = ctx.to_dense()
    f = ctx.residual_vector()
    lhs = J.T @ J + jnp.diag(D * D)
    rhs = J.T @ f
    chol, lower = jax.scipy.linalg.cho_factor(lhs, lower=True)
    return jax.scipy.linalg.cho_solve((chol, lower), rhs)


def solve_dense_qr(ctx: JacobianContext, D: jax.Array) -> jax.Array:
    """Solve min ||J y - f||^2 + ||D y||^2 via QR of the stacked system.

    Analog of DenseQRSolver (dense_qr_solver.cc): appends the diagonal D as
    extra rows [J; diag(D)] with zero rhs rows, then QR + triangular solve.
    More numerically robust than the normal equations (used by the NIST
    experiments, examples/nist.cc).
    """
    J = ctx.to_dense()
    f = ctx.residual_vector()
    n = J.shape[1]
    A = jnp.concatenate([J, jnp.diag(D)], axis=0)
    b = jnp.concatenate([f, jnp.zeros((n,), dtype=f.dtype)])
    Q, R = jnp.linalg.qr(A, mode="reduced")
    rhs = Q.T @ b
    return jax.scipy.linalg.solve_triangular(R, rhs, lower=False)
