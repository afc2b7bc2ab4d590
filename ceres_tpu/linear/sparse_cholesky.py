"""Sparse direct factorization backend (host CPU, native core).

TPU-native counterpart of the reference's sparse direct stack:
``sparse_cholesky.h:71-112`` (the Factorize-once/Solve-many interface),
``suitesparse.h:306`` (CHOLMOD wrapper) and the AMD fill-reducing
ordering applied in ``reorder_program.cc``. The device evaluates the
block Jacobian; the normal equations are assembled and factorized on
the host (where a sequential elimination is the right machine for the
job), invoked from inside the jitted step via ``jax.pure_callback``.
Symbolic analysis is cached per sparsity pattern, so repeated LM
iterations pay only the numeric refactorization — the same
analyze-once/refactor-many split CHOLMOD gives the reference.

SPARSE_NORMAL_CHOLESKY solves (J'J + D^2) y = rhs exactly;
``dynamic_sparsity`` (solver.h:365-383) drops numerically-zero entries
and re-analyzes every iteration.
"""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

from ceres_tpu.linear.cg import CG_FAILURE, CG_FATAL_ERROR, CG_SUCCESS
from ceres_tpu.utils import native


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _f64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class SparseCholesky:
    """Simplicial LL' of a sparse SPD matrix with minimum-degree
    ordering (sparse_cholesky.h:71-112 analog).

    ``Ap``/``Ai`` describe the UPPER-triangular CSC pattern (diagonal
    present, rows sorted). ``factorize(Ax)`` may be called repeatedly
    with new values on the same pattern.
    """

    def __init__(self, n: int, Ap: np.ndarray, Ai: np.ndarray,
                 ordering: str = "AMD"):
        lib = native.get_lib()
        if lib is None:
            raise RuntimeError("native core unavailable")
        self._lib = lib
        self.n = int(n)
        self.Ap = np.ascontiguousarray(Ap, dtype=np.int64)
        self.Ai = np.ascontiguousarray(Ai, dtype=np.int32)
        self.perm = np.empty(self.n, dtype=np.int32)
        if ordering == "AMD" and self.n > 0:
            rc = lib.mindeg_order(
                self.n, _i64p(self.Ap), _i32p(self.Ai), _i32p(self.perm)
            )
            if rc != 0:
                raise RuntimeError("mindeg_order failed")
        else:  # NATURAL
            self.perm = np.arange(self.n, dtype=np.int32)
        self.parent = np.empty(self.n, dtype=np.int32)
        self.Lp = np.empty(self.n + 1, dtype=np.int64)
        nnz = lib.sparse_chol_analyze(
            self.n, _i64p(self.Ap), _i32p(self.Ai), _i32p(self.perm),
            _i32p(self.parent), _i64p(self.Lp),
        )
        if nnz < 0:
            raise RuntimeError("sparse_chol_analyze failed")
        self.nnz_L = int(nnz)
        self.Li = np.empty(self.nnz_L, dtype=np.int32)
        self.Lx = np.empty(self.nnz_L, dtype=np.float64)
        self._factorized = False

    def factorize(self, Ax: np.ndarray) -> int:
        """Numeric refactorization. Returns 0 on success, k>0 when the
        pivot at (permuted) column k-1 is non-positive."""
        Ax = np.ascontiguousarray(Ax, dtype=np.float64)
        rc = self._lib.sparse_chol_factorize(
            self.n, _i64p(self.Ap), _i32p(self.Ai), _f64p(Ax),
            _i32p(self.perm), _i64p(self.Lp), _i32p(self.Li),
            _f64p(self.Lx),
        )
        self._factorized = rc == 0
        return int(rc)

    def solve(self, b: np.ndarray) -> np.ndarray:
        """Solve A x = b (b: (n,) or (k, n))."""
        if not self._factorized:
            raise RuntimeError("factorize() has not succeeded")
        b2 = np.ascontiguousarray(
            np.atleast_2d(np.asarray(b, dtype=np.float64))
        )
        x = np.empty_like(b2)
        self._lib.sparse_chol_solve(
            self.n, _i64p(self.Lp), _i32p(self.Li), _f64p(self.Lx),
            _i32p(self.perm), b2.shape[0], _f64p(b2), _f64p(x),
        )
        return x[0] if np.ndim(b) == 1 else x


# ---------------------------------------------------------------------------
# SPARSE_NORMAL_CHOLESKY host path
# ---------------------------------------------------------------------------

# pattern-key -> SparseCholesky (symbolic + workspace reuse across LM
# iterations; the pattern of J'J is fixed for a given Program).
_SYMBOLIC_CACHE: dict = {}
_CACHE_CAP = 32


def _assemble_normal_eqs(nt, dynamic, D, args):
    """Host: scipy CSC upper triangle of J'J + diag(D^2) from the
    per-family (tangent_idx, jac) pairs (crs_matrix.h-style assembly
    from block Jacobians, without densification)."""
    import scipy.sparse as sp

    rows_l, cols_l, vals_l = [], [], []
    row0 = 0
    for tj, Jj in args:
        tj = np.asarray(tj)
        Jj = np.asarray(Jj, dtype=np.float64)
        B, r, T = Jj.shape
        rows_f = row0 + np.arange(B * r).reshape(B, r)
        keep = tj < nt  # constant-block dummy columns
        rr = np.broadcast_to(rows_f[:, :, None], (B, r, T))
        cc = np.broadcast_to(tj[:, None, :], (B, r, T))
        kk = np.broadcast_to(keep[:, None, :], (B, r, T))
        rows_l.append(rr[kk])
        cols_l.append(cc[kk])
        vals_l.append(Jj[kk])
        row0 += B * r
    J = sp.csr_matrix(
        (
            np.concatenate(vals_l),
            (np.concatenate(rows_l), np.concatenate(cols_l)),
        ),
        shape=(row0, nt),
    )
    if dynamic:
        J.eliminate_zeros()
    H = (J.T @ J).tocsc()
    H = (H + sp.diags(np.asarray(D, dtype=np.float64) ** 2)).tocsc()
    H = sp.triu(H, format="csc")
    H.sort_indices()
    return H


def host_sparse_normal_solve(
    nt: int,
    dynamic: bool,
    D: np.ndarray,
    rhs: np.ndarray,
    args,
) -> Tuple[np.ndarray, np.int32, np.int32]:
    """Assemble + factorize + solve on the host. Returns
    (y, iterations, termination-code)."""
    H = _assemble_normal_eqs(nt, dynamic, D, args)
    y = np.zeros(nt, dtype=np.float64)
    try:
        key = (
            H.shape[0],
            hash(H.indptr.tobytes()),
            hash(H.indices.tobytes()),
        )
        chol = _SYMBOLIC_CACHE.get(key)
        if chol is None:
            chol = SparseCholesky(H.shape[0], H.indptr, H.indices)
            if len(_SYMBOLIC_CACHE) >= _CACHE_CAP:
                _SYMBOLIC_CACHE.clear()
            _SYMBOLIC_CACHE[key] = chol
        rc = chol.factorize(H.data)
        if rc != 0:
            return y, np.int32(1), np.int32(CG_FAILURE)
        y = chol.solve(np.asarray(rhs, dtype=np.float64))
    except RuntimeError:
        # Native core unavailable: SuperLU fallback keeps the option
        # usable (reference's Eigen fallback when CHOLMOD is absent).
        import scipy.sparse.linalg as spla
        import scipy.sparse as sp

        Hfull = H + sp.triu(H, k=1, format="csc").T
        y = spla.spsolve(Hfull.tocsc(), np.asarray(rhs, dtype=np.float64))
    if not np.all(np.isfinite(y)):
        return np.zeros(nt, dtype=np.float64), np.int32(1), np.int32(
            CG_FATAL_ERROR
        )
    return y, np.int32(1), np.int32(CG_SUCCESS)


def solve_sparse_normal_cholesky(ctx, D, rhs=None, dynamic=False):
    """jit-safe SPARSE_NORMAL_CHOLESKY: device block Jacobian ->
    host assembly + native simplicial Cholesky -> device step.
    Returns (y, lin_iters, termination) matching _base_linear_solve."""
    import jax
    import jax.numpy as jnp

    nt = ctx.num_tangent
    rhs_arr = ctx.gradient() if rhs is None else rhs
    flat = []
    for fi, fam in enumerate(ctx.families):
        for j in range(fam.num_args):
            flat.append(fam.tangent_idx[j])
            flat.append(ctx.jacs[fi][j])

    def _host(D_h, rhs_h, *flat_h):
        pairs = [
            (flat_h[i], flat_h[i + 1]) for i in range(0, len(flat_h), 2)
        ]
        return host_sparse_normal_solve(nt, dynamic, D_h, rhs_h, pairs)

    out_dtype = rhs_arr.dtype
    y64, iters, term = jax.pure_callback(
        _host,
        (
            jax.ShapeDtypeStruct((nt,), jnp.float64),
            jax.ShapeDtypeStruct((), jnp.int32),
            jax.ShapeDtypeStruct((), jnp.int32),
        ),
        D,
        rhs_arr,
        *flat,
        vmap_method="sequential",
    )
    return y64.astype(out_dtype), iters, term
