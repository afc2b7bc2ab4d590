"""ctypes bindings for the native runtime core (native/ceres_tpu_core.cpp).

The C++ core hosts the preprocessor-phase graph algorithms and problem IO
— the parts of the reference that are latency-critical host code, not
XLA compute: Schur elimination ordering
(parameter_block_ordering.cc), independent-set coloring
(coordinate_descent_minimizer.cc), single-linkage camera clustering
(single_linkage_clustering.cc), and BAL file loading
(examples/bal_problem.cc). Falls back to the pure-Python
implementations when the shared library cannot be built.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_REPO = Path(__file__).resolve().parents[2]
_SRC = _REPO / "native" / "ceres_tpu_core.cpp"
_LIB = _REPO / "native" / "libceres_tpu_core.so"

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-std=c++17",
                "-shared",
                "-fPIC",
                "-o",
                str(_LIB),
                str(_SRC),
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native core; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None

    i64 = ctypes.c_int64
    p_i64 = ctypes.POINTER(ctypes.c_int64)
    p_i32 = ctypes.POINTER(ctypes.c_int32)
    p_f64 = ctypes.POINTER(ctypes.c_double)

    lib.bal_read_header.argtypes = [ctypes.c_char_p, p_i64, p_i64, p_i64]
    lib.bal_read_header.restype = ctypes.c_int
    lib.bal_read_body.argtypes = [
        ctypes.c_char_p,
        p_i64,
        p_i64,
        p_f64,
        p_f64,
        p_f64,
    ]
    lib.bal_read_body.restype = ctypes.c_int
    lib.schur_ordering.argtypes = [i64, p_i32, i64, i64, p_i32, p_i32]
    lib.schur_ordering.restype = i64
    lib.independent_set_coloring.argtypes = [i64, p_i32, i64, i64, p_i32, p_i32]
    lib.independent_set_coloring.restype = i64
    lib.single_linkage_cluster.argtypes = [
        i64,
        i64,
        i64,
        p_i32,
        p_i32,
        ctypes.c_double,
        p_i32,
    ]
    lib.single_linkage_cluster.restype = i64
    lib.canonical_views_cluster.argtypes = [
        i64,
        i64,
        i64,
        p_i32,
        p_i32,
        i64,
        ctypes.c_double,
        ctypes.c_double,
        p_i32,
    ]
    lib.canonical_views_cluster.restype = i64
    lib.max_weight_linear_forest.argtypes = [
        i64,
        i64,
        i64,
        p_i32,
        p_i32,
        p_i32,
        p_i32,
    ]
    lib.max_weight_linear_forest.restype = i64
    lib.mindeg_order.argtypes = [i64, p_i64, p_i32, p_i32]
    lib.mindeg_order.restype = ctypes.c_int
    lib.sparse_chol_analyze.argtypes = [i64, p_i64, p_i32, p_i32, p_i32, p_i64]
    lib.sparse_chol_analyze.restype = i64
    lib.sparse_chol_factorize.argtypes = [
        i64, p_i64, p_i32, p_f64, p_i32, p_i64, p_i32, p_f64,
    ]
    lib.sparse_chol_factorize.restype = i64
    lib.sparse_chol_solve.argtypes = [
        i64, p_i64, p_i32, p_f64, p_i32, i64, p_f64, p_f64,
    ]
    lib.sparse_chol_solve.restype = ctypes.c_int
    lib.sparse_chol_symbolic_new.argtypes = [
        i64, p_i64, p_i32, p_i32, p_i32, p_i64,
    ]
    lib.sparse_chol_symbolic_new.restype = ctypes.c_void_p
    lib.sparse_chol_symbolic_nnz.argtypes = [ctypes.c_void_p]
    lib.sparse_chol_symbolic_nnz.restype = i64
    lib.sparse_chol_symbolic_free.argtypes = [ctypes.c_void_p]
    lib.sparse_chol_symbolic_free.restype = None
    lib.sparse_chol_refactorize.argtypes = [
        ctypes.c_void_p, p_f64, p_i32, p_f64,
    ]
    lib.sparse_chol_refactorize.restype = i64
    p_f32 = ctypes.POINTER(ctypes.c_float)
    lib.sparse_chol_refactorize_f32.argtypes = [
        ctypes.c_void_p, p_f32, p_i32, p_f32,
    ]
    lib.sparse_chol_refactorize_f32.restype = i64
    lib.sparse_chol_solve_f32.argtypes = [
        i64, p_i64, p_i32, p_f32, p_i32, i64, p_f32, p_f32,
    ]
    lib.sparse_chol_solve_f32.restype = ctypes.c_int
    _lib = lib
    return _lib


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def bal_load(path: str):
    """Fast BAL load; returns (cameras, points, cam_idx, pt_idx, obs) or
    None if the native core is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    C = ctypes.c_int64()
    P = ctypes.c_int64()
    O = ctypes.c_int64()
    rc = lib.bal_read_header(
        str(path).encode(), ctypes.byref(C), ctypes.byref(P), ctypes.byref(O)
    )
    if rc != 0:
        raise ValueError(f"{path}: not a BAL file (native rc={rc})")
    C, P, O = C.value, P.value, O.value
    cam_idx = np.empty(O, dtype=np.int64)
    pt_idx = np.empty(O, dtype=np.int64)
    obs = np.empty((O, 2), dtype=np.float64)
    cameras = np.empty((C, 9), dtype=np.float64)
    points = np.empty((P, 3), dtype=np.float64)
    rc = lib.bal_read_body(
        str(path).encode(),
        cam_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        pt_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        obs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cameras.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise ValueError(f"{path}: truncated BAL file (native rc={rc})")
    return cameras, points, cam_idx, pt_idx, obs


def schur_ordering(program) -> Optional[list]:
    """Native greedy MIS ordering; None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(program._problem._param_blocks)
    tsize = np.full(n, -1, dtype=np.int32)
    for rec in program.blocks:
        if not rec.constant:
            tsize[rec.pid] = rec.tangent_size
    cols_list = []
    for fam in program.families:
        ids = np.asarray(fam.block_ids, dtype=np.int32)
        cols_list.append(ids)
    if not cols_list:
        return []
    k = max(c.shape[1] for c in cols_list)
    padded = [
        np.pad(c, ((0, 0), (0, k - c.shape[1])), constant_values=-1)
        for c in cols_list
    ]
    allcols = np.ascontiguousarray(np.concatenate(padded, axis=0))
    out = np.empty(n, dtype=np.int32)
    cnt = lib.schur_ordering(
        n, _i32p(tsize), allcols.shape[0], k, _i32p(allcols), _i32p(out)
    )
    return [int(v) for v in out[:cnt]]


def independent_sets(program) -> Optional[list]:
    """Native greedy coloring; returns list of lists of pids or None."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(program._problem._param_blocks)
    tsize = np.full(n, -1, dtype=np.int32)
    for rec in program.blocks:
        if not rec.constant:
            tsize[rec.pid] = rec.tangent_size
    cols_list = [
        np.asarray(f.block_ids, dtype=np.int32) for f in program.families
    ]
    if not cols_list:
        return []
    k = max(c.shape[1] for c in cols_list)
    padded = [
        np.pad(c, ((0, 0), (0, k - c.shape[1])), constant_values=-1)
        for c in cols_list
    ]
    allcols = np.ascontiguousarray(np.concatenate(padded, axis=0))
    color = np.empty(n, dtype=np.int32)
    nc = lib.independent_set_coloring(
        n, _i32p(tsize), allcols.shape[0], k, _i32p(allcols), _i32p(color)
    )
    sets = [[] for _ in range(nc)]
    for pid in range(n):
        if color[pid] >= 0 and tsize[pid] >= 0:
            sets[color[pid]].append(pid)
    sets.sort(key=len, reverse=True)
    return sets


def camera_clusters(
    num_cameras: int,
    num_points: int,
    camera_index: np.ndarray,
    point_index: np.ndarray,
    threshold: float = 0.1,
):
    """Single-linkage visibility clustering of cameras; None if native
    core unavailable (single_linkage_clustering.h:58)."""
    lib = get_lib()
    if lib is None:
        return None
    ci = np.ascontiguousarray(camera_index, dtype=np.int32)
    pi = np.ascontiguousarray(point_index, dtype=np.int32)
    cluster = np.empty(num_cameras, dtype=np.int32)
    nc = lib.single_linkage_cluster(
        num_cameras,
        num_points,
        ci.shape[0],
        _i32p(ci),
        _i32p(pi),
        threshold,
        _i32p(cluster),
    )
    return int(nc), cluster


def canonical_views_clusters(
    num_cameras: int,
    num_points: int,
    camera_index: np.ndarray,
    point_index: np.ndarray,
    min_views: int = 3,
    size_penalty_weight: float = 3.0,
    similarity_penalty_weight: float = 0.0,
):
    """Canonical-views clustering of cameras
    (canonical_views_clustering.h:98; weights are the
    visibility_based_preconditioner.cc kCanonicalViews* defaults);
    None if native core unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    ci = np.ascontiguousarray(camera_index, dtype=np.int32)
    pi = np.ascontiguousarray(point_index, dtype=np.int32)
    cluster = np.empty(num_cameras, dtype=np.int32)
    nc = lib.canonical_views_cluster(
        num_cameras,
        num_points,
        ci.shape[0],
        _i32p(ci),
        _i32p(pi),
        int(min_views),
        size_penalty_weight,
        similarity_penalty_weight,
        _i32p(cluster),
    )
    return int(nc), cluster


def cluster_linear_forest(
    num_clusters: int,
    num_points: int,
    cluster_index: np.ndarray,
    point_index: np.ndarray,
):
    """Maximum-weight linear forest (degree-<=2 spanning paths) over the
    cluster visibility graph — the edge set of the CLUSTER_TRIDIAGONAL
    preconditioner (visibility_based_preconditioner.h:127). Returns
    (edge_a, edge_b) int32 arrays, or None if native core unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    ci = np.ascontiguousarray(cluster_index, dtype=np.int32)
    pi = np.ascontiguousarray(point_index, dtype=np.int32)
    cap = max(int(num_clusters) - 1, 1)
    ea = np.empty(cap, dtype=np.int32)
    eb = np.empty(cap, dtype=np.int32)
    ne = lib.max_weight_linear_forest(
        num_clusters,
        num_points,
        ci.shape[0],
        _i32p(ci),
        _i32p(pi),
        _i32p(ea),
        _i32p(eb),
    )
    return ea[: int(ne)].copy(), eb[: int(ne)].copy()
