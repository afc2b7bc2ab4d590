"""Schur-complement solvers for bundle-adjustment-structured problems.

TPU-native analog of the reference's Schur stack:
``schur_eliminator.h:52-216`` / ``schur_eliminator_impl.h`` (chunked
elimination of e-blocks), ``implicit_schur_complement.{h,cc}:75-145``
(matrix-free S·x), ``iterative_schur_complement_solver.cc:64-155`` (PCG on
the reduced camera system), ``schur_complement_solver.{h,cc}`` (dense
Schur), ``schur_jacobi_preconditioner.h:78`` and
``power_series_expansion_preconditioner.h:44``.

Design: the elimination ordering (e-blocks = points) is found by a greedy
maximal independent set over the block-sharing graph
(parameter_block_ordering.h:74-82). Everything else is expressed as
batched gathers + segment scatter-adds over the residual families:

    S x = (F'F + D_f^2) x - F'E (E'E + D_e^2)^{-1} E'F x

is four family-sized einsum passes plus one batched (Te,Te) Cholesky —
no per-chunk loop, no locks (the reference's rhs_locks_,
schur_eliminator.h:345-358, disappear because the scatter-add is one XLA
op). The dense S for DENSE_SCHUR is vmap(S·e_i) over identity columns:
one big batched MXU computation instead of 43 generated specializations.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ceres_tpu.evaluator import JacobianContext
from ceres_tpu.linear.cg import CGResult, conjugate_gradients
from ceres_tpu.types import LinearSolverType, PreconditionerType


# ---------------------------------------------------------------------------
# Elimination ordering
# ---------------------------------------------------------------------------


def compute_schur_ordering(program) -> List[int]:
    """Greedy maximal independent set of parameter blocks -> e-block pids.

    Analog of ComputeStableSchurOrdering (parameter_block_ordering.cc):
    e-blocks must not share a residual block with each other. Visiting
    blocks with the smallest tangent size first makes BA problems pick the
    points (3) over the cameras (9). Dispatches to the native C++ core
    (native/ceres_tpu_core.cpp schur_ordering) when available.
    """
    from ceres_tpu.utils import native

    nat = native.schur_ordering(program)
    if nat is not None:
        return nat
    # block -> list of (family_idx, instance) occurrences
    occurrences: Dict[int, List[Tuple[int, int]]] = {}
    for fi, fam in enumerate(program.families):
        for j in range(fam.block_ids.shape[1]):
            for i, pid in enumerate(fam.block_ids[:, j]):
                occurrences.setdefault(int(pid), []).append((fi, i))

    active = {
        rec.pid: rec for rec in program.blocks if not rec.constant
    }
    order = sorted(
        active.keys(),
        key=lambda pid: (active[pid].tangent_size, -len(occurrences.get(pid, []))),
    )
    instance_blocked: Dict[Tuple[int, int], bool] = {}
    e_blocks: List[int] = []
    for pid in order:
        occs = occurrences.get(pid, [])
        if any(instance_blocked.get(o, False) for o in occs):
            continue
        e_blocks.append(pid)
        for o in occs:
            instance_blocked[o] = True
    return e_blocks


@dataclasses.dataclass
class SchurStructure:
    """Index structure for Schur elimination (host-built once).

    Registered as a pytree and passed through jit as an ARGUMENT, never
    captured in closures: embedding these (P,Te)/(B,) index arrays as HLO
    literal constants makes TPU compilation of large problems
    pathologically slow."""

    num_points: int
    e_tangent_size: int
    e_group: jax.Array  # (P, Te) tangent indices of e-blocks
    f_mask: jax.Array  # (num_tangent,) 1.0 on f coords, 0.0 on e coords
    f_idx: jax.Array  # (nf,) tangent indices of f coords
    # Per family: which arg is the e-block (or -1), and per-instance point
    # index (P = dropped/dummy for non-e or constant).
    e_arg: Tuple[int, ...]
    e_pos: Tuple[Optional[jax.Array], ...]  # (B,) int32 per family
    # f block-diagonal groups for SCHUR_JACOBI: {T: (G,T) idx}, plus per
    # family/arg positions and validity.
    f_groups: Dict[int, jax.Array]
    f_pos: Tuple[Tuple[Optional[jax.Array], ...], ...]  # [fam][arg] -> (B,)
    # Visibility clusters of f-blocks for CLUSTER_JACOBI/_TRIDIAGONAL
    # (single-linkage over shared e-blocks): (C, m) tangent coordinate
    # index matrix padded with num_tangent, or None.
    cluster_groups: Optional[jax.Array] = None
    # Segment-reduction plans (ceres_tpu.ops.reduce): per family for the
    # point (e) reductions, per family/arg for the camera (f) block
    # reductions — the scatter-free analog of the eliminator's per-chunk
    # accumulation (schur_eliminator_impl.h:228-330).
    e_plan: Optional[Tuple] = None
    f_plan: Optional[Tuple] = None
    # One-pass explicit assembly plan (schur_explicit.ExplicitSchurPlan),
    # built on demand for DENSE/SPARSE_SCHUR, explicit-S ITERATIVE_SCHUR
    # and Schur-marginal covariance.
    explicit: Optional[object] = None


jax.tree_util.register_dataclass(
    SchurStructure,
    data_fields=[
        "e_group", "f_mask", "f_idx", "e_pos", "f_groups", "f_pos",
        "cluster_groups", "e_plan", "f_plan", "explicit",
    ],
    meta_fields=["num_points", "e_tangent_size", "e_arg"],
)


def build_schur_structure(
    program,
    ordering: Optional[List[int]] = None,
    with_clusters: bool = False,
    cluster_threshold: float = 0.1,
    with_explicit: bool = False,
) -> SchurStructure:
    """Build the index structure; ordering overrides the automatic one
    (the user elimination-group hint, include/ceres/ordered_groups.h).
    ``with_clusters`` additionally computes visibility clusters of the
    f-blocks (single_linkage_clustering.h:58) for the clustered
    preconditioners."""
    if ordering is None:
        e_pids = compute_schur_ordering(program)
    else:
        e_pids = [int(p) for p in ordering]
    if not e_pids:
        raise ValueError("no e-blocks found for Schur elimination")

    pblocks = {rec.pid: rec for rec in program.blocks}
    # Uniform e tangent size: keep the majority size.
    sizes = {}
    for pid in e_pids:
        sizes.setdefault(pblocks[pid].tangent_size, []).append(pid)
    Te, e_pids = max(sizes.items(), key=lambda kv: len(kv[1]))
    e_set = set(e_pids)

    point_index = {pid: i for i, pid in enumerate(e_pids)}
    P = len(e_pids)
    e_group = np.empty((P, Te), dtype=np.int32)
    for pid, i in point_index.items():
        off = program.tangent_offset[pid]
        e_group[i] = np.arange(off, off + Te, dtype=np.int32)

    eval_dtype = getattr(program, "eval_dtype", np.float64)
    f_mask = np.ones(program.num_tangent, dtype=eval_dtype)
    f_mask[e_group.reshape(-1)] = 0.0
    f_idx = np.nonzero(f_mask > 0)[0].astype(np.int32)

    # f block-diagonal groups (f blocks only).
    f_rows: Dict[int, List[np.ndarray]] = {}
    f_pos_of_pid: Dict[int, Tuple[int, int]] = {}
    for rec in program.blocks:
        if rec.constant or rec.pid in e_set:
            continue
        T = rec.tangent_size
        off = program.tangent_offset[rec.pid]
        rows = f_rows.setdefault(T, [])
        f_pos_of_pid[rec.pid] = (T, len(rows))
        rows.append(np.arange(off, off + T, dtype=np.int32))
    f_groups = {T: jnp.asarray(np.stack(rows)) for T, rows in f_rows.items()}
    f_group_sizes = {T: len(rows) for T, rows in f_rows.items()}

    const_set = {rec.pid for rec in program.blocks if rec.constant}
    e_arg: List[int] = []
    e_pos: List[Optional[jax.Array]] = []
    f_pos: List[Tuple[Optional[jax.Array], ...]] = []
    for fam in program.families:
        ea = -1
        ep = None
        for j in range(fam.block_ids.shape[1]):
            col = fam.block_ids[:, j]
            in_e = np.asarray([int(p) in e_set for p in col])
            is_const = np.asarray([int(p) in const_set for p in col])
            if in_e.any():
                # Constant blocks are variable-free: they may share an
                # e-column (their contributions drop at the dummy index).
                if not np.all(in_e | is_const):
                    raise ValueError(
                        "mixed e/f blocks in one family argument position; "
                        "regroup the problem or provide an explicit ordering"
                    )
                if ea != -1:
                    raise ValueError(
                        "two e-blocks in one residual block — invalid "
                        "elimination ordering (schur_eliminator.h:143)"
                    )
                ea = j
                ep = jnp.asarray(
                    np.asarray(
                        [point_index.get(int(p), P) for p in col],
                        dtype=np.int32,
                    )
                )
        e_arg.append(ea)
        e_pos.append(ep)

        fp: List[Optional[jax.Array]] = []
        for j in range(fam.block_ids.shape[1]):
            if j == ea:
                fp.append(None)
                continue
            col = fam.block_ids[:, j]
            T = fam.structure.tangent_sizes[j]
            dummy = f_group_sizes.get(T, 0)
            pos = np.asarray(
                [
                    f_pos_of_pid.get(int(p), (T, dummy))[1]
                    if int(p) in f_pos_of_pid
                    else dummy
                    for p in col
                ],
                dtype=np.int32,
            )
            fp.append(jnp.asarray(pos))
        f_pos.append(tuple(fp))

    cluster_groups = None
    if with_clusters:
        cluster_groups = _build_cluster_groups(
            program, e_set, point_index, f_pos_of_pid, cluster_threshold
        )

    # Scatter-free reduction plans (one-hot matmul / ELL gather+sum).
    from ceres_tpu.ops.reduce import build_reduce_plan

    e_plan = tuple(
        build_reduce_plan(np.asarray(ep), P) if ep is not None else None
        for ep in e_pos
    )
    f_plan = []
    for fi, fam in enumerate(program.families):
        plans = []
        for j in range(fam.block_ids.shape[1]):
            fp = f_pos[fi][j]
            if fp is None:
                plans.append(None)
            else:
                T = fam.structure.tangent_sizes[j]
                plans.append(
                    build_reduce_plan(
                        np.asarray(fp), f_group_sizes.get(T, 0)
                    )
                )
        f_plan.append(tuple(plans))

    ss = SchurStructure(
        num_points=P,
        e_tangent_size=Te,
        e_group=jnp.asarray(e_group),
        f_mask=jnp.asarray(f_mask),
        f_idx=jnp.asarray(f_idx),
        e_arg=tuple(e_arg),
        e_pos=tuple(e_pos),
        f_groups=f_groups,
        f_pos=tuple(f_pos),
        cluster_groups=cluster_groups,
        e_plan=e_plan,
        f_plan=tuple(f_plan),
    )
    if with_explicit:
        from ceres_tpu.linear.schur_explicit import build_explicit_plan

        ss.explicit = build_explicit_plan(program, ss)
    return ss


def ensure_explicit_plan(program, ss: SchurStructure) -> SchurStructure:
    """Attach the one-pass assembly plan to ``ss`` if missing."""
    if ss.explicit is None:
        from ceres_tpu.linear.schur_explicit import build_explicit_plan

        ss.explicit = build_explicit_plan(program, ss)
    return ss


def _build_cluster_groups(
    program, e_set, point_index, f_pos_of_pid, threshold
):
    """Single-linkage visibility clusters of f-blocks -> padded (C, m)
    tangent coordinate matrix (canonical_views/single_linkage analog of
    visibility_based_preconditioner.cc, via the native core)."""
    from ceres_tpu.utils import native

    f_pids = sorted(f_pos_of_pid.keys())
    cam_dense = {pid: i for i, pid in enumerate(f_pids)}
    cam_idx, pt_idx = [], []
    for fam in program.families:
        ids = np.asarray(fam.block_ids)
        e_cols = [
            j
            for j in range(ids.shape[1])
            if int(ids[0, j]) in e_set
        ]
        if not e_cols:
            continue
        ej = e_cols[0]
        for j in range(ids.shape[1]):
            if j == ej:
                continue
            for b in range(ids.shape[0]):
                pid = int(ids[b, j])
                if pid in cam_dense:
                    cam_idx.append(cam_dense[pid])
                    pt_idx.append(point_index.get(int(ids[b, ej]), 0))
    if not cam_idx:
        return None
    out = native.camera_clusters(
        len(f_pids),
        max(pt_idx) + 1,
        np.asarray(cam_idx, dtype=np.int64),
        np.asarray(pt_idx, dtype=np.int64),
        threshold=threshold,
    )
    if out is None:
        # native core unavailable: every f-block is its own cluster
        # (degenerates to SCHUR_JACOBI semantics)
        nclusters, cluster = len(f_pids), np.arange(len(f_pids))
    else:
        nclusters, cluster = out
    # gather tangent coords per cluster, pad with num_tangent (dummy)
    pblocks = {rec.pid: rec for rec in program.blocks}
    members = [[] for _ in range(nclusters)]
    for pid in f_pids:
        members[cluster[cam_dense[pid]]].append(pid)
    rows = []
    for pids in members:
        coords = []
        for pid in pids:
            off = program.tangent_offset[pid]
            coords.extend(range(off, off + pblocks[pid].tangent_size))
        rows.append(coords)
    m = max(len(r) for r in rows)
    mat = np.full((nclusters, m), program.num_tangent, dtype=np.int32)
    for i, r in enumerate(rows):
        mat[i, : len(r)] = r
    return jnp.asarray(mat)


# ---------------------------------------------------------------------------
# Implicit Schur operators (implicit_schur_complement.cc:49-230)
# ---------------------------------------------------------------------------


class SchurOperator:
    """Bundle of Schur-space linear maps for one (ctx, D) pair.

    Vectors live in full tangent length; e coords are kept at zero for
    f-space vectors. One instance per LM solve (factors the (Te,Te)
    point blocks once, implicit_schur_complement.cc:49 Init).
    """

    def __init__(self, ctx: JacobianContext, D: jax.Array, ss: SchurStructure):
        self.ctx = ctx
        self.ss = ss
        self.D = D
        Te, P = ss.e_tangent_size, ss.num_points

        # Assemble E'E + D_e^2 per point: (P, Te, Te), batched Cholesky.
        dt = ctx.residuals[0].dtype
        self.dtype = dt
        ete = jnp.zeros((P, Te, Te), dtype=dt)
        for fi, fam in enumerate(ctx.families):
            ea = ss.e_arg[fi]
            if ea < 0:
                continue
            E = ctx.jacs[fi][ea]  # (B, r, Te)
            contrib = jnp.einsum("bri,brj->bij", E, E)
            ete = ete + self._reduce_e(fi, contrib)
        De = D[ss.e_group]  # (P, Te)
        ete = ete + jax.vmap(jnp.diag)(De * De)
        self._ete_chol = jax.vmap(
            lambda m: jax.scipy.linalg.cho_factor(m, lower=True)[0]
        )(ete)

    def _reduce_e(self, fi: int, contrib: jax.Array) -> jax.Array:
        """Sum per-instance contributions into per-point slots (P, ...):
        plan-based when available, scatter-add fallback."""
        ss = self.ss
        if ss.e_plan is not None and ss.e_plan[fi] is not None:
            from ceres_tpu.ops.reduce import apply_reduce

            return apply_reduce(ss.e_plan[fi], contrib)[: ss.num_points]
        out = jnp.zeros(
            (ss.num_points,) + contrib.shape[1:], dtype=contrib.dtype
        )
        return out.at[ss.e_pos[fi]].add(contrib, mode="drop")

    # -- primitive products -------------------------------------------------

    def _edot(self, w: Tuple[jax.Array, ...]) -> jax.Array:
        """E' w aggregated per point -> (P, Te)."""
        ss, ctx = self.ss, self.ctx
        t = jnp.zeros(
            (ss.num_points, ss.e_tangent_size), dtype=self.dtype
        )
        for fi, fam in enumerate(ctx.families):
            ea = ss.e_arg[fi]
            if ea < 0:
                continue
            E = ctx.jacs[fi][ea]
            t = t + self._reduce_e(
                fi, jnp.einsum("bri,br->bi", E, w[fi])
            )
        return t

    def _solve_ete(self, t: jax.Array) -> jax.Array:
        """(E'E + D_e^2)^{-1} t, batched (P, Te)."""
        return jax.vmap(lambda c, b: jax.scipy.linalg.cho_solve((c, True), b))(
            self._ete_chol, t
        )

    def _embed_e(self, u: jax.Array) -> jax.Array:
        """(P, Te) point vector -> full tangent vector (zero on f)."""
        z = jnp.zeros((self.ctx.num_tangent,), dtype=self.dtype)
        return z.at[self.ss.e_group].set(u, unique_indices=True)

    # -- Schur products (implicit_schur_complement.cc:106-145) --------------

    def s_times(self, x: jax.Array) -> jax.Array:
        """S x for x supported on f coords (full-length vector)."""
        ctx, ss, D = self.ctx, self.ss, self.D
        x = x * ss.f_mask
        w1 = ctx.matvec(x)  # F x (per family, (B, r))
        t = self._edot(w1)
        u = self._solve_ete(t)
        w2 = ctx.matvec(self._embed_e(u))  # E (E'E)^-1 E' F x
        diff = tuple(a - b for a, b in zip(w1, w2))
        out = ctx.rmatvec(diff) + (D * D) * x
        return out * ss.f_mask

    def rhs(self) -> jax.Array:
        """Reduced rhs: F'f - F'E (E'E)^{-1} E'f
        (implicit_schur_complement.cc:160-180)."""
        ctx, ss = self.ctx, self.ss
        t = self._edot(ctx.residuals)
        u = self._solve_ete(t)
        w2 = ctx.matvec(self._embed_e(u))
        diff = tuple(a - b for a, b in zip(ctx.residuals, w2))
        return ctx.rmatvec(diff) * ss.f_mask

    def rhs_from_tangent(self, r: jax.Array) -> jax.Array:
        """Reduced rhs for an arbitrary tangent-space rhs r = [r_e; r_f]:
        r_f - F'E (E'E + De^2)^{-1} r_e. Backs mixed-precision iterative
        refinement of Schur solves."""
        ss = self.ss
        r_e = r[ss.e_group]  # (P, Te)
        u = self._solve_ete(r_e)
        w = self.ctx.matvec(self._embed_e(u))  # E u in residual space
        corr = self.ctx.rmatvec(w)  # F'E u (+ e-part, masked below)
        return (r - corr) * ss.f_mask

    def back_substitute_tangent(self, x_f: jax.Array, r: jax.Array) -> jax.Array:
        """e-part for arbitrary tangent rhs: y_e = (E'E+De^2)^{-1}
        (r_e - E'F x_f)."""
        ss = self.ss
        x_f = x_f * ss.f_mask
        EtFx = self._edot(self.ctx.matvec(x_f))  # (P, Te)
        u = self._solve_ete(r[ss.e_group] - EtFx)
        return x_f + self._embed_e(u)

    def back_substitute(self, x_f: jax.Array) -> jax.Array:
        """Recover e (point) part: y = (E'E)^{-1} E'(f - F x)
        (implicit_schur_complement.cc:208)."""
        ctx, ss = self.ctx, self.ss
        x_f = x_f * ss.f_mask
        Jx = ctx.matvec(x_f)
        diff = tuple(r - w for r, w in zip(ctx.residuals, Jx))
        t = self._edot(diff)
        u = self._solve_ete(t)
        return x_f + self._embed_e(u)

    # -- preconditioners -----------------------------------------------------

    def schur_jacobi_blocks(self) -> Dict[int, jax.Array]:
        """Block diagonal of S over f blocks (schur_jacobi_preconditioner.h:78).

        Exact when each (e-block, f-block) pair shares at most one residual
        instance (true for BA: one observation per camera-point pair).
        """
        ctx, ss, D = self.ctx, self.ss, self.D
        out = {
            T: jnp.zeros((idx.shape[0], T, T), dtype=self.dtype)
            for T, idx in ss.f_groups.items()
        }
        inv_ete = jax.vmap(
            lambda c: jax.scipy.linalg.cho_solve(
                (c, True), jnp.eye(ss.e_tangent_size, dtype=self.dtype)
            )
        )(self._ete_chol)
        # zero row at index P: instances whose e-slot is a constant block
        # (e_pos == num_points) must contribute no correction
        inv_ete = jnp.concatenate(
            [inv_ete, jnp.zeros((1,) + inv_ete.shape[1:], inv_ete.dtype)]
        )
        from ceres_tpu.ops.reduce import apply_reduce

        for fi, fam in enumerate(ctx.families):
            ea = ss.e_arg[fi]
            for j in range(fam.num_args):
                if j == ea:
                    continue
                T = fam.structure.tangent_sizes[j]
                if T not in out:
                    continue
                F = ctx.jacs[fi][j]  # (B, r, T)
                contrib = jnp.einsum("bri,brj->bij", F, F)
                if ea >= 0:
                    E = ctx.jacs[fi][ea]  # (B, r, Te)
                    EtF = jnp.einsum("bre,brj->bej", E, F)  # (B, Te, T)
                    Minv = inv_ete[ss.e_pos[fi]]  # (B, Te, Te)
                    corr = jnp.einsum("bei,bef,bfj->bij", EtF, Minv, EtF)
                    contrib = contrib - corr
                if ss.f_plan is not None and ss.f_plan[fi][j] is not None:
                    out[T] = (
                        out[T]
                        + apply_reduce(ss.f_plan[fi][j], contrib)[
                            : out[T].shape[0]
                        ]
                    )
                else:
                    out[T] = out[T].at[ss.f_pos[fi][j]].add(
                        contrib, mode="drop"
                    )
        # Add D^2 on the f diagonal.
        for T, idx in ss.f_groups.items():
            Df = D[idx]
            out[T] = out[T] + jax.vmap(jnp.diag)(Df * Df)
        return out

    def schur_jacobi_preconditioner(self):
        blocks = self.schur_jacobi_blocks()
        factors = {
            T: jax.vmap(
                lambda m: jax.scipy.linalg.cho_factor(m, lower=True)[0]
            )(b)
            for T, b in blocks.items()
        }
        ss = self.ss

        def apply(v: jax.Array) -> jax.Array:
            out = jnp.zeros_like(v)
            for T, idx in ss.f_groups.items():
                vb = v[idx]
                sol = jax.vmap(
                    lambda c, b: jax.scipy.linalg.cho_solve((c, True), b)
                )(factors[T], vb)
                out = out.at[idx].set(sol)
            return out * ss.f_mask

        return apply

    def clustered_preconditioner(self, cluster_groups):
        """Visibility-clustered block preconditioner
        (visibility_based_preconditioner.h:127, CLUSTER_JACOBI):
        block-diagonal of S over camera CLUSTERS instead of single
        cameras. ``cluster_groups`` is a (C, m) int32 matrix of tangent
        coordinate indices per cluster, padded with ``num_tangent``
        (dummy). Blocks are extracted exactly by batched S·e_i products
        (one vmapped computation — the TPU replacement for the
        reference's per-cluster sparse factorization) and factorized with
        a batched Cholesky.
        """
        n = self.ctx.num_tangent
        dt = self.dtype
        C, m = cluster_groups.shape

        def column(i):
            e = jnp.zeros((n + 1,), dtype=dt).at[i].set(1.0)[:n]
            return self.s_times(e)

        # (C, m, n) columns of S for every cluster coordinate.
        cols = jax.vmap(jax.vmap(column))(cluster_groups)
        pad = jnp.concatenate([cols, jnp.zeros((C, m, 1), dtype=dt)], axis=2)
        # Extract the (m, m) cluster blocks; dummy coords get identity.
        sub = jax.vmap(lambda block, idx: block[:, idx])(pad, cluster_groups)
        is_dummy = cluster_groups >= n  # (C, m)
        eye = jnp.eye(m, dtype=dt)
        sub = jnp.where(
            (is_dummy[:, :, None] | is_dummy[:, None, :]),
            eye[None, :, :],
            sub,
        )
        factors = jax.vmap(
            lambda mtx: jax.scipy.linalg.cho_factor(mtx, lower=True)[0]
        )(sub)
        ss = self.ss

        def apply(v: jax.Array) -> jax.Array:
            v_pad = jnp.concatenate([v, jnp.zeros((1,), v.dtype)])
            vb = v_pad[cluster_groups]  # (C, m)
            sol = jax.vmap(
                lambda c, b: jax.scipy.linalg.cho_solve((c, True), b)
            )(factors, vb)
            out = jnp.zeros((n + 1,), dtype=v.dtype)
            out = out.at[cluster_groups].set(sol)
            return out[:n] * ss.f_mask

        return apply

    def power_series_preconditioner(self, num_terms: int):
        """Truncated Neumann series S^{-1} ~ sum_k (I - M^-1 S)^k M^-1 with
        M = block-Jacobi of S (power_series_expansion_preconditioner.h:44,
        Weber et al. power bundle adjustment)."""
        bj = self.schur_jacobi_preconditioner()

        def apply(v: jax.Array) -> jax.Array:
            x = bj(v)
            acc = x
            for _ in range(num_terms):
                x = bj(v - self.s_times(acc)) + acc
                acc = x
            return acc

        return apply

    # -- dense S -------------------------------------------------------------

    def dense_reduced_system(self) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Materialize S on the f coordinates as a dense matrix.

        One-pass explicit assembly (schur_explicit.assemble_reduced_system,
        the analog of schur_eliminator_impl.h:177-330) when the structure
        carries an assembly plan; falls back to probing S column-by-column
        with vmap(S . e_i) otherwise. Returns (S (nf, nf), rhs (nf,),
        f_idx (nf,)).
        """
        ss = self.ss
        if ss.explicit is not None:
            from ceres_tpu.linear.schur_explicit import (
                assemble_reduced_system,
            )

            S = assemble_reduced_system(self, ss.explicit)
            rhs = self.rhs()[ss.f_idx]
            return S, rhs, ss.f_idx
        return self.dense_reduced_system_probe()

    def dense_reduced_system_probe(
        self,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Reference/debug path: S via vmap(S . e_i) identity probes —
        O(nf) full Jacobian passes; kept for cross-checking the one-pass
        assembler (cross-implementation equivalence, SURVEY §4.4)."""
        ss = self.ss
        f_idx = ss.f_idx
        n = self.ctx.num_tangent

        def col(i):
            e = jnp.zeros((n,), dtype=self.ctx.residuals[0].dtype).at[i].set(1.0)
            return self.s_times(e)[f_idx]

        S = jax.vmap(col)(f_idx).T  # columns stacked
        rhs = self.rhs()[f_idx]
        return S, rhs, f_idx


# ---------------------------------------------------------------------------
# Entry point used by the trust-region step function
# ---------------------------------------------------------------------------


def solve_schur(
    ctx: JacobianContext,
    D: jax.Array,
    program,
    options,
    ss: Optional[SchurStructure] = None,
    rhs: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Solve min ||J y - f||^2 + ||D y||^2 by eliminating the e-blocks.

    Returns (y, linear_iterations, termination) with termination codes
    from linear/cg.py (LinearSolverTerminationType semantics,
    linear_solver.h:57-74). Dispatches on options.linear_solver_type:
    DENSE_SCHUR/SPARSE_SCHUR build the dense reduced system
    (schur_complement_solver.cc); ITERATIVE_SCHUR runs PCG on the
    implicit S (iterative_schur_complement_solver.cc:64-155).
    """
    if ss is None:
        ss = getattr(program, "_schur_structure", None)
        if ss is None:
            ss = build_schur_structure(program)
            program._schur_structure = ss
        if options.linear_solver_type in (
            LinearSolverType.DENSE_SCHUR,
            LinearSolverType.SPARSE_SCHUR,
        ) or getattr(options, "use_explicit_schur_complement", False):
            ensure_explicit_plan(program, ss)

    op = SchurOperator(ctx, D, ss)
    lst = options.linear_solver_type
    tangent_rhs = rhs

    if lst in (LinearSolverType.DENSE_SCHUR, LinearSolverType.SPARSE_SCHUR):
        S, rhs_red, f_idx = op.dense_reduced_system()
        if tangent_rhs is not None:
            rhs_red = op.rhs_from_tangent(tangent_rhs)[f_idx]
        chol, low = jax.scipy.linalg.cho_factor(S, lower=True)
        xf_red = jax.scipy.linalg.cho_solve((chol, low), rhs_red)
        x_f = jnp.zeros(
            (ctx.num_tangent,), dtype=ctx.residuals[0].dtype
        ).at[f_idx].set(
            xf_red
        )
        if tangent_rhs is not None:
            y = op.back_substitute_tangent(x_f, tangent_rhs)
        else:
            y = op.back_substitute(x_f)
        from ceres_tpu.linear.cg import direct_termination

        return y, jnp.asarray(1, jnp.int32), direct_termination(y)

    # ITERATIVE_SCHUR
    if options.preconditioner_type == PreconditionerType.SCHUR_JACOBI:
        M = op.schur_jacobi_preconditioner()
    elif options.preconditioner_type in (
        PreconditionerType.CLUSTER_JACOBI,
        PreconditionerType.CLUSTER_TRIDIAGONAL,
    ):
        # CLUSTER_TRIDIAGONAL currently shares the clustered-block
        # implementation (forest edges between clusters are dropped).
        if ss.cluster_groups is not None:
            M = op.clustered_preconditioner(ss.cluster_groups)
        else:
            M = op.schur_jacobi_preconditioner()
    elif (
        options.preconditioner_type
        == PreconditionerType.SCHUR_POWER_SERIES_EXPANSION
    ):
        M = op.power_series_preconditioner(options.max_num_spse_iterations)
    elif options.preconditioner_type == PreconditionerType.JACOBI:
        M = op.schur_jacobi_preconditioner()  # block-Jacobi of S
    else:
        M = None

    if tangent_rhs is not None:
        rhs = op.rhs_from_tangent(tangent_rhs)
    else:
        rhs = op.rhs()
    # Power-series initial guess for the reduced system
    # (iterative_schur_complement_solver.cc:101-111, use_spse_initialization).
    x0 = None
    if getattr(options, "use_spse_initialization", False):
        x0 = op.power_series_preconditioner(
            options.max_num_spse_iterations
        )(rhs)
    # use_explicit_schur_complement (solver.h:540-556 /
    # iterative_schur_complement_solver.cc CreatePreconditioner path):
    # materialize S once and run CG against the dense matrix — wins when
    # cameras are few and S·x would otherwise repeat the elimination.
    s_apply = op.s_times
    if getattr(options, "use_explicit_schur_complement", False):
        S_dense, _, f_idx_d = op.dense_reduced_system()
        nt = ctx.num_tangent

        def s_apply(v):
            red = S_dense @ v[f_idx_d]
            return jnp.zeros((nt,), dtype=v.dtype).at[f_idx_d].set(red)

    res: CGResult = conjugate_gradients(
        s_apply,
        rhs,
        x0=x0,
        preconditioner=M,
        max_num_iterations=options.max_linear_solver_iterations,
        min_num_iterations=options.min_linear_solver_iterations,
        q_tolerance=options.eta,
        r_tolerance=-1.0,
    )
    if tangent_rhs is not None:
        y = op.back_substitute_tangent(res.x, tangent_rhs)
    else:
        y = op.back_substitute(res.x)
    return y, res.num_iterations, res.termination
