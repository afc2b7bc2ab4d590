"""One-pass explicit Schur-complement assembly.

TPU-native analog of the reference's chunked explicit eliminator
(``schur_eliminator.h:108-152`` math, ``schur_eliminator_impl.h:177-330``
implementation): the reduced camera system

    S = F'F + D_f^2 - W' (E'E + D_e^2)^{-1} W,      W = E'F

is assembled in ONE pass over the residual blocks instead of probing S
column-by-column with vmapped ``S . e_i`` products. The reference loops
over e-block chunks under locks; here every term is a batched einsum plus
a host-planned gather reduction:

- the ``F'F`` term reduces per-instance ``F_i' F_j`` blocks into
  camera-pair cells with segment-reduction plans (ceres_tpu.ops.reduce);
- the correction term enumerates, per point, the pairs of observations
  (the reference's chunk outer product, schur_eliminator_impl.h:228-330)
  and reduces ``W_a' M_p^{-1} W_b`` blocks into camera-pair cells with an
  ELL gather + one MXU einsum per cell group.

All pair/cell structures are built once on the host from the (static)
visibility pattern; assembly itself is pure XLA with unique-index
scatters only.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ceres_tpu.ops.reduce import ReducePlan, apply_reduce, build_reduce_plan


@dataclasses.dataclass(frozen=True)
class FtFPart:
    """F'F cell reduction for one (family, arg-pair)."""

    fi: int
    j1: int
    j2: int
    # Reduce B instances into diagonal cells / strict-lower cells /
    # strict-lower cells holding the TRANSPOSED contribution.
    plan_diag: Optional[ReducePlan]
    rows_diag: Optional[jax.Array]  # (Cd, T1) reduced row coords
    cols_diag: Optional[jax.Array]  # (Cd, T2)
    plan_low: Optional[ReducePlan]
    rows_low: Optional[jax.Array]
    cols_low: Optional[jax.Array]
    plan_lowt: Optional[ReducePlan]
    rows_lowt: Optional[jax.Array]  # coords for X^T placed at (p2, p1)
    cols_lowt: Optional[jax.Array]
    # Gather-placement alternative (see assemble_reduced_system): for
    # each kind, an (n1, n2) int32 grid mapping (row-block, col-block)
    # ordinals within the size-grouped basis to a cell index (dummy = C),
    # plus the static rectangle offset in the grouped S. XLA scatters
    # execute near-serially on TPU; a grid GATHER + static-offset
    # dynamic-update-slice places the same blocks at memory speed.
    inv_diag: Optional[jax.Array] = None
    inv_low: Optional[jax.Array] = None
    inv_lowt: Optional[jax.Array] = None
    offs_diag: Optional[Tuple[int, int]] = None
    offs_low: Optional[Tuple[int, int]] = None
    offs_lowt: Optional[Tuple[int, int]] = None


jax.tree_util.register_dataclass(
    FtFPart,
    data_fields=[
        "plan_diag", "rows_diag", "cols_diag",
        "plan_low", "rows_low", "cols_low",
        "plan_lowt", "rows_lowt", "cols_lowt",
        "inv_diag", "inv_low", "inv_lowt",
    ],
    meta_fields=["fi", "j1", "j2", "offs_diag", "offs_low", "offs_lowt"],
)


@dataclasses.dataclass(frozen=True)
class CorrCells:
    """Correction-term cells for one (T1, T2) slot-space pair.

    ``a_idx``/``b_idx`` index into the concatenated W slot spaces of f
    sizes T1/T2 (padded row = zeros). ``diagonal`` cells already contain
    every ordered pair; ``mirror`` (strict-lower) cells are transposed
    into the upper triangle by the assembler.
    """

    T1: int
    T2: int
    diagonal: bool
    a_idx: jax.Array  # (C, K) int32 into T1 slot space (pad = N1)
    b_idx: jax.Array  # (C, K) int32 into T2 slot space (pad = N2)
    rows: jax.Array  # (C, T1) reduced row coordinates
    cols: jax.Array  # (C, T2) reduced col coordinates
    inv_map: Optional[jax.Array] = None  # (n1, n2) grid -> cell (dummy=C)
    offs: Optional[Tuple[int, int]] = None  # grouped-basis rect offset


jax.tree_util.register_dataclass(
    CorrCells,
    data_fields=["a_idx", "b_idx", "rows", "cols", "inv_map"],
    meta_fields=["T1", "T2", "diagonal", "offs"],
)


@dataclasses.dataclass(frozen=True)
class ExplicitSchurPlan:
    nf: int
    # W slot spaces: per f tangent size, the (fi, j) args concatenated.
    slot_args: Tuple[Tuple[int, Tuple[Tuple[int, int], ...]], ...]  # meta
    ftf: Tuple[FtFPart, ...]
    corr: Tuple[CorrCells, ...]
    f_reduced: jax.Array  # (num_tangent+1,) tangent coord -> reduced (or nf)
    # Gather-placement support: assembly happens in a size-grouped
    # permutation of the reduced basis (all f-blocks of one tangent size
    # contiguous); g_of_r maps reduced coord -> grouped coord. When
    # grid_ok every scatter site carries an inv_map and assembly is
    # scatter-free; grouped_identity skips the final unpermute.
    g_of_r: Optional[jax.Array] = None
    grid_ok: bool = False
    grouped_identity: bool = True


jax.tree_util.register_dataclass(
    ExplicitSchurPlan,
    data_fields=["ftf", "corr", "f_reduced", "g_of_r"],
    meta_fields=["nf", "slot_args", "grid_ok", "grouped_identity"],
)



def _host_pos(ss, fi, j=None):
    """Host numpy copy of ss.e_pos[fi] (j=None) / ss.f_pos[fi][j] without a
    device->host transfer when build_schur_structure stashed one."""
    if j is None:
        h = getattr(ss, "_host_e_pos", None)
        return h[fi] if h is not None else np.asarray(ss.e_pos[fi])
    h = getattr(ss, "_host_f_pos", None)
    return h[fi][j] if h is not None else np.asarray(ss.f_pos[fi][j])

# Cap on the transient (n1, n2, T1, T2) gather grid used by the
# scatter-free placement (elements; 64M f32 = 256 MB). Above it the
# legacy scatter path assembles that plan.
GRID_MAX_ELEMS = 64_000_000


def _cells_from_pairs(keys, rows_of, cols_of, T1, T2):
    """keys: list of (p1, p2) cell keys per item; returns (cell_ids,
    ordered unique cells, rows, cols matrices, uniq dict)."""
    uniq: Dict[Tuple[int, int], int] = {}
    ids = np.empty(len(keys), dtype=np.int64)
    for i, k in enumerate(keys):
        if k not in uniq:
            uniq[k] = len(uniq)
        ids[i] = uniq[k]
    C = len(uniq)
    rows = np.empty((C, T1), dtype=np.int32)
    cols = np.empty((C, T2), dtype=np.int32)
    for (p1, p2), c in uniq.items():
        rows[c] = rows_of(p1)
        cols[c] = cols_of(p2)
    return ids, C, rows, cols, uniq


def _grid_inverse(uniq, n1, n2, T1, T2):
    """(n1, n2) int32 grid mapping block ordinals to cell ids (dummy =
    len(uniq)); None when the grid exceeds GRID_MAX_ELEMS."""
    if n1 * n2 * T1 * T2 > GRID_MAX_ELEMS:
        return None
    inv = np.full((n1, n2), len(uniq), dtype=np.int32)
    for (p1, p2), c in uniq.items():
        inv[p1, p2] = c
    return jnp.asarray(inv)


def build_explicit_plan(program, ss) -> ExplicitSchurPlan:
    """Host-side construction of the one-pass assembly plan."""
    families = program.families
    f_idx = np.asarray(ss.f_idx)
    nf = f_idx.shape[0]
    nt = program.num_tangent

    # tangent coord -> reduced coordinate (nf for non-f coords & dummy).
    f_reduced = np.full(nt + 1, nf, dtype=np.int32)
    f_reduced[f_idx] = np.arange(nf, dtype=np.int32)

    f_groups = {T: np.asarray(g) for T, g in ss.f_groups.items()}

    def reduced_coords(T, pos):
        return f_reduced[f_groups[T][pos]]

    def start(T, pos):
        return int(f_reduced[f_groups[T][pos][0]])

    # Size-grouped basis for scatter-free placement: the ACTIVE (all
    # tangent coords in the reduced f space — constant blocks excluded)
    # f-blocks of one tangent size packed contiguously, ordered by group
    # position. ordinal_of_pos maps a group position to its packed
    # ordinal (-1 = inactive).
    size_row_off: Dict[int, int] = {}
    num_active: Dict[int, int] = {}
    ordinal_of_pos: Dict[int, np.ndarray] = {}
    g_of_r = np.full(nf, -1, dtype=np.int32)
    _off = 0
    for T in sorted(f_groups):
        red = f_reduced[f_groups[T]]  # (G, T) reduced coords per block
        G = red.shape[0]
        active = np.all(red < nf, axis=1) if G else np.zeros(0, bool)
        ords = np.full(G, -1, dtype=np.int32)
        ords[active] = np.arange(int(active.sum()), dtype=np.int32)
        ordinal_of_pos[T] = ords
        size_row_off[T] = _off
        nA = int(active.sum())
        num_active[T] = nA
        gro = _off + (
            ords[active][:, None].astype(np.int64) * T
            + np.arange(T, dtype=np.int64)[None, :]
        )
        g_of_r[red[active]] = gro
        _off += nA * T
    grid_allowed = _off == nf and not np.any(g_of_r < 0)
    grouped_identity = grid_allowed and bool(
        np.array_equal(g_of_r, np.arange(nf, dtype=np.int32))
    )

    # ---- F'F cells -------------------------------------------------------
    ftf_parts: List[FtFPart] = []
    for fi, fam in enumerate(families):
        ea = ss.e_arg[fi]
        f_args = [
            j
            for j in range(fam.num_args)
            if j != ea and ss.f_pos[fi][j] is not None
        ]
        B = fam.batch
        for a_i, j1 in enumerate(f_args):
            for j2 in f_args[a_i:]:
                T1 = fam.structure.tangent_sizes[j1]
                T2 = fam.structure.tangent_sizes[j2]
                p1 = _host_pos(ss, fi, j1)
                p2 = _host_pos(ss, fi, j2)
                G1 = f_groups.get(T1, np.zeros((0, T1))).shape[0]
                G2 = f_groups.get(T2, np.zeros((0, T2))).shape[0]
                valid = (p1 < G1) & (p2 < G2)
                # Orient each instance: diagonal / lower / transposed.
                kinds = np.full(B, -1, dtype=np.int8)
                s1 = np.full(B, -1, dtype=np.int64)
                s2 = np.full(B, -1, dtype=np.int64)
                vidx = np.nonzero(valid)[0]
                for b in vidx:
                    s1[b] = start(T1, int(p1[b]))
                    s2[b] = start(T2, int(p2[b]))
                kinds[vidx] = np.where(
                    s1[vidx] == s2[vidx],
                    0,
                    np.where(s1[vidx] > s2[vidx], 1, 2),
                )

                def make(kind, key_fn, Ta, Tb, rows_of, cols_of):
                    sel = np.nonzero(kinds == kind)[0]
                    if sel.size == 0:
                        return None, None, None, None, None
                    keys = [key_fn(b) for b in sel]
                    ids, C, rows, cols, uniq = _cells_from_pairs(
                        keys, rows_of, cols_of, Ta, Tb
                    )
                    seg = np.full(B, C, dtype=np.int64)
                    seg[sel] = ids
                    # Grid inverse over ACTIVE block ordinals for the
                    # scatter-free placement.
                    inv = offs = None
                    if grid_allowed:
                        oa, ob = ordinal_of_pos[Ta], ordinal_of_pos[Tb]
                        ord_uniq = {
                            (int(oa[pa]), int(ob[pb])): c
                            for (pa, pb), c in uniq.items()
                        }
                        if all(a >= 0 and b >= 0 for a, b in ord_uniq):
                            inv = _grid_inverse(
                                ord_uniq, num_active[Ta], num_active[Tb],
                                Ta, Tb,
                            )
                            if inv is not None:
                                offs = (size_row_off[Ta], size_row_off[Tb])
                    return (
                        build_reduce_plan(seg, C),
                        jnp.asarray(rows),
                        jnp.asarray(cols),
                        inv,
                        offs,
                    )

                plan_d, rows_d, cols_d, inv_d, offs_d = make(
                    0,
                    lambda b: (int(p1[b]), int(p2[b])),
                    T1,
                    T2,
                    lambda p: reduced_coords(T1, p),
                    lambda p: reduced_coords(T2, p),
                )
                plan_l, rows_l, cols_l, inv_l, offs_l = make(
                    1,
                    lambda b: (int(p1[b]), int(p2[b])),
                    T1,
                    T2,
                    lambda p: reduced_coords(T1, p),
                    lambda p: reduced_coords(T2, p),
                )
                # transposed: X^T goes to cell (p2, p1) (strict lower).
                plan_t, rows_t, cols_t, inv_t, offs_t = make(
                    2,
                    lambda b: (int(p2[b]), int(p1[b])),
                    T2,
                    T1,
                    lambda p: reduced_coords(T2, p),
                    lambda p: reduced_coords(T1, p),
                )
                if plan_d is None and plan_l is None and plan_t is None:
                    continue
                ftf_parts.append(
                    FtFPart(
                        fi=fi,
                        j1=j1,
                        j2=j2,
                        plan_diag=plan_d,
                        rows_diag=rows_d,
                        cols_diag=cols_d,
                        plan_low=plan_l,
                        rows_low=rows_l,
                        cols_low=cols_l,
                        plan_lowt=plan_t,
                        rows_lowt=rows_t,
                        cols_lowt=cols_t,
                        inv_diag=inv_d,
                        inv_low=inv_l,
                        inv_lowt=inv_t,
                        offs_diag=offs_d,
                        offs_low=offs_l,
                        offs_lowt=offs_t,
                    )
                )

    # ---- W slot spaces and correction pairs -------------------------------
    # Slot space per f size: concat of (fi, j) args (instances stacked).
    slot_args: Dict[int, List[Tuple[int, int]]] = {}
    slot_offset: Dict[Tuple[int, int], int] = {}
    slot_count: Dict[int, int] = {}
    for fi, fam in enumerate(families):
        ea = ss.e_arg[fi]
        if ea < 0:
            continue
        for j in range(fam.num_args):
            if j == ea or ss.f_pos[fi][j] is None:
                continue
            T = fam.structure.tangent_sizes[j]
            slot_offset[(fi, j)] = slot_count.get(T, 0)
            slot_count[T] = slot_count.get(T, 0) + fam.batch
            slot_args.setdefault(T, []).append((fi, j))

    # Per point: list of (T, slot, pos, sstart) over observing slots.
    P = ss.num_points
    point_obs: List[List[Tuple[int, int, int, int]]] = [[] for _ in range(P)]
    for fi, fam in enumerate(families):
        ea = ss.e_arg[fi]
        if ea < 0:
            continue
        epos = _host_pos(ss, fi)
        mask = (
            np.asarray(fam.mask) > 0
            if fam.mask is not None
            else np.ones(fam.batch, bool)
        )
        for j in range(fam.num_args):
            if j == ea or ss.f_pos[fi][j] is None:
                continue
            T = fam.structure.tangent_sizes[j]
            G = f_groups.get(T, np.zeros((0, T))).shape[0]
            fpos = _host_pos(ss, fi, j)
            off = slot_offset[(fi, j)]
            ok = mask & (epos < P) & (fpos < G)
            starts = np.full(fam.batch, -1, dtype=np.int64)
            for b in np.nonzero(ok)[0]:
                starts[b] = start(T, int(fpos[b]))
            for b in np.nonzero(ok)[0]:
                point_obs[int(epos[b])].append(
                    (T, off + int(b), int(fpos[b]), int(starts[b]))
                )

    # Enumerate pairs into cells, grouped by (T1, T2, diagonal?).
    # diag cells: same camera block -> all ordered pairs (incl. a == b).
    # lower cells: distinct blocks, oriented row-start > col-start.
    cell_pairs: Dict[
        Tuple[int, int, bool], Dict[Tuple[int, int], List[Tuple[int, int]]]
    ] = {}
    for obs in point_obs:
        n = len(obs)
        for ai in range(n):
            Ta, sa, pa, ssa = obs[ai]
            for bi in range(n):
                Tb, sb, pb, ssb = obs[bi]
                same_block = Ta == Tb and pa == pb
                if same_block:
                    key = (Ta, Tb, True)
                    cell = (pa, pb)
                    pair = (sa, sb)
                elif ssa > ssb:
                    key = (Ta, Tb, False)
                    cell = (pa, pb)
                    pair = (sa, sb)
                else:
                    continue  # upper triangle: mirrored by assembler
                cell_pairs.setdefault(key, {}).setdefault(cell, []).append(
                    pair
                )

    corr: List[CorrCells] = []
    for (T1, T2, diag), cells in cell_pairs.items():
        C = len(cells)
        K = max(len(v) for v in cells.values())
        N1 = slot_count.get(T1, 0)
        N2 = slot_count.get(T2, 0)
        a_idx = np.full((C, K), N1, dtype=np.int32)
        b_idx = np.full((C, K), N2, dtype=np.int32)
        rows = np.empty((C, T1), dtype=np.int32)
        cols = np.empty((C, T2), dtype=np.int32)
        ord_uniq: Dict[Tuple[int, int], int] = {}
        for c, ((p1, p2), pairs) in enumerate(cells.items()):
            for k, (sa, sb) in enumerate(pairs):
                a_idx[c, k] = sa
                b_idx[c, k] = sb
            rows[c] = reduced_coords(T1, p1)
            cols[c] = reduced_coords(T2, p2)
            o1 = int(ordinal_of_pos[T1][p1])
            o2 = int(ordinal_of_pos[T2][p2])
            ord_uniq[(o1, o2)] = c
        inv = offs = None
        if grid_allowed and all(a >= 0 and b >= 0 for a, b in ord_uniq):
            inv = _grid_inverse(
                ord_uniq, num_active[T1], num_active[T2], T1, T2
            )
            if inv is not None:
                offs = (size_row_off[T1], size_row_off[T2])
        corr.append(
            CorrCells(
                T1=T1,
                T2=T2,
                diagonal=diag,
                a_idx=jnp.asarray(a_idx),
                b_idx=jnp.asarray(b_idx),
                rows=jnp.asarray(rows),
                cols=jnp.asarray(cols),
                inv_map=inv,
                offs=offs,
            )
        )

    grid_ok = (
        grid_allowed
        and all(
            (p.plan_diag is None or p.inv_diag is not None)
            and (p.plan_low is None or p.inv_low is not None)
            and (p.plan_lowt is None or p.inv_lowt is not None)
            for p in ftf_parts
        )
        and all(cc.inv_map is not None for cc in corr)
    )

    return ExplicitSchurPlan(
        nf=nf,
        slot_args=tuple(
            (T, tuple(args)) for T, args in sorted(slot_args.items())
        ),
        ftf=tuple(ftf_parts),
        corr=tuple(corr),
        f_reduced=jnp.asarray(f_reduced),
        g_of_r=jnp.asarray(g_of_r) if grid_allowed else None,
        grid_ok=grid_ok,
        grouped_identity=grouped_identity,
    )


@dataclasses.dataclass(frozen=True)
class CellSite:
    """One placement site of the assembly: a batch of reduced cell
    blocks (C, T1, T2) plus where they go. ``diagonal`` sites land on
    block-diagonal cells (each block symmetric after accumulation);
    non-diagonal sites land strictly below the diagonal and are mirrored
    into the upper triangle by the consumer."""

    diagonal: bool
    rows: jax.Array  # (C, T1) reduced row coordinates
    cols: jax.Array  # (C, T2) reduced col coordinates
    inv: Optional[jax.Array]  # grid inverse (scatter-free placement)
    offs: Optional[Tuple[int, int]]


def compute_cell_blocks(op, plan: ExplicitSchurPlan):
    """Compute every reduced cell block of S (without damping) in one
    pass, WITHOUT placing them.

    Returns (sites, blocks): a deterministic list of :class:`CellSite`
    descriptors and the matching list of (C, T1, T2) value arrays. The
    dense assembler scatters them into an (nf, nf) matrix; the
    SPARSE_SCHUR exporter (linear/sparse_schur.py) ships them to the
    host and assembles the block-sparse reduced system instead — the
    analog split of SchurEliminator (produces cells) vs the
    BlockRandomAccess{Dense,Sparse}Matrix target it writes to
    (schur_complement_solver.h:113-183).
    """
    ctx, ss = op.ctx, op.ss
    dt = op.dtype
    Te = ss.e_tangent_size
    sites: List[CellSite] = []
    blocks_out: List[jax.Array] = []

    # ---- F'F -------------------------------------------------------------
    for part in plan.ftf:
        F1 = ctx.jacs[part.fi][part.j1]
        F2 = ctx.jacs[part.fi][part.j2]
        X = jnp.einsum("bri,brj->bij", F1, F2)
        if part.plan_diag is not None:
            blocks = apply_reduce(part.plan_diag, X)
            blocks = blocks[: part.rows_diag.shape[0]]
            if part.j1 != part.j2:
                # both (j1, j2) and (j2, j1) hit the same diagonal cell
                blocks = blocks + jnp.swapaxes(blocks, 1, 2)
            sites.append(
                CellSite(True, part.rows_diag, part.cols_diag,
                         part.inv_diag, part.offs_diag)
            )
            blocks_out.append(blocks)
        if part.plan_low is not None:
            blocks = apply_reduce(part.plan_low, X)
            sites.append(
                CellSite(False, part.rows_low, part.cols_low,
                         part.inv_low, part.offs_low)
            )
            blocks_out.append(blocks[: part.rows_low.shape[0]])
        if part.plan_lowt is not None:
            blocks = apply_reduce(part.plan_lowt, X)
            sites.append(
                CellSite(False, part.rows_lowt, part.cols_lowt,
                         part.inv_lowt, part.offs_lowt)
            )
            blocks_out.append(
                jnp.swapaxes(blocks[: part.rows_lowt.shape[0]], 1, 2)
            )

    # ---- correction W' M^{-1} W -------------------------------------------
    # Minv (P, Te, Te) with a zero dummy row (constant-point instances).
    Minv = op._ete_inv
    Minv = jnp.concatenate(
        [Minv, jnp.zeros((1, Te, Te), dtype=dt)], axis=0
    )

    W: Dict[int, jax.Array] = {}
    Y: Dict[int, jax.Array] = {}
    for T, args in plan.slot_args:
        ws, ys = [], []
        for fi, j in args:
            ea = ss.e_arg[fi]
            E = ctx.jacs[fi][ea]  # (B, r, Te)
            F = ctx.jacs[fi][j]  # (B, r, T)
            w = jnp.einsum("bre,brt->bet", E, F)  # (B, Te, T)
            m = Minv[ss.e_pos[fi]]  # (B, Te, Te)
            ws.append(w)
            ys.append(jnp.einsum("bef,bft->bet", m, w))
        pad = jnp.zeros((1, Te, T), dtype=dt)
        W[T] = jnp.concatenate(ws + [pad], axis=0)
        Y[T] = jnp.concatenate(ys + [pad], axis=0)

    for cc in plan.corr:
        C, K = cc.a_idx.shape
        # 1-D-index gathers + major-dim-only reshapes + one dot_general
        # contracting (k, e) jointly. The equivalent 2-D-index gather
        # with a (Te, T) tail + 4-D einsum costs ~3x the XLA compile
        # time at BAL scale (benchmarks/compile_micro2.py: 27s vs 9.5s)
        # for identical math: blocks[c,i,j] = -sum_{k,e} Wa Yb.
        Wa = W[cc.T1][cc.a_idx.reshape(-1)].reshape(C, K * Te, cc.T1)
        Yb = Y[cc.T2][cc.b_idx.reshape(-1)].reshape(C, K * Te, cc.T2)
        blocks = -jax.lax.dot_general(
            Wa, Yb, (((1,), (1,)), ((0,), (0,)))
        )
        sites.append(
            CellSite(cc.diagonal, cc.rows, cc.cols, cc.inv_map, cc.offs)
        )
        blocks_out.append(blocks)

    return sites, blocks_out


def assemble_reduced_system(op, plan: ExplicitSchurPlan):
    """Assemble the dense reduced system S (nf, nf) in one pass.

    ``op`` is a SchurOperator (provides jacobians, (E'E+De^2)^-1 factors
    and the damping vector). Returns S with damping included.

    Placement: when ``plan.grid_ok``, per-cell blocks are GATHERED into a
    dense (n1, n2) grid per size-group rectangle and placed with a
    static-offset dynamic-update-slice — XLA scatters run near-serially
    on TPU (element-at-a-time updates), while the grid gather + slice
    write streams at memory bandwidth. Assembly then happens in the
    size-grouped basis and is unpermuted once at the end (identity for
    single-f-size problems like BAL).
    """
    ss, D = op.ss, op.D
    dt = op.dtype
    nf = plan.nf
    grid_mode = plan.grid_ok

    S_d = jnp.zeros((nf, nf), dtype=dt)  # diagonal cells
    S_l = jnp.zeros((nf, nf), dtype=dt)  # strict lower cells

    def scatter_legacy(S, rows, cols, blocks):
        return S.at[rows[:, :, None], cols[:, None, :]].add(
            blocks, mode="drop", unique_indices=True
        )

    def place_grid(S, inv, offs, blocks):
        # blocks (C, T1, T2); inv (n1, n2) with dummy = C -> zero block.
        C, T1, T2 = blocks.shape
        bp = jnp.concatenate(
            [blocks, jnp.zeros((1, T1, T2), blocks.dtype)], axis=0
        )
        grid = bp[inv]  # (n1, n2, T1, T2)
        rect = grid.transpose(0, 2, 1, 3).reshape(
            inv.shape[0] * T1, inv.shape[1] * T2
        )
        r0, c0 = offs
        cur = jax.lax.dynamic_slice(S, (r0, c0), rect.shape)
        return jax.lax.dynamic_update_slice(S, cur + rect, (r0, c0))

    sites, cell_blocks = compute_cell_blocks(op, plan)
    for site, blocks in zip(sites, cell_blocks):
        if grid_mode:
            placed = place_grid(
                S_d if site.diagonal else S_l, site.inv, site.offs, blocks
            )
        else:
            placed = scatter_legacy(
                S_d if site.diagonal else S_l, site.rows, site.cols, blocks
            )
        if site.diagonal:
            S_d = placed
        else:
            S_l = placed

    S = S_d + S_l + S_l.T
    if grid_mode and not plan.grouped_identity:
        # Unpermute from the size-grouped basis back to reduced order.
        g = plan.g_of_r
        S = S[g][:, g]
    # Damping D_f^2 on the reduced diagonal.
    df = D[ss.f_idx]
    S = S + jnp.diag((df * df).astype(dt))
    return S
