"""Pallas TPU kernel: sorted-segment block reduction.

The hot reduction of the whole solver is "sum per-observation
contributions into per-block slots" — gradients (J'w), the Schur E'E /
E'w point systems, block-Jacobi diagonals (the reference's mutex'd
accumulations, ``program_evaluator.h:266-304``,
``schur_eliminator_impl.h:228-330``). ``ops/reduce.py`` lowers these to
one-hot matmuls (few groups) or ELL gather+sums (many groups); the ELL
gather still moves (G, K, d) rows through XLA's general gather.

This kernel exploits SORTEDNESS (the BAL builder orders observations by
point — reorder_program.cc analog): for a contiguous tile of rows, the
touched segments form a contiguous window [start, start+MAXP). Per grid
step it
  1. streams a (TILE_B, d) contribution tile HBM->VMEM,
  2. builds the LOCAL one-hot (MAXP, TILE_B) with a broadcasted-iota
     compare (VPU),
  3. reduces with one MXU matmul, and
  4. accumulates into the (G_pad, d) output window in VMEM.
One pass over the contributions, no (G, K, d) gather materialization —
the block-CSR SpMV pattern of the north star, shaped for the MXU.

Rows whose segment id falls outside the tile window (dummy/padding ids)
drop out of the one-hot — matching the dummy-row convention of
``ops/reduce.apply_reduce`` (callers slice ``[:G]``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

TILE_B = 1024


def build_sorted_plan(
    seg: np.ndarray, num_groups: int, tile_b: int = TILE_B
) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """Host-side plan for a SORTED segment vector.

    Returns (seg_tiles (num_tiles, tile_b) int32 LOCAL ids, starts
    (num_tiles,) int32, maxp, padded_B). Rows padded past B get the last
    segment id + an out-of-window local id (dropped).
    """
    seg = np.asarray(seg, dtype=np.int64).reshape(-1)
    B = seg.shape[0]
    Bp = int(-(-B // tile_b) * tile_b)
    segp = np.concatenate(
        [seg, np.full((Bp - B,), num_groups, dtype=np.int64)]
    )
    tiles = segp.reshape(-1, tile_b)
    starts = tiles[:, 0].astype(np.int32)
    spans = tiles.max(axis=1) - tiles[:, 0] + 1
    maxp = int(spans.max())
    # sublane alignment
    maxp = int(-(-maxp // 8) * 8)
    local = (tiles - starts[:, None]).astype(np.int32)
    # (num_tiles, 1, tile_b): a (1, 1, tile_b) block reads the whole
    # lane row without an in-kernel reshape (Mosaic cannot relayout an
    # int32 (8, k) tile into a flat lane vector).
    local = local.reshape(-1, 1, tile_b)
    return local, starts.reshape(-1, 1), maxp, Bp


def _kernel(starts_ref, seg_ref, contrib_ref, out_ref, *, maxp):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    start = starts_ref[i, 0]
    seg_local = seg_ref[0, 0, :]  # (TILE_B,) int32 local ids
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (maxp, seg_local.shape[0]), 0
    )
    onehot = (rows == seg_local[None, :]).astype(contrib_ref.dtype)
    # HIGHEST: f32 operands must not round through bf16 on the MXU — the
    # one-hot contraction is exact summation, not an approximate matmul.
    partial = jnp.dot(
        onehot,
        contrib_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(out_ref.dtype)
    window = out_ref[pl.ds(start, maxp), :]
    out_ref[pl.ds(start, maxp), :] = window + partial


@functools.partial(
    jax.jit, static_argnames=("num_groups", "maxp", "tile_b", "interpret")
)
def sorted_segment_sum(
    contrib: jax.Array,
    seg_tiles: jax.Array,
    starts: jax.Array,
    num_groups: int,
    maxp: int,
    tile_b: int = TILE_B,
    interpret: bool = False,
) -> jax.Array:
    """Reduce (B_padded, d) contributions by sorted segments -> (G+1, d).

    ``contrib`` must already be padded to ``seg_tiles.size`` rows.
    Returns rows [0, G]; row G is the dummy group (may under-collect —
    dropped by callers).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bp, d = contrib.shape
    num_tiles = Bp // tile_b
    # output window padded past G for the last tile's span, rounded to a
    # full sublane multiple for Mosaic's block layout
    g_pad = -(-(num_groups + 1 + maxp) // 8) * 8

    # x64 must be off while TRACING the kernel: under jax_enable_x64
    # (which ceres_tpu enables globally) the index-map constants trace as
    # i64 and Mosaic fails to legalize them. All operands here are
    # explicit f32/int32, so semantics are unaffected.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_kernel, maxp=maxp),
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # starts (whole)
                pl.BlockSpec((1, 1, tile_b), lambda i: (i, 0, 0)),
                pl.BlockSpec((tile_b, d), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((g_pad, d), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((g_pad, d), contrib.dtype),
            interpret=interpret,
        )(starts, seg_tiles, contrib)
    return out[: num_groups + 1]


def segment_sum_sorted(
    contrib: jax.Array,
    seg_tiles: jax.Array,
    starts: jax.Array,
    num_groups: int,
    maxp: int,
    tile_b: int = TILE_B,
    interpret: bool = False,
) -> jax.Array:
    """apply_reduce-compatible wrapper: (B, ...) -> (G+1, ...)."""
    B = contrib.shape[0]
    tail = contrib.shape[1:]
    flat = contrib.reshape(B, -1)
    Bp = seg_tiles.size
    if Bp != B:
        flat = jnp.concatenate(
            [flat, jnp.zeros((Bp - B, flat.shape[1]), flat.dtype)], axis=0
        )
    out = sorted_segment_sum(
        flat, seg_tiles, starts, num_groups, maxp, tile_b, interpret
    )
    return out.reshape((num_groups + 1,) + tail)


# ---------------------------------------------------------------------------
# UNSORTED full-table variant for MEDIUM group counts.
#
# The sorted kernels above require cell-sorted contributions — which the
# explicit-Schur assembler pays for with a (B, d) row-permutation gather
# (measured at BAL scale: the gather costs more than the reduction).
# When the whole (G_pad, d) table fits VMEM (few thousand groups), the
# sort is pointless: keep the table resident across the grid and reduce
# each contribution tile with ONE full-height one-hot matmul, segment
# ids in arbitrary order. No gather, no sortedness, one pass.
# ---------------------------------------------------------------------------

ONEHOT_TILED_MAX_GROUPS = 4096


def build_tiled_plan(
    seg: np.ndarray, num_groups: int, tile_b: int = TILE_B
) -> Tuple[np.ndarray, int]:
    """Host plan for the unsorted full-table kernel: (T, 1, tile_b)
    GLOBAL int32 ids (dummy/pad = num_groups) + padded_B."""
    seg = np.asarray(seg, dtype=np.int64).reshape(-1)
    B = seg.shape[0]
    Bp = int(-(-B // tile_b) * tile_b)
    segp = np.concatenate(
        [seg, np.full((Bp - B,), num_groups, dtype=np.int64)]
    )
    segp = np.where(
        (segp < 0) | (segp > num_groups), num_groups, segp
    )
    return segp.astype(np.int32).reshape(-1, 1, tile_b), Bp


def _kernel_onehot_full(seg_ref, contrib_ref, out_ref, *, gpad):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    seg_global = seg_ref[0, 0, :]  # (TILE_B,) int32 global ids
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (gpad, seg_global.shape[0]), 0
    )
    onehot = (rows == seg_global[None, :]).astype(contrib_ref.dtype)
    out_ref[:] += jnp.dot(
        onehot,
        contrib_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "tile_b", "interpret")
)
def segment_sum_onehot_tiled(
    contrib: jax.Array,
    seg_tiles: jax.Array,
    num_groups: int,
    tile_b: int = TILE_B,
    interpret: bool = False,
) -> jax.Array:
    """UNSORTED reduce: (B_padded, d) -> (G+1, d), table in VMEM."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bp, d = contrib.shape
    num_tiles = Bp // tile_b
    g_pad = -(-(num_groups + 1) // 8) * 8

    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_kernel_onehot_full, gpad=g_pad),
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((1, 1, tile_b), lambda i: (i, 0, 0)),
                pl.BlockSpec((tile_b, d), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((g_pad, d), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((g_pad, d), contrib.dtype),
            interpret=interpret,
        )(seg_tiles, contrib)
    return out[: num_groups + 1]


def segment_sum_onehot(
    contrib: jax.Array,
    seg_tiles: jax.Array,
    num_groups: int,
    padded_b: int,
    tile_b: int = TILE_B,
    interpret: bool = False,
) -> jax.Array:
    """apply_reduce-compatible wrapper: (B, ...) -> (G+1, ...)."""
    B = contrib.shape[0]
    tail = contrib.shape[1:]
    flat = contrib.reshape(B, -1)
    if padded_b != B:
        flat = jnp.concatenate(
            [
                flat,
                jnp.zeros((padded_b - B, flat.shape[1]), flat.dtype),
            ],
            axis=0,
        )
    out = segment_sum_onehot_tiled(
        flat, seg_tiles, num_groups, tile_b, interpret
    )
    return out.reshape((num_groups + 1,) + tail)


# ---------------------------------------------------------------------------
# Output-blocked variant for LARGE group counts.
#
# The kernel above keeps the whole (G_pad, d) output in VMEM across the
# grid. Mosaic lane-pads d up to 128, so a (200k, 3) point system costs
# ~100 MB of scoped VMEM — far past the ~16 MB limit. Here the output is
# blocked over a fixed grid of windows of SEG_BLOCK segments (+ a
# maxp-wide halo); a scalar-prefetch index map routes each row tile to
# its window block (the sorted starts make the visit order monotone, so
# each block is resident in VMEM for exactly one contiguous run), and a
# dense pad+add overlap-add folds the halos afterwards. Per-step VMEM is
# O((SEG_BLOCK + maxp) * 128 * 4) regardless of G.
# ---------------------------------------------------------------------------

SEG_BLOCK = 2048


def build_blocked_plan(
    seg: np.ndarray,
    num_groups: int,
    tile_b: int = TILE_B,
    seg_block: int = SEG_BLOCK,
):
    """Host plan for the output-blocked kernel.

    Returns (seg_tiles (T,1,tile_b) int32 ids LOCAL to the tile window,
    tile_src (T,) int32 contribution-tile index, block_of_tile (T,)
    int32, local_starts (T,) int32 window offset inside the output
    block, maxp, seg_block, num_blocks, padded_B). Dummy tiles (local id
    -1 everywhere, contributions dropped) are inserted so every output
    block is visited at least once (unvisited blocks would otherwise
    keep garbage from the uninitialized output buffer).
    """
    local, starts, maxp, Bp = build_sorted_plan(seg, num_groups, tile_b)
    S = int(max(seg_block, maxp))
    S = int(-(-S // 8) * 8)
    starts_flat = starts.reshape(-1).astype(np.int64)
    n_real = starts_flat.shape[0]
    num_blocks = int(-(-(num_groups + 1 + maxp) // S)) + 1
    bof = np.minimum(starts_flat // S, num_blocks - 1).astype(np.int32)
    lstart = (starts_flat - bof.astype(np.int64) * S).astype(np.int32)

    # Insert one dummy tile for every block the real tiles skip.
    missing = np.setdiff1d(np.arange(num_blocks, dtype=np.int32), bof)
    tiles_local = [local.reshape(n_real, tile_b)]
    src = [np.arange(n_real, dtype=np.int32)]
    bofs = [bof]
    lstarts = [lstart]
    if missing.size:
        tiles_local.append(
            np.full((missing.size, tile_b), -1, dtype=np.int32)
        )
        src.append(np.zeros(missing.size, dtype=np.int32))
        bofs.append(missing)
        lstarts.append(np.zeros(missing.size, dtype=np.int32))
    tiles_local = np.concatenate(tiles_local)
    src = np.concatenate(src)
    bofs = np.concatenate(bofs)
    lstarts = np.concatenate(lstarts)
    order = np.argsort(bofs, kind="stable")  # monotone block visits
    return (
        tiles_local[order].reshape(-1, 1, tile_b),
        src[order],
        bofs[order],
        lstarts[order],
        maxp,
        S,
        num_blocks,
        Bp,
    )


def _kernel_blocked(
    src_ref, bof_ref, lstart_ref, seg_ref, contrib_ref, out_ref, *, maxp
):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    first_visit = (i == 0) | (
        bof_ref[i] != bof_ref[jnp.maximum(i - 1, 0)]
    )

    @pl.when(first_visit)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ls = lstart_ref[i]
    seg_local = seg_ref[0, 0, :]  # ids local to the tile window; -1=dummy
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (maxp, seg_local.shape[0]), 0
    )
    onehot = (rows == seg_local[None, :]).astype(contrib_ref.dtype)
    partial = jnp.dot(
        onehot,
        contrib_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(out_ref.dtype)
    window = out_ref[0, pl.ds(ls, maxp), :]
    out_ref[0, pl.ds(ls, maxp), :] = window + partial


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_groups", "maxp", "seg_block", "num_blocks", "tile_b",
        "interpret",
    ),
)
def sorted_segment_sum_blocked(
    contrib: jax.Array,
    seg_tiles: jax.Array,
    tile_src: jax.Array,
    block_of_tile: jax.Array,
    local_starts: jax.Array,
    num_groups: int,
    maxp: int,
    seg_block: int,
    num_blocks: int,
    tile_b: int = TILE_B,
    interpret: bool = False,
) -> jax.Array:
    """Output-blocked reduce: (B_padded, d) -> (G+1, d), VMEM-bounded."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = contrib.shape[1]
    num_tiles = seg_tiles.shape[0]
    S = seg_block
    W = S + maxp

    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((1, 1, tile_b), lambda i, src, bof, ls: (i, 0, 0)),
                pl.BlockSpec(
                    (tile_b, d), lambda i, src, bof, ls: (src[i], 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, W, d), lambda i, src, bof, ls: (bof[i], 0, 0)
            ),
        )
        out = pl.pallas_call(
            functools.partial(_kernel_blocked, maxp=maxp),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((num_blocks, W, d), contrib.dtype),
            interpret=interpret,
        )(tile_src, block_of_tile, local_starts, seg_tiles, contrib)

    # Overlap-add: block b's rows [0,S) land at b*S; its halo [S,W) at
    # (b+1)*S. Halos never overlap each other (maxp <= S), so two dense
    # pads + one add fold everything — no scatter.
    main = out[:, :S, :].reshape(num_blocks * S, d)
    halo = out[:, S:, :]  # (num_blocks, maxp, d)
    halo = jnp.pad(halo, ((0, 0), (0, S - maxp), (0, 0))).reshape(
        num_blocks * S, d
    )
    total = jnp.pad(main, ((0, S), (0, 0))) + jnp.pad(
        halo, ((S, 0), (0, 0))
    )
    return total[: num_groups + 1]


# ---------------------------------------------------------------------------
# Fused pair-outer + blocked reduce.
#
# The explicit-Schur correction term reduces 15x-per-point outer-product
# blocks W_a' Y_b into camera-pair cells. Materializing the (pairs, T1*T2)
# contributions in HBM costs a write + a cell-sorting gather + a re-read
# (~2/3 of the whole stage). This kernel takes the PRE-GATHERED (pairs,
# Te*T) operand rows instead and forms the outer products IN VMEM with
# the same 0/1-selection MXU matmuls as schur_explicit._bilinear_mxu,
# feeding the windowed accumulation directly — the contributions never
# touch HBM. This is the fused pair-contraction kernel of the
# schur_eliminator_impl.h:228-330 chunk loop, shaped for the TPU.
# ---------------------------------------------------------------------------


def _kernel_blocked_outer(
    src_ref, bof_ref, lstart_ref, seg_ref, wg_ref, yg_ref,
    a_ref, b_ref, s_ref, out_ref, *, maxp
):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    first_visit = (i == 0) | (
        bof_ref[i] != bof_ref[jnp.maximum(i - 1, 0)]
    )

    @pl.when(first_visit)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    hi = jax.lax.Precision.HIGHEST
    xa = jnp.dot(wg_ref[:], a_ref[:], precision=hi)
    yb = jnp.dot(yg_ref[:], b_ref[:], precision=hi)
    contrib = jnp.dot(xa * yb, s_ref[:], precision=hi)

    ls = lstart_ref[i]
    seg_local = seg_ref[0, 0, :]
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (maxp, seg_local.shape[0]), 0
    )
    onehot = (rows == seg_local[None, :]).astype(contrib.dtype)
    partial = jnp.dot(
        onehot,
        contrib,
        preferred_element_type=jnp.float32,
        precision=hi,
    ).astype(out_ref.dtype)
    window = out_ref[0, pl.ds(ls, maxp), :]
    out_ref[0, pl.ds(ls, maxp), :] = window + partial


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_groups", "maxp", "seg_block", "num_blocks", "tile_b",
        "d_out", "consts_key", "interpret",
    ),
)
def _outer_segment_sum_blocked_impl(
    wg: jax.Array,
    yg: jax.Array,
    seg_tiles: jax.Array,
    tile_src: jax.Array,
    block_of_tile: jax.Array,
    local_starts: jax.Array,
    num_groups: int,
    maxp: int,
    seg_block: int,
    num_blocks: int,
    tile_b: int,
    d_out: int,
    consts_key,
    interpret: bool = False,
) -> jax.Array:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ceres_tpu.linear.schur_explicit import _outer_consts

    a_const, b_const, s_const = _outer_consts(*consts_key)
    a_const = jnp.asarray(a_const, wg.dtype)
    b_const = jnp.asarray(b_const, wg.dtype)
    s_const = jnp.asarray(s_const, wg.dtype)
    m = a_const.shape[1]
    dw = wg.shape[1]
    dy = yg.shape[1]
    num_tiles = seg_tiles.shape[0]
    S = seg_block
    W = S + maxp

    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, tile_b), lambda i, src, bof, ls: (i, 0, 0)
                ),
                pl.BlockSpec(
                    (tile_b, dw), lambda i, src, bof, ls: (src[i], 0)
                ),
                pl.BlockSpec(
                    (tile_b, dy), lambda i, src, bof, ls: (src[i], 0)
                ),
                pl.BlockSpec(
                    (dw, m), lambda i, src, bof, ls: (0, 0)
                ),
                pl.BlockSpec(
                    (dy, m), lambda i, src, bof, ls: (0, 0)
                ),
                pl.BlockSpec(
                    (m, d_out), lambda i, src, bof, ls: (0, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, W, d_out), lambda i, src, bof, ls: (bof[i], 0, 0)
            ),
        )
        out = pl.pallas_call(
            functools.partial(_kernel_blocked_outer, maxp=maxp),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (num_blocks, W, d_out), wg.dtype
            ),
            interpret=interpret,
        )(
            tile_src, block_of_tile, local_starts, seg_tiles, wg, yg,
            a_const, b_const, s_const,
        )

    main = out[:, :S, :].reshape(num_blocks * S, d_out)
    halo = out[:, S:, :]
    halo = jnp.pad(halo, ((0, 0), (0, S - maxp), (0, 0))).reshape(
        num_blocks * S, d_out
    )
    total = jnp.pad(main, ((0, S), (0, 0))) + jnp.pad(
        halo, ((S, 0), (0, 0))
    )
    return total[: num_groups + 1]


def outer_segment_sum_blocked(
    wg: jax.Array,
    yg: jax.Array,
    plan,
    K: int,
    T1: int,
    T2: int,
    interpret: bool = False,
) -> jax.Array:
    """Fused ``sum_seg W_row' Y_row`` for a sorted_blocked ReducePlan:
    (B, K*T1) x (B, K*T2) pre-gathered operand rows -> (G+1, T1*T2)
    flat cell blocks. Rows must already be padded to plan.padded_b."""
    B = wg.shape[0]
    if B != plan.padded_b:
        pad_w = jnp.zeros((plan.padded_b - B, wg.shape[1]), wg.dtype)
        pad_y = jnp.zeros((plan.padded_b - B, yg.shape[1]), yg.dtype)
        wg = jnp.concatenate([wg, pad_w], axis=0)
        yg = jnp.concatenate([yg, pad_y], axis=0)
    return _outer_segment_sum_blocked_impl(
        wg,
        yg,
        plan.seg_tiles,
        plan.tile_src,
        plan.block_of_tile,
        plan.local_starts,
        plan.num_groups,
        plan.maxp,
        plan.seg_block,
        plan.num_blocks,
        plan.tile_b,
        T1 * T2,
        (K, T1, T2),
        interpret,
    )


def segment_sum_sorted_blocked(
    contrib: jax.Array,
    seg_tiles: jax.Array,
    tile_src: jax.Array,
    block_of_tile: jax.Array,
    local_starts: jax.Array,
    num_groups: int,
    maxp: int,
    seg_block: int,
    num_blocks: int,
    padded_b: int,
    tile_b: int = TILE_B,
    interpret: bool = False,
) -> jax.Array:
    """apply_reduce-compatible wrapper: (B, ...) -> (G+1, ...).

    ``padded_b`` is the plan's padded contribution row count (real
    tiles * tile_b; dummy tiles re-read tile 0 and drop every row).
    """
    B = contrib.shape[0]
    tail = contrib.shape[1:]
    flat = contrib.reshape(B, -1)
    if flat.shape[0] != padded_b:
        flat = jnp.concatenate(
            [
                flat,
                jnp.zeros(
                    (padded_b - flat.shape[0], flat.shape[1]), flat.dtype
                ),
            ],
            axis=0,
        )
    out = sorted_segment_sum_blocked(
        flat,
        seg_tiles,
        tile_src,
        block_of_tile,
        local_starts,
        num_groups,
        maxp,
        seg_block,
        num_blocks,
        tile_b,
        interpret,
    )
    return out.reshape((num_groups + 1,) + tail)
