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
