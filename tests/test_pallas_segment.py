"""Pallas sorted-segment block-reduction kernel (ops/pallas_segment.py).

Runs in interpreter mode on CPU; on TPU the same code path is what
build_reduce_plan selects for sorted batches (kind="sorted").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceres_tpu.ops.pallas_segment import (
    build_sorted_plan,
    segment_sum_sorted,
)
from ceres_tpu.ops import reduce as red


def _reference(seg, contrib, G):
    out = np.zeros((G + 1,) + contrib.shape[1:], np.float64)
    np.add.at(out, np.minimum(seg, G), contrib.astype(np.float64))
    return out.astype(contrib.dtype)


@pytest.mark.parametrize("B,G,d", [(5000, 1300, 9), (2048, 64, 3), (4096, 4000, 24)])
def test_kernel_matches_numpy(B, G, d):
    rng = np.random.default_rng(B + G + d)
    seg = np.sort(rng.integers(0, G, B))
    contrib = rng.standard_normal((B, d)).astype(np.float32)
    local, starts, maxp, Bp = build_sorted_plan(seg, G, tile_b=512)
    out = np.asarray(
        segment_sum_sorted(
            jnp.asarray(contrib),
            jnp.asarray(local),
            jnp.asarray(starts),
            G,
            maxp,
            tile_b=512,
            interpret=True,
        )
    )
    expect = _reference(seg, contrib, G)
    np.testing.assert_allclose(out[:G], expect[:G], atol=1e-4)


def test_kernel_multidim_tail():
    rng = np.random.default_rng(0)
    B, G = 3000, 700
    seg = np.sort(rng.integers(0, G, B))
    contrib = rng.standard_normal((B, 3, 3)).astype(np.float32)
    local, starts, maxp, Bp = build_sorted_plan(seg, G, tile_b=512)
    out = np.asarray(
        segment_sum_sorted(
            jnp.asarray(contrib),
            jnp.asarray(local),
            jnp.asarray(starts),
            G,
            maxp,
            tile_b=512,
            interpret=True,
        )
    )
    expect = _reference(seg, contrib.reshape(B, -1), G).reshape(G + 1, 3, 3)
    np.testing.assert_allclose(out[:G], expect[:G], atol=1e-4)


def test_unsorted_never_selects_pallas():
    rng = np.random.default_rng(1)
    seg = rng.integers(0, 5000, 8192)  # unsorted
    plan = red.build_reduce_plan(seg, 5000)
    assert plan.kind != "sorted"


def test_allow_pallas_false_falls_back():
    seg = np.sort(np.random.default_rng(2).integers(0, 5000, 8192))
    plan = red.build_reduce_plan(seg, 5000, allow_pallas=False)
    assert plan.kind in ("ell", "scatter")


def test_sorted_selected_on_tpu(monkeypatch):
    seg = np.sort(np.random.default_rng(3).integers(0, 5000, 8192))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    plan = red.build_reduce_plan(seg, 5000)
    assert plan.kind == "sorted"
    assert plan.seg_tiles is not None and plan.starts is not None


def test_sorted_plan_apply_reduce_interpret(monkeypatch):
    """apply_reduce through a sorted plan (interpret mode) equals the
    ELL plan's result."""
    rng = np.random.default_rng(4)
    B, G, d = 8192, 3000, 6
    seg = np.sort(rng.integers(0, G, B))
    contrib = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    plan_sorted = red.build_reduce_plan(seg, G)
    assert plan_sorted.kind == "sorted"
    plan_ell = red.build_reduce_plan(seg, G, allow_pallas=False)

    from ceres_tpu.ops import pallas_segment as ps

    out_sorted = np.asarray(
        ps.segment_sum_sorted(
            contrib,
            plan_sorted.seg_tiles,
            plan_sorted.starts,
            G,
            plan_sorted.maxp,
            plan_sorted.tile_b,
            interpret=True,
        )
    )
    out_ell = np.asarray(red.apply_reduce(plan_ell, contrib))
    np.testing.assert_allclose(out_sorted[:G], out_ell[:G], atol=1e-4)


# -- output-blocked variant (large G) ---------------------------------------

from ceres_tpu.ops.pallas_segment import (
    build_blocked_plan,
    segment_sum_sorted_blocked,
)

pytestmark = pytest.mark.tpu  # curated real-device subset (CERES_TPU_TESTS=1)


@pytest.mark.parametrize(
    "B,G,d,seg_block",
    [
        (20000, 15000, 3, 2048),   # many groups, small d (BA points)
        (8192, 9000, 9, 1024),     # gaps likely (G > B)
        (4096, 30000, 4, 512),     # very sparse coverage -> dummy tiles
    ],
)
def test_blocked_kernel_matches_numpy(B, G, d, seg_block):
    rng = np.random.default_rng(B + G + d)
    seg = np.sort(rng.integers(0, G, B))
    contrib = rng.standard_normal((B, d)).astype(np.float32)
    tiles, src, bof, lstart, maxp, S, nblk, Bp = build_blocked_plan(
        seg, G, tile_b=512, seg_block=seg_block
    )
    out = np.asarray(
        segment_sum_sorted_blocked(
            jnp.asarray(contrib),
            jnp.asarray(tiles),
            jnp.asarray(src),
            jnp.asarray(bof),
            jnp.asarray(lstart),
            G,
            maxp,
            S,
            nblk,
            Bp,
            tile_b=512,
            interpret=True,
        )
    )
    expect = _reference(seg, contrib, G)
    np.testing.assert_allclose(out[:G], expect[:G], atol=1e-4)


def test_blocked_kernel_duplicate_heavy():
    # one giant segment spanning many tiles + sparse rest
    rng = np.random.default_rng(3)
    B, G = 16384, 12000
    seg = np.concatenate(
        [np.zeros(6000, np.int64), np.sort(rng.integers(1, G, B - 6000))]
    )
    contrib = rng.standard_normal((B, 5)).astype(np.float32)
    tiles, src, bof, lstart, maxp, S, nblk, Bp = build_blocked_plan(
        seg, G, tile_b=512
    )
    out = np.asarray(
        segment_sum_sorted_blocked(
            jnp.asarray(contrib), jnp.asarray(tiles), jnp.asarray(src),
            jnp.asarray(bof), jnp.asarray(lstart), G, maxp, S, nblk, Bp,
            tile_b=512, interpret=True,
        )
    )
    expect = _reference(seg, contrib, G)
    np.testing.assert_allclose(out[:G], expect[:G], rtol=1e-4, atol=1e-3)


def test_blocked_selected_for_large_g(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    B, G = 40000, 20000
    seg = np.sort(np.random.default_rng(0).integers(0, G, B))
    plan = red.build_reduce_plan(seg, G)
    assert plan.kind == "sorted_blocked"
    assert plan.seg_block >= plan.maxp


def test_blocked_apply_reduce_interpret(monkeypatch):
    # Route apply_reduce through the blocked kernel in interpret mode.
    from ceres_tpu.ops import pallas_segment as ps

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    rng = np.random.default_rng(11)
    B, G = 20000, 15000
    seg = np.sort(rng.integers(0, G, B))
    plan = red.build_reduce_plan(seg, G)
    assert plan.kind == "sorted_blocked"
    orig = ps.segment_sum_sorted_blocked
    monkeypatch.setattr(
        ps,
        "segment_sum_sorted_blocked",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    contrib = rng.standard_normal((B, 3)).astype(np.float32)
    out = np.asarray(red.apply_reduce(plan, jnp.asarray(contrib)))
    expect = _reference(seg, contrib, G)
    np.testing.assert_allclose(out[:G], expect[:G], atol=1e-4)


# ---- unsorted full-table one-hot kernel (kind="onehot_tiled") ------------


@pytest.mark.parametrize("B,G,d", [(8192, 500, 81), (5000, 4000, 9)])
def test_onehot_tiled_matches_numpy(B, G, d):
    from ceres_tpu.ops.pallas_segment import (
        build_tiled_plan,
        segment_sum_onehot,
    )

    rng = np.random.default_rng(B + G + d)
    seg = rng.integers(0, G, B)  # deliberately UNSORTED
    contrib = rng.standard_normal((B, d)).astype(np.float32)
    tiles, Bp = build_tiled_plan(seg, G, tile_b=512)
    out = np.asarray(
        segment_sum_onehot(
            jnp.asarray(contrib),
            jnp.asarray(tiles),
            G,
            Bp,
            tile_b=512,
            interpret=True,
        )
    )
    expect = _reference(seg, contrib, G)
    np.testing.assert_allclose(out[:G], expect[:G], rtol=2e-6, atol=1e-4)


def test_onehot_tiled_selected_for_unsorted_medium_g(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    B, G = 40000, 2000
    seg = np.random.default_rng(3).integers(0, G, B)  # unsorted
    plan = red.build_reduce_plan(seg, G)
    assert plan.kind == "onehot_tiled"


def test_onehot_tiled_apply_reduce_interpret(monkeypatch):
    from ceres_tpu.ops import pallas_segment as ps

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    rng = np.random.default_rng(17)
    B, G = 20000, 900
    seg = rng.integers(0, G, B)
    plan = red.build_reduce_plan(seg, G)
    assert plan.kind == "onehot_tiled"
    orig = ps.segment_sum_onehot
    monkeypatch.setattr(
        ps,
        "segment_sum_onehot",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    contrib = rng.standard_normal((B, 5)).astype(np.float32)
    out = np.asarray(red.apply_reduce(plan, jnp.asarray(contrib)))
    expect = _reference(seg, contrib, G)
    np.testing.assert_allclose(out[:G], expect[:G], rtol=2e-6, atol=1e-4)


# ---- fused pair-outer + blocked reduce -----------------------------------


def test_outer_segment_sum_blocked_interpret(monkeypatch):
    """The fused W_a' Y_b + windowed-reduce kernel equals the reference
    per-pair outer products reduced with numpy."""
    from ceres_tpu.ops import pallas_segment as ps
    from ceres_tpu.ops import reduce as red2

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    rng = np.random.default_rng(23)
    K, T1, T2 = 3, 9, 9
    B, G = 30000, 12000
    seg = np.sort(rng.integers(0, G, B))
    plan = red2.build_reduce_plan(seg, G)
    assert plan.kind == "sorted_blocked"
    wg = rng.standard_normal((B, K * T1)).astype(np.float32)
    yg = rng.standard_normal((B, K * T2)).astype(np.float32)
    out = np.asarray(
        ps.outer_segment_sum_blocked(
            jnp.asarray(wg), jnp.asarray(yg), plan, K, T1, T2,
            interpret=True,
        )
    )
    # reference: per-row flat outer then segment sum in f64
    contrib = np.einsum(
        "bki,bkj->bij",
        wg.reshape(B, K, T1).astype(np.float64),
        yg.reshape(B, K, T2).astype(np.float64),
    ).reshape(B, T1 * T2)
    expect = np.zeros((G + 1, T1 * T2))
    np.add.at(expect, seg, contrib)
    np.testing.assert_allclose(out[:G], expect[:G], rtol=2e-5, atol=2e-4)
