"""Tile-size sweep for the sorted segment-sum kernels on BAL-like shapes.

3M contributions x 96 lanes reduced into 107k cells (the off-diagonal
correction) and 1.2M x 96 into 464 cells (the diagonal): measures the
Pallas block-CSR kernel at TILE_B in {1024, 2048, 4096} plus the raw
XLA gather-based perm for reference.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from ceres_tpu.ops import pallas_segment as ps


def timeit(f, *a, k=10):
    @jax.jit
    def run(eps, *args):
        def body(i, acc):
            aa = [
                x + (eps * acc).astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x
                for x in args
            ]
            o = f(*aa)
            leaves = [l for l in jax.tree_util.tree_leaves(o)
                      if jnp.issubdtype(l.dtype, jnp.floating)]
            return acc + eps * sum(
                jnp.sum(l[..., :1]).astype(jnp.float32) for l in leaves
            )
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    eps = jnp.float32(0)
    jax.block_until_ready(run(eps, *a))
    t0 = time.time()
    jax.block_until_ready(run(eps, *a))
    return (time.time() - t0) / k * 1e3


rng = np.random.default_rng(0)
for name, N, G in (("offdiag", 3_000_000, 107_416), ("diag", 1_200_000, 464)):
    seg = np.sort(rng.integers(0, G, N))
    contrib = jnp.asarray(
        rng.standard_normal((N, 81)).astype(np.float32)
    )
    for tile in (1024, 2048, 4096):
        try:
            local, starts, maxp, Bp = ps.build_sorted_plan(seg, G, tile)
            g_pad = -(-(G + 1 + maxp) // 8) * 8
            if g_pad <= 8192:
                fn = lambda c, l=jnp.asarray(local), s=jnp.asarray(starts), m=maxp, t=tile: (
                    ps.segment_sum_sorted(c, l, s, G, m, t)
                )
                kind = "sorted"
            else:
                tiles, src, bof, lstart, maxp_b, S, nblk, BpB = (
                    ps.build_blocked_plan(seg, G, tile)
                )
                fn = lambda c, a=jnp.asarray(tiles), b=jnp.asarray(src), \
                    d=jnp.asarray(bof), e=jnp.asarray(lstart), m=maxp_b, \
                    S_=S, nb=nblk, bp=BpB, t=tile: (
                    ps.segment_sum_sorted_blocked(
                        c, a, b, d, e, G, m, S_, nb, bp, t
                    )
                )
                kind = "blocked"
            ms = timeit(fn, contrib)
            print(f"{name} tile={tile} kind={kind} maxp={maxp}: "
                  f"{ms:8.2f} ms", flush=True)
        except Exception as ex:
            print(f"{name} tile={tile}: {type(ex).__name__}: {ex}",
                  flush=True)
