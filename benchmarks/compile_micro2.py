"""Find a fast-compiling formulation of the large gathers.

compile_micro.py showed single gathers costing 5-22s of XLA codegen at
large-BAL shapes. This tries equivalent formulations of the two hot
patterns (corr-cell pair gather, ELL segment reduce) to find one the
TPU backend compiles quickly, and also measures RUN time (10 reps) so
we don't trade compile time for throughput.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = 1_200_000
NCAM = 464
C = 60_000
K = 40
rng = np.random.default_rng(0)


def timed(name, fn, *args):
    t0 = time.time()
    compiled = jax.jit(fn).lower(*args).compile()
    t_compile = time.time() - t0
    # run
    out = compiled(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(10):
        out = compiled(*args)
    jax.block_until_ready(out)
    t_run = (time.time() - t0) / 10
    try:
        mem = compiled.memory_analysis()
        extra = f" code={mem.generated_code_size_in_bytes/1e6:.0f}MB"
    except Exception:
        extra = ""
    print(f"{name:42s} compile {t_compile:6.1f}s  run {t_run*1e3:8.2f}ms{extra}",
          flush=True)


a_idx = jnp.asarray(rng.integers(0, B, size=(C, K)), jnp.int32)
W = jnp.ones((B + 1, 3, 9), jnp.float32)
Wflat = jnp.ones((B + 1, 27), jnp.float32)


def corr_orig(W, a_idx):
    Wa = W[a_idx]
    return -jnp.einsum("ckei,ckej->cij", Wa, Wa)


def corr_flat(Wf, a_idx):
    Wa = Wf[a_idx].reshape(C, K, 3, 9)
    return -jnp.einsum("ckei,ckej->cij", Wa, Wa)


def corr_flat1d(Wf, a_idx):
    Wa = Wf[a_idx.reshape(-1)].reshape(C, K, 3, 9)
    return -jnp.einsum("ckei,ckej->cij", Wa, Wa)


def corr_take(Wf, a_idx):
    Wa = jnp.take(Wf, a_idx.reshape(-1), axis=0,
                  indices_are_sorted=False).reshape(C, K, 3, 9)
    return -jnp.einsum("ckei,ckej->cij", Wa, Wa)


timed("corr orig (2d idx, (3,9) tail)", corr_orig, W, a_idx)
timed("corr flat tail (2d idx, 27)", corr_flat, Wflat, a_idx)
timed("corr flat tail + 1d idx", corr_flat1d, Wflat, a_idx)
timed("corr take 1d", corr_take, Wflat, a_idx)

# ELL segment reduce of (B, 81) into 465 groups, fan-in 2586
cam_seg = rng.integers(0, NCAM, size=B)
counts = np.bincount(cam_seg, minlength=NCAM)
kmax = int(counts.max())
ell = np.full((NCAM + 1, kmax), B, dtype=np.int32)
order = np.argsort(cam_seg, kind="stable")
ss = cam_seg[order]
starts = np.searchsorted(ss, np.arange(NCAM + 1))
rank = np.arange(B) - starts[ss]
ell[ss, rank] = order
ell_j = jnp.asarray(ell)
x81 = jnp.ones((B, 81), jnp.float32)


def ell_orig(x, ell):
    pad = jnp.zeros((1, 81), x.dtype)
    cp = jnp.concatenate([x, pad], axis=0)
    return cp[ell].sum(axis=1)


def ell_1didx(x, ell):
    pad = jnp.zeros((1, 81), x.dtype)
    cp = jnp.concatenate([x, pad], axis=0)
    g = cp[ell.reshape(-1)].reshape(NCAM + 1, kmax, 81)
    return g.sum(axis=1)


def onehot_matmul(x, seg):
    oh = (seg[None, :] == jnp.arange(NCAM + 1)[:, None]).astype(x.dtype)
    return oh @ x


def sort_scan(x, order_idx, seg_sorted):
    # gather rows in segment order, then segment-sum via cumsum+starts
    xs = x[order_idx]
    cs = jnp.cumsum(xs, axis=0)
    z = jnp.zeros((1, 81), x.dtype)
    csp = jnp.concatenate([z, cs], axis=0)
    st = jnp.asarray(starts, jnp.int32)
    return csp[jnp.concatenate([st[1:], jnp.asarray([B], jnp.int32)])] - csp[st]


seg_j = jnp.asarray(cam_seg, jnp.int32)
order_j = jnp.asarray(order, jnp.int32)
timed("ell orig (2d idx)", ell_orig, x81, ell_j)
timed("ell 1d idx", ell_1didx, x81, ell_j)
timed("onehot matmul f32", onehot_matmul, x81, seg_j)
timed("sort+cumsum segsum", sort_scan, x81, order_j, seg_j)


# scatter-add baseline
def scat(x, seg):
    out = jnp.zeros((NCAM + 1, 81), x.dtype)
    return out.at[seg].add(x)


timed("scatter-add", scat, x81, seg_j)
