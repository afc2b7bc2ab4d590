"""Decompose the colnorms+scale / eval compile cost further.

compile_micro2 showed: ELL gathers and one-hot matmuls compile in ~1-3s,
but (B,T,T)->(B,T*T) reshapes and 2-D-index gathers blow up codegen.
Pin down each remaining suspect at large-BAL shapes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = 1_200_000
NPT = 200_000
NT = 9 * 464 + 3 * NPT  # 604176... actually 604176? compute
rng = np.random.default_rng(0)


def timed(name, fn, *args):
    t0 = time.time()
    compiled = jax.jit(fn).lower(*args).compile()
    t_compile = time.time() - t0
    try:
        mem = compiled.memory_analysis()
        extra = f" code={mem.generated_code_size_in_bytes/1e6:.0f}MB"
    except Exception:
        extra = ""
    print(f"{name:44s} compile {t_compile:6.1f}s{extra}", flush=True)


nt = 9 * 464 + 3 * NPT
x = jnp.ones((nt,), jnp.float32)
idx3 = jnp.asarray(
    np.stack([np.arange(NPT) * 3 + 9 * 464 + d for d in range(3)], 1),
    jnp.int32,
)  # (200k, 3)

# group_pad-style 2-D elementwise gather
timed("2d gather (200k,3) from (nt,)", lambda v, i: v[i], x, idx3)

# same as slice+reshape (contiguous layout)
timed("slice+reshape (200k,3)",
      lambda v: jax.lax.dynamic_slice(v, (9 * 464,), (3 * NPT,)).reshape(NPT, 3),
      x)

# ungroup scatter
g3 = jnp.ones((NPT + 1, 3), jnp.float32)


def ungroup(a, i):
    out = jnp.zeros((nt,), jnp.float32)
    return out.at[i].add(a[:NPT], mode="drop", unique_indices=True)


timed("ungroup scatter (200k,3)->(nt,)", ungroup, g3, idx3)

# reshape (B,9,9)->(B,81)
x99 = jnp.ones((B, 9, 9), jnp.float32)
timed("reshape (B,9,9)->(B,81)", lambda a: a.reshape(B, 81) * 2.0, x99)
x33 = jnp.ones((B, 3, 3), jnp.float32)
timed("reshape (B,3,3)->(B,9)", lambda a: a.reshape(B, 9) * 2.0, x33)

# einsum producing (B,9,9) then reshape (the block_jtj/ftf pattern)
J9 = jnp.ones((B, 2, 9), jnp.float32)


def einsum_reshape(a):
    X = jnp.einsum("bri,brj->bij", a, a)
    return X.reshape(B, 81) * 1.0


timed("einsum(B,2,9)->bij + reshape", einsum_reshape, J9)

# corr: (3,9) tail with 1-D indices, major-dim reshape only
C, K = 60_000, 40
a_idx = jnp.asarray(rng.integers(0, B, size=(C, K)), jnp.int32)
W = jnp.ones((B + 1, 3, 9), jnp.float32)


def corr_1d_noflat(W, a_idx):
    Wa = W[a_idx.reshape(-1)].reshape(C, K, 3, 9)  # major reshape: free
    return -jnp.einsum("ckei,ckej->cij", Wa, Wa)


timed("corr (3,9) tail, 1d idx", corr_1d_noflat, W, a_idx)


# corr via one flat dot_general: contract (K,e) jointly, no tail reshape
def corr_dotg(W, a_idx):
    Wa = W[a_idx.reshape(-1)].reshape(C, K * 3, 9)  # ALSO major-only? no:
    # (CK,3,9) -> (C,K*3,9) merges CK major dims then splits -> major only
    return -jax.lax.dot_general(
        Wa, Wa, (((1,), (1,)), ((0,), (0,))))


timed("corr dot_general (C,K*3,9)", corr_dotg, W, a_idx)

# row gather from a (B+1, 27) table with 1d idx then einsum WITHOUT
# unflatten: output (C, 27, 27) then slice blocks? just measure gather.
Wf = jnp.ones((B + 1, 27), jnp.float32)
timed("pure gather (CK,) rows of (B+1,27)",
      lambda Wf, i: Wf[i.reshape(-1)] * 2.0, Wf, a_idx)
timed("pure gather (CK,) rows of (B+1,3,9)",
      lambda W, i: W[i.reshape(-1)] * 2.0, W, a_idx)

# the eval bucket body at bucket=131072 (lax.map)
from ceres_tpu.models import bal as _bal


def snavely_jac(cam, pt, obs):
    def inst(c, p, o):
        def f(d):
            out = _bal.snavely_reprojection_residual(c + d[:9], p + d[9:], o)
            return out, out
        J, r = jax.jacfwd(f, has_aux=True)(jnp.zeros(12, cam.dtype))
        return r, J
    return jax.vmap(inst)(cam, pt, obs)


bk = 131072
cam_b = jnp.ones((bk, 9), jnp.float32)
pt_b = jnp.ones((bk, 3), jnp.float32)
obs_b = jnp.ones((bk, 2), jnp.float32)
timed("eval bucket vmap(jacfwd) 131072", snavely_jac, cam_b, pt_b, obs_b)
