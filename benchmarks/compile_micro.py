"""Which primitive owns the large-problem compile time?

Compiles individual reduce/gather/einsum primitives at the large-BAL
shapes (464 cam / 200k pt / 1.2M obs) and reports per-primitive XLA
compile seconds.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ceres_tpu.ops.reduce import build_reduce_plan, apply_reduce

B = 1_200_000
NCAM = 464
NPT = 200_000

rng = np.random.default_rng(0)
# observations sorted by point (the BAL builder's lexicographic order)
pt_seg = np.sort(rng.integers(0, NPT, size=B))
cam_seg = rng.integers(0, NCAM, size=B)


def timed(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    try:
        mem = compiled.memory_analysis()
        extra = (f" code={mem.generated_code_size_in_bytes/1e6:.0f}MB"
                 f" temp={mem.temp_size_in_bytes/1e9:.2f}GB")
    except Exception:
        extra = ""
    print(f"{name:36s} lower {t_lower:5.1f}s compile {t_compile:6.1f}s{extra}",
          flush=True)


t0 = time.time()
cam_plan = build_reduce_plan(cam_seg, NCAM)
pt_plan = build_reduce_plan(pt_seg, NPT)
print(f"plans: cam={cam_plan.kind} pt={pt_plan.kind} "
      f"({time.time()-t0:.1f}s)", flush=True)

x12 = jnp.ones((B, 12), jnp.float32)
x3 = jnp.ones((B, 3), jnp.float32)
x99 = jnp.ones((B, 9, 9), jnp.float32)
x33 = jnp.ones((B, 3, 3), jnp.float32)

timed("cam reduce (B,12)", lambda a: apply_reduce(cam_plan, a), x12)
timed("cam reduce (B,9,9)", lambda a: apply_reduce(cam_plan, a), x99)
timed("pt reduce (B,3)", lambda a: apply_reduce(pt_plan, a), x3)
timed("pt reduce (B,3,3)", lambda a: apply_reduce(pt_plan, a), x33)

# corr-cell gather+einsum at realistic shapes
C = 60_000
K = 40
a_idx = jnp.asarray(rng.integers(0, B, size=(C, K)), jnp.int32)
W = jnp.ones((B + 1, 3, 9), jnp.float32)


def corr(W, a_idx):
    Wa = W[a_idx]
    return -jnp.einsum("ckei,ckej->cij", Wa, Wa)


timed("corr gather+einsum (60k,40)", corr, W, a_idx)

# batched einsum (the F'F / W build primitive)
J9 = jnp.ones((B, 2, 9), jnp.float32)
J3 = jnp.ones((B, 2, 3), jnp.float32)
timed("einsum brt,bru->btu", lambda a, b: jnp.einsum("bri,brj->bij", a, b),
      J9, J9)
timed("einsum bre,brt->bet", lambda a, b: jnp.einsum("bre,brt->bet", a, b),
      J3, J9)

# the grid placement gather
inv = jnp.asarray(rng.integers(0, C, size=(NCAM, NCAM)), jnp.int32)
blocks = jnp.ones((C + 1, 9, 9), jnp.float32)


def grid(blocks, inv):
    g = blocks[inv]
    return g.transpose(0, 2, 1, 3).reshape(NCAM * 9, NCAM * 9)


timed("grid gather (464,464,9,9)", grid, blocks, inv)

# row gather (bd_pos style)
tab = jnp.ones((NCAM + 1, 12), jnp.float32)
pos = jnp.asarray(cam_seg, jnp.int32)
timed("row gather (B,) of (465,12)", lambda t, p: t[p], tab, pos)

# big elementwise / slice reshape chain (bucketed eval shape)
timed("reshape+mul (B,2,12)", lambda a: (a.reshape(B, 24) * 2.0).reshape(B, 2, 12),
      jnp.ones((B, 2, 12), jnp.float32))
