"""Compile-time probe: which single ops cost tens of seconds to compile
at BAL scale? Each jit below is compiled with a distinct shape tweak to
dodge the persistent cache."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
P = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, P, size=(B,)), jnp.int32)
tab9 = jnp.asarray(rng.standard_normal((P + 1, 9)), jnp.float32)
tab27 = jnp.asarray(rng.standard_normal((P + 1, 27)), jnp.float32)
big = jnp.asarray(rng.standard_normal((B, 27)), jnp.float32)
perm = jnp.asarray(rng.permutation(B).astype(np.int32))


def probe(name, fn, *args):
    t0 = time.time()
    out = jax.jit(fn).lower(*args).compile()
    print(f"{name:44s} compile {time.time()-t0:7.1f}s", flush=True)


probe("row gather (P+1,9)[B]", lambda t, i: t[i] * 2.0, tab9, idx)
probe("row gather (P+1,27)[B]", lambda t, i: t[i] * 2.0, tab27, idx)
probe("row gather via take", lambda t, i: jnp.take(t, i, axis=0) * 2.0,
      tab27, idx)
probe("perm gather (B,27)[B]", lambda t, i: t[i] * 2.0, big, perm)
probe("two gathers + mult",
      lambda t, i, p: t[i] * big[p], tab27, idx, perm)
