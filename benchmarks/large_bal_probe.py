"""Probe: large BAL throughput on the real TPU (VERDICT r2 item #2).

Usage: large_bal_probe.py [iterative|dense] [C P O]
"""
import sys, time
import jax, jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from ceres_tpu.models import bal
from ceres_tpu.fused_lm import fused_solve

ITERATIVE = (sys.argv[1] if len(sys.argv) > 1 else "iterative") == "iterative"
C, P, O = 464, 200_000, 1_200_000
if len(sys.argv) > 4:
    C, P, O = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
t0 = time.time()
prob = bal.synthesize_bal(num_cameras=C, num_points=P, num_observations=O,
                          noise=2.0, perturb=0.7, seed=7)
print(f"synthesize: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
problem, _, _ = bal.build_problem(prob)
opts = bal.default_options(iterative=ITERATIVE)
opts.max_num_iterations = 50
opts.function_tolerance = 1e-9
opts.evaluation_dtype = "float32"
print(f"build_problem: {time.time()-t0:.1f}s", flush=True)

warm = bal.default_options(iterative=ITERATIVE)
warm.max_num_iterations = 0
warm.function_tolerance = 1e-9
warm.evaluation_dtype = "float32"
t0 = time.time()
fused_solve(warm, problem)
print(f"compile: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
s = fused_solve(opts, problem)
dt = time.time() - t0
it = len(s.iterations)
print(f"solve: {dt:.3f}s, iters={it}, lin_iters={s.num_linear_solver_iterations}, "
      f"s/iter={dt/max(it,1)*1e3:.1f}ms, init={s.initial_cost:.4e}, final={s.final_cost:.4e}, "
      f"term={s.termination_type}", flush=True)
