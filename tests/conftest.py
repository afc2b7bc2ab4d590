"""Test configuration: run on a virtual 8-device CPU mesh.

Mirrors the reference's 1-vs-N-thread testing strategy (SURVEY.md §4.7):
tests compare single-device vs sharded execution on
xla_force_host_platform_device_count=8 virtual CPU devices.

Note: the environment's sitecustomize imports jax at interpreter startup
with JAX_PLATFORMS=axon, so the env var alone is too late — we must also
flip the already-imported config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables at module boundaries.

    A full-suite run accumulates ~1500 XLA:CPU executables in one
    process and deterministically segfaults inside
    backend_compile_and_load near the end (reproduced twice at the same
    collection index; every module passes in isolation). Dropping the
    executable caches between modules keeps the compiler state bounded.
    """
    yield
    jax.clear_caches()
