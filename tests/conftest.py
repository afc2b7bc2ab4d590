"""Test configuration: run on a virtual 8-device CPU mesh.

Mirrors the reference's 1-vs-N-thread testing strategy (SURVEY.md §4.7):
tests compare single-device vs sharded execution on
xla_force_host_platform_device_count=8 virtual CPU devices.

Note: the environment's sitecustomize imports jax at interpreter startup
with JAX_PLATFORMS=axon, so the env var alone is too late — we must also
flip the already-imported config.

TPU mode (the analog of the reference's CUDA-vs-CPU equivalence tests,
cuda_dense_cholesky_test.cc / cuda_vector_test.cc): set
``CERES_TPU_TESTS=1`` to leave the real accelerator platform active and
run the curated device subset, e.g.

    CERES_TPU_TESTS=1 python -m pytest tests/ -q -m tpu

Tests that require the 8-device virtual CPU mesh are marked
``needs_mesh`` and auto-skip in TPU mode.
"""

import os

_TPU_MODE = os.environ.get("CERES_TPU_TESTS", "") == "1"

if not _TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
else:
    # Persistent compile cache: TPU compiles cost 20-40s each through
    # the tunnel; cache them across runs.
    _repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(_repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: curated subset meant to run on the real TPU "
        "(CERES_TPU_TESTS=1 pytest -m tpu)")
    config.addinivalue_line(
        "markers", "needs_mesh: requires the 8-device virtual CPU mesh; "
        "skipped in TPU mode")
    config.addinivalue_line(
        "markers", "slow: long-running tier (torture/fuzz/large-scale); "
        "skipped by default, run with --runslow or CERES_RUN_SLOW=1")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (the full tier; default run <5 min)")


def pytest_collection_modifyitems(config, items):
    if _TPU_MODE:
        skip_mesh = pytest.mark.skip(
            reason="needs 8-device virtual CPU mesh; running on 1 TPU chip")
        for item in items:
            if "needs_mesh" in item.keywords:
                item.add_marker(skip_mesh)
    run_slow = (
        config.getoption("--runslow")
        or os.environ.get("CERES_RUN_SLOW", "") == "1"
    )
    if not run_slow:
        skip_slow = pytest.mark.skip(
            reason="slow tier; use --runslow (or CERES_RUN_SLOW=1)")
        for item in items:
            if "slow" in item.keywords:
                item.add_marker(skip_slow)


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
