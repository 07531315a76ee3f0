"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated without TPU hardware the standard way:
`--xla_force_host_platform_device_count=8` (SURVEY.md §4). Must run before
jax is imported anywhere in the test process.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Force CPU regardless of the ambient platform. The axon sitecustomize
# registers the TPU platform at interpreter boot and prepends it to
# jax_platforms, so the env var alone is not enough.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall time is dominated by jit
# compiles of many distinct programs (measured: no test exceeds 40 s, but
# ~90 tests × compiles ≈ 15 min); cached re-runs drop most of it.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long integration tests (skipped unless RUN_SLOW=1)"
    )


def pytest_collection_modifyitems(config, items):
    """Default suite stays fast; `RUN_SLOW=1 pytest tests/` runs everything."""
    if os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow integration test; set RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def x64():
    """Enable float64 within a test (for scipy-oracle comparisons)."""
    with jax.enable_x64(True):
        yield


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop in-process jit/tracing caches at module boundaries.

    The full suite accumulates ~150 distinct compiled programs in one
    process; on some hosts XLA:CPU then segfaults compiling/deserializing
    a later program (measured 3/3 on this image at the same test, passing
    in isolation — crash sites: backend_compile, cache read AND cache
    write, i.e. accumulated process state, not one bad program). Clearing
    per module keeps the live executable count bounded; the persistent
    on-disk cache keeps re-compiles cheap.
    """
    yield
    jax.clear_caches()
