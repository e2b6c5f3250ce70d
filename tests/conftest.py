"""Test configuration.

Tests run on CPU with a virtual 8-device platform so that sharding logic is
exercised without TPU hardware (mirrors the reference's multi-host
consistency checks, SURVEY.md §4).  Set ECLOOP_TEST_TPU=1 to run the suite
on real TPU devices instead.

Note: this environment pre-imports jax at interpreter startup (axon
sitecustomize), so JAX_PLATFORMS in the environment is already consumed;
we switch platforms via jax.config instead, which works because backends
initialize lazily.
"""

import os
import random

import pytest

if not os.environ.get("ECLOOP_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402

# Persistent compile cache only on TPU.  On XLA:CPU, reloading cached
# AOT executables trips a machine-feature check (+prefer-no-scatter /
# +prefer-no-gather pseudo-features) and intermittently SEGFAULTS the
# process; CPU per-op compiles are small (the suite runs the engines
# eagerly — see search/add._use_jit), so in-memory caching suffices.
if os.environ.get("ECLOOP_TEST_TPU"):
    jax.config.update("jax_compilation_cache_dir", "/tmp/ecloop_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return random.Random(1234)


@pytest.fixture(autouse=True, scope="module")
def _drop_jit_caches():
    """Free compiled executables between test modules.

    The eager CPU engines compile thousands of small per-op
    executables; each holds several memory mappings, and a full suite
    run walks past vm.max_map_count (65530 default) -> XLA:CPU
    segfaults mid-compile.  Dropping the in-memory jit caches per
    module bounds the mapping count (per-module warmup is seconds)."""
    yield
    jax.clear_caches()
