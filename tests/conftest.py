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

# persistent compile cache: fe/ecc graphs are large (hundreds of modmuls),
# caching keeps repeat test runs fast
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/ecloop_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return random.Random(1234)
