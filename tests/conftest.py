"""Test config: force a virtual 8-device CPU mesh before JAX initializes.

Distributed behavior (pjit/shard_map/psum) is tested on CPU with 8 virtual
host devices — the standard fake-backend trick (SURVEY.md §4) — so the suite
runs anywhere; real-TPU execution is covered by bench.py and the driver's
graft entry checks.

Environment quirk: this image's sitecustomize registers a remote-TPU PJRT
plugin in every Python process and force-sets ``jax_platforms`` to it via
``jax.config`` (so the JAX_PLATFORMS *env var* alone cannot override it, and
every first compile would go through a slow network tunnel). Resetting the
config here — before any backend initializes — routes the whole suite to
local CPU. Set SUPERDIFF_TPU_TEST_ON_TPU=1 to skip the override and run the
suite on the real accelerator instead.
"""

import os

import pytest
import jax

if not os.environ.get("SUPERDIFF_TPU_TEST_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# Persistent compile cache: the suite re-jits the same shapes across many
# tests and runs; single-core CPU compiles dominate wall time otherwise.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip(f"needs 8 devices, have {len(devs)}")
    return devs[:8]


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)
