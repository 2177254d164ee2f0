"""Test configuration: force an 8-virtual-device CPU backend BEFORE jax
initializes, so multi-chip sharding paths are exercised without TPUs.

NOTE: this environment sets JAX_PLATFORMS=axon (a tunneled TPU) and the
plugin overrides the env var, so we must force the platform through
jax.config AFTER import — the env var alone is not honored.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The AOT executable cache cannot deserialize single-device executables
# under the 8-virtual-device CPU backend (deserialization binds to all
# local devices), so every load fails and recompiles with a warning —
# pure overhead in tests. test_aot_cache.py re-enables it explicitly.
os.environ.setdefault("BDM_AOT_CACHE", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA compiles dominate test runtime on small
# hosts; cache them across pytest invocations. Env-overridable so a pytest
# run can use a PRIVATE cache dir while a TPU bench owns the default one —
# two jax processes sharing this directory have crashed with SIGSEGV/
# SIGABRT read/write races (round-3 runbook note 6b).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("BDM_XLA_CACHE", "/tmp/bdm_tpu_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
