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
# hosts; cache them across pytest invocations. setup_compile_cache flock-
# guards the shared directory — if another live jax process (a TPU bench,
# a second pytest) owns it, this run is transparently redirected to a
# private per-PID namespace, so concurrent invocations cannot corrupt each
# other (two processes sharing the dir crashed with SIGSEGV/SIGABRT races,
# round-3 runbook 6b). Override the dir with BDM_XLA_CACHE; disable with =0.
from bdm_tpu.utils.compile_cache import setup_compile_cache  # noqa: E402

setup_compile_cache(min_compile_secs=1.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _rss_kb() -> int:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1])
    except OSError:
        pass
    return 0


_SHED_RSS_KB = int(os.environ.get("BDM_TEST_SHED_RSS_KB", 3_000_000))


@pytest.fixture(autouse=True)
def _shed_executable_state():
    """Free compiled-executable state when the process grows past ~3 GB.

    XLA:CPU segfaults NATIVELY — abort in `executable.serialize()`, later
    (with those writes fenced off) a segfault inside
    `backend_compile_and_load` itself — once the suite has accumulated
    thousands of live jitted executables: the same window-scan graphs
    compile fine early in the run (RSS 1.6-4.3 GB) and crash
    deterministically at the suite's high-water mark (RSS ~7 GB), while
    every crashing test passes in isolation. Dropping the jit and AOT
    executable caches between tests once RSS crosses the threshold keeps
    the process under the state level where the native crashes appear.
    The cost is recompiles for later tests (warmed by the persistent
    cache for everything but the fenced scan executables)."""
    yield
    if _rss_kb() > _SHED_RSS_KB:
        import gc

        from bdm_tpu.utils import aot_cache

        jax.clear_caches()
        with aot_cache._LOCK:
            aot_cache._LOADED.clear()
        gc.collect()
