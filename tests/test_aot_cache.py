"""Serialized-executable cache (utils/aot_cache.py)."""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdm_tpu.utils import aot_cache


@functools.partial(jax.jit, static_argnums=(0,))
def _scaled_add(k, x, y):
    return x * k + y


@pytest.fixture()
def tmp_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("BDM_AOT_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("BDM_AOT_CACHE", "1")
    aot_cache._LOADED.clear()
    yield tmp_path
    aot_cache._LOADED.clear()


def test_save_load_roundtrip(tmp_cache):
    x = jnp.arange(8.0)
    y = jnp.ones(8)
    want = np.asarray(_scaled_add(3, x, y))
    got = aot_call = aot_cache.aot_call(_scaled_add, (3,), (x, y),
                                        tag="t", static_key="k3")
    np.testing.assert_array_equal(np.asarray(got), want)
    files = list(tmp_cache.glob("t-*.aot"))
    assert len(files) == 1, files
    # simulate a fresh process: drop the in-memory handle, load from disk
    aot_cache._LOADED.clear()
    got2 = aot_cache.aot_call(_scaled_add, (3,), (x, y),
                              tag="t", static_key="k3")
    np.testing.assert_array_equal(np.asarray(got2), want)
    assert len(list(tmp_cache.glob("t-*.aot"))) == 1


def test_key_separates_static_and_shapes(tmp_cache):
    x = jnp.arange(8.0)
    y = jnp.ones(8)
    a = aot_cache.aot_call(_scaled_add, (3,), (x, y), tag="t",
                           static_key="k3")
    b = aot_cache.aot_call(_scaled_add, (5,), (x, y), tag="t",
                           static_key="k5")
    np.testing.assert_array_equal(np.asarray(b),
                                  np.asarray(_scaled_add(5, x, y)))
    assert float(jnp.abs(a - b).max()) > 0
    # different shape -> third entry, not a wrong-shape reuse
    x2 = jnp.arange(16.0)
    c = aot_cache.aot_call(_scaled_add, (3,), (x2, jnp.ones(16)), tag="t",
                           static_key="k3")
    assert c.shape == (16,)
    assert len(list(tmp_cache.glob("t-*.aot"))) == 3


def test_disabled_env_falls_back(tmp_cache, monkeypatch):
    monkeypatch.setenv("BDM_AOT_CACHE", "0")
    x = jnp.arange(4.0)
    got = aot_cache.aot_call(_scaled_add, (2,), (x, x), tag="t",
                             static_key="k")
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(_scaled_add(2, x, x)))
    assert not list(tmp_cache.glob("*.aot"))


def test_corrupt_cache_file_recovers(tmp_cache):
    x = jnp.arange(8.0)
    y = jnp.zeros(8)
    aot_cache.aot_call(_scaled_add, (4,), (x, y), tag="t", static_key="k4")
    (f,) = tmp_cache.glob("t-*.aot")
    f.write_bytes(b"garbage")
    aot_cache._LOADED.clear()
    got = aot_cache.aot_call(_scaled_add, (4,), (x, y), tag="t",
                             static_key="k4")
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(_scaled_add(4, x, y)))


def test_graph_shaping_env_flags_change_the_key(monkeypatch):
    """BDM_* flags that reshape the traced graph (BDM_CONV_IMPL,
    BDM_SCOPED_VMEM_KIB, ...) must produce distinct cache keys; the cache-control
    flags must not."""
    from bdm_tpu.utils.aot_cache import _key

    args = (jnp.zeros((2, 3), jnp.float32),)
    base = _key("t", "s", args)
    monkeypatch.setenv("BDM_CONV_IMPL", "slab")
    assert _key("t", "s", args) != base
    monkeypatch.delenv("BDM_CONV_IMPL")
    monkeypatch.setenv("BDM_SCOPED_VMEM_KIB", "18432")
    assert _key("t", "s", args) != base
    monkeypatch.delenv("BDM_SCOPED_VMEM_KIB")
    monkeypatch.setenv("BDM_AOT_CACHE_DIR", "/tmp/elsewhere")
    assert _key("t", "s", args) == base
