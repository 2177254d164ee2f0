"""Serialized-executable cache: warm starts skip tracing AND lowering.

JAX's persistent compilation cache (jax_compilation_cache_dir) only skips
the XLA compile; every process still pays tracing + jaxpr->MLIR conversion
of the big window-scan programs, which costs ~60-90 s through the axon
remote-compile tunnel (measured: 44 s MLIR conversion for one production
window scan — see bench.py warmup analysis). This cache serializes the
COMPILED executable (`jax.experimental.serialize_executable`) to disk, so
a warm process deserializes in ~1 s and calls it directly with the dynamic
arguments.

Cache key = sha256 of:
  * a content hash of every .py file in the bdm_tpu package (any code
    change invalidates every entry),
  * jax version + backend + device kind + device count,
  * a caller-supplied static key describing the jitted function's static
    arguments (model configs, scheduler names, ...),
  * the dynamic arguments' treedef + per-leaf shape/dtype.

Robustness: every cache step degrades gracefully — a deserialization or
serialization failure (e.g. a PJRT plugin without executable-serialization
support) falls back to the plain jitted call, which still benefits from
the persistent XLA compile cache. Disable entirely with BDM_AOT_CACHE=0.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
import threading
from pathlib import Path
from typing import Any, Callable, Optional

import jax

logger = logging.getLogger(__name__)

_LOCK = threading.Lock()
_LOADED: dict = {}          # key -> compiled executable (per-process)
_SRC_HASH: Optional[str] = None


def _enabled() -> bool:
    return os.environ.get("BDM_AOT_CACHE", "1") != "0"


def cache_dir() -> Path:
    d = os.environ.get("BDM_AOT_CACHE_DIR",
                       "/tmp/bdm_tpu_xla_cache/aot")
    p = Path(d)
    p.mkdir(parents=True, exist_ok=True)
    return p


def _source_hash() -> str:
    """Content hash of the bdm_tpu package sources (cached per process)."""
    global _SRC_HASH
    if _SRC_HASH is None:
        import bdm_tpu
        root = Path(bdm_tpu.__file__).parent
        h = hashlib.sha256()
        for f in sorted(root.rglob("*.py")):
            h.update(str(f.relative_to(root)).encode())
            h.update(f.read_bytes())
        _SRC_HASH = h.hexdigest()[:16]
    return _SRC_HASH


def _dyn_signature(dyn_args: tuple) -> str:
    leaves, treedef = jax.tree_util.tree_flatten(dyn_args)
    sig = [str(treedef)]
    for leaf in leaves:
        shape = getattr(leaf, "shape", None)
        dtype = getattr(leaf, "dtype", type(leaf).__name__)
        # shardings are baked into the compiled executable — two same-shape
        # calls with different placements must not share an entry
        shard = getattr(leaf, "sharding", None)
        sig.append(f"{shape}:{dtype}:{shard}")
    return ";".join(sig)


_NON_GRAPH_FLAGS = ("BDM_AOT_CACHE", "BDM_AOT_CACHE_DIR",
                    "BDM_COMPILE_CACHE_DIR")


def _flag_signature() -> str:
    """Every BDM_* env flag except the cache controls participates in the
    key: flags like BDM_CONV_IMPL / BDM_INTERP change the
    traced graph without changing any source, and an A/B run must not be
    handed the other variant's executable."""
    return ",".join(f"{k}={v}" for k, v in sorted(os.environ.items())
                    if k.startswith("BDM_") and k not in _NON_GRAPH_FLAGS)


def _key(tag: str, static_key: str, dyn_args: tuple) -> str:
    dev = jax.devices()[0]
    parts = "\x00".join([
        tag, static_key, _source_hash(), _flag_signature(), jax.__version__,
        jax.default_backend(), dev.device_kind, str(jax.device_count()),
        _dyn_signature(dyn_args),
    ])
    return hashlib.sha256(parts.encode()).hexdigest()[:24]


def aot_call(fn: Callable, static_args: tuple, dyn_args: tuple, *,
             tag: str, static_key: str) -> Any:
    """Call jitted `fn(*static_args, *dyn_args)` through the cache.

    `fn` must be a `jax.jit`-wrapped function whose leading arguments are
    its static_argnums (the usual layout in this package). `static_key`
    must determine the traced graph together with the dynamic signature —
    include every config that shapes the computation.
    """
    if not _enabled():
        return fn(*static_args, *dyn_args)
    try:
        key = _key(tag, static_key, dyn_args)
    except Exception as e:  # unhashable arg structure — just run it
        logger.debug("aot_cache: keying failed for %s: %s", tag, e)
        return fn(*static_args, *dyn_args)

    with _LOCK:
        compiled = _LOADED.get(key)
    if compiled is not None:
        return compiled(*dyn_args)

    path = cache_dir() / f"{tag}-{key}.aot"
    if path.exists():
        try:
            from jax.experimental.serialize_executable import \
                deserialize_and_load
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            compiled = deserialize_and_load(payload, in_tree, out_tree)
            with _LOCK:
                _LOADED[key] = compiled
            logger.info("aot_cache: loaded %s", path.name)
            return compiled(*dyn_args)
        except Exception as e:
            logger.warning("aot_cache: load failed for %s (%s: %s) — "
                           "recompiling", path.name, type(e).__name__, e)

    try:
        # Per-compile TPU backend options (forwarded to the remote compile
        # helper as proto-backed flags — the client-side XLA_FLAGS parser
        # rejects TPU-only flag names). BDM_SCOPED_VMEM_KIB raises the
        # Mosaic scoped-vmem carve-out for executables whose kernels are
        # squeezed by the surrounding program (the devox=mm window scan
        # measured 16.06M vs the 16M default IN-GRAPH, while compiling
        # clean standalone).
        opts = {}
        kib = os.environ.get("BDM_SCOPED_VMEM_KIB")
        if kib and jax.default_backend() == "tpu":
            opts["xla_tpu_scoped_vmem_limit_kib"] = int(kib)
        compiled = fn.lower(*static_args, *dyn_args).compile(
            compiler_options=opts or None)
    except Exception as e:
        # AOT path unsupported for this call — plain dispatch
        logger.debug("aot_cache: lower/compile failed for %s (%s: %s)",
                     tag, type(e).__name__, e)
        return fn(*static_args, *dyn_args)
    with _LOCK:
        _LOADED[key] = compiled
    try:
        from jax.experimental.serialize_executable import serialize
        payload, in_tree, out_tree = serialize(compiled)
        tmp = path.with_suffix(".tmp%d" % os.getpid())
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        tmp.rename(path)
        logger.info("aot_cache: saved %s (%.1f MB)", path.name,
                    path.stat().st_size / 1e6)
    except Exception as e:
        logger.info("aot_cache: serialize unsupported for %s (%s: %s) — "
                    "in-memory only", tag, type(e).__name__, e)
    return compiled(*dyn_args)
