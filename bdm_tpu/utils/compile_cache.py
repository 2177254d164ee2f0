"""Persistent-compile-cache policy, in one place for every entry point.

Two hazards drove this module (round-4 verdict items #1 and #7):

* **Cross-process races**: two jax processes sharing one persistent cache
  directory have crashed each other (SIGSEGV reading / SIGABRT writing
  half-visible entries — round-3 runbook 6b). `setup_compile_cache` takes
  a non-blocking `flock` on `<dir>.lock`; the first process keeps the
  shared directory, any concurrent process is transparently redirected to
  a private `<dir>_pid<pid>` namespace (correct, just colder). The lock is
  held for the process lifetime and vanishes with it.

* **Giant-executable cache round-trip crash**: XLA:CPU's native
  serialize/deserialize of the milestone-scan executables corrupts the
  process heap (jax 0.9.0; full evidence in `_install_serialize_guard`).
  The guard keeps those modules out of the persistent cache in BOTH
  directions on the CPU backend; TPU executables round-trip through the
  PJRT plugin serializer and keep caching (a cold scan compile costs
  minutes through the remote helper — losing that cache would be far
  worse).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_LOCK_FD: Optional[int] = None  # held open for the process lifetime
_RESOLVED: Optional[str] = None  # directory chosen by the first setup call


def resolve_cache_dir() -> Optional[str]:
    """The configured cache directory, or None when disabled. Accepts both
    historical env names (BDM_COMPILE_CACHE_DIR from the CLIs/bench,
    BDM_XLA_CACHE from the test suite); "0" disables.

    The DEFAULT directory is split by platform: a CPU process (the test
    suite, `JAX_PLATFORMS=cpu` runs) and a TPU process share zero cache
    entries, so giving each platform its own shared directory lets a
    pytest run and a TPU bench run concurrently with both keeping their
    warm caches (same-dir concurrency would flock-redirect one of them to
    a cold private namespace). An explicit env var is honored verbatim."""
    d = os.environ.get("BDM_COMPILE_CACHE_DIR") or \
        os.environ.get("BDM_XLA_CACHE")
    if d is None:
        plat = str(getattr(jax.config, "jax_platforms", None) or "")
        d = "/tmp/bdm_tpu_xla_cache"
        if plat.startswith("cpu"):
            d += "_cpu"
    return None if d == "0" else d


def setup_compile_cache(min_compile_secs: float = 0.0) -> Optional[str]:
    """Point jax's persistent compilation cache at the shared directory,
    falling back to a private per-PID namespace if another live process
    already owns the shared one. Returns the directory in use (None when
    disabled). Idempotent per process.

    `min_compile_secs`: 0.0 for the CLIs/bench (the ~1,100 tiny host
    executables at ~0.4 s each dominate cold warmup — cache everything);
    the test suite passes 1.0 to skip thousands of tiny-entry writes.
    """
    global _LOCK_FD, _RESOLVED
    d = resolve_cache_dir()
    if d is None:
        return None
    if _RESOLVED is not None:
        d = _RESOLVED
    else:
        try:
            import fcntl
            fd = os.open(d + ".lock", os.O_CREAT | os.O_RDWR, 0o666)
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                _LOCK_FD = fd
            except OSError:
                os.close(fd)
                # another live process owns the shared namespace
                d = f"{d}_pid{os.getpid()}"
        except Exception:
            pass  # no fcntl (unlikely) — use the dir as-is
        _RESOLVED = d
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    # the AOT executable cache lives inside the same namespace so a
    # redirected process can't race the shared one there either
    os.environ.setdefault("BDM_AOT_CACHE_DIR", os.path.join(d, "aot"))
    _install_serialize_guard()
    return d


# Module-name prefix of the milestone scan programs (window scans, fused
# rolls, nstep fuse) — the executables whose persistent-cache round trips
# crash XLA:CPU (see _install_serialize_guard).
_RISKY_MODULE_PREFIX = "jit__jitted"


def _install_serialize_guard() -> None:
    """Exclude the milestone-scan executables from the persistent cache on
    the CPU backend — BOTH directions (round-4 verdict #1).

    Evidence trail (all on `pytest tests/ -q`, 8-virtual-device CPU):
      * cold cache, plain jax: `Fatal Python error: Aborted` INSIDE
        `executable.serialize()` of the big PNDM window scan
        (`compilation_cache.py:265`) — glibc catching heap damage in the
        act;
      * serialize quarantined to a forked child (entry still written):
        the parent SEGFAULTS ~1 test later serializing a trivial
        `jit__truncated_normal`;
      * warm cache (giants DESERIALIZED, never compiled or serialized
        in-process): the parent still segfaults on the next trivial
        serialize after the giant loads.
    So both the native serialize AND deserialize of these huge while-loop
    executables poison the process heap, and the victim is whichever
    serialize runs next. A Python try/except can catch neither. The only
    safe posture is to keep them out of the persistent cache entirely on
    CPU: reads miss (they recompile in-process, which has never crashed),
    writes are dropped. TPU executables round-trip through the PJRT
    plugin serializer and are unaffected; the tests' per-run cost is a
    handful of in-process scan compiles.

    Optional diagnostics: when BDM_CACHE_WRITE_LOG names a file, one
    fsynced line is appended per write attempt (module + RSS) before the
    native serialize runs, so an unguarded crash names its culprit.
    """
    from jax._src import compilation_cache as _cc
    from jax._src import compiler as _compiler
    if getattr(_cc, "_bdm_serialize_guarded", False):
        return
    real_put = _cc.put_executable_and_time
    real_read = _compiler._cache_read
    log_path = os.environ.get("BDM_CACHE_WRITE_LOG")

    def _log(line: str) -> None:
        if not log_path:
            return
        rss = "?"
        try:
            with open("/proc/self/status") as f:
                for ln in f:
                    if ln.startswith("VmRSS"):
                        rss = ln.split()[1] + "kB"
                        break
        except OSError:
            pass
        fd = os.open(log_path, os.O_CREAT | os.O_WRONLY | os.O_APPEND,
                     0o644)
        try:
            os.write(fd, f"{line} rss={rss}\n".encode())
            os.fsync(fd)
        finally:
            os.close(fd)

    def _risky(backend, module_name) -> bool:
        return (getattr(backend, "platform", None) == "cpu"
                and str(module_name).startswith(_RISKY_MODULE_PREFIX))

    def guarded_put(cache_key, module_name, executable, backend,
                    compile_time):
        _log(f"WRITE {module_name}")
        if _risky(backend, module_name):
            _log(f"DROP {module_name} (CPU scan executable)")
            return
        return real_put(cache_key, module_name, executable, backend,
                        compile_time)

    def guarded_read(module_name, cache_key, compile_options, backend,
                     executable_devices):
        if _risky(backend, module_name):
            _log(f"MISS {module_name} (CPU scan executable)")
            return None, None
        return real_read(module_name, cache_key, compile_options, backend,
                         executable_devices)

    _cc.put_executable_and_time = guarded_put
    _compiler._cache_read = guarded_read
    _cc._bdm_serialize_guarded = True
