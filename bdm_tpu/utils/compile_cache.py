"""Persistent-compile-cache policy, in one place for every entry point.

Two hazards drove this module (round-4 verdict items #1 and #7):

* **Cross-process races**: two jax processes sharing one persistent cache
  directory have crashed each other (SIGSEGV reading / SIGABRT writing
  half-visible entries — round-3 runbook 6b). `setup_compile_cache` takes
  a non-blocking `flock` on `<dir>.lock`; the first process keeps the
  shared directory, any concurrent process is transparently redirected to
  a private `<dir>_pid<pid>` namespace (correct, just colder). The lock is
  held for the process lifetime and vanishes with it.

* **Giant-executable serializer crash**: XLA:CPU's
  `executable.serialize()` segfaulted deterministically (4/4) writing the
  multi-stream merging executable to the persistent cache mid-suite
  (jax 0.9.0 `compilation_cache.py:265`). `no_persistent_cache()` disables
  the persistent cache around exactly those compiles on the CPU backend;
  TPU executables serialize through the PJRT plugin and keep caching (a
  cold multi-stream compile costs ~10 min through the remote helper —
  losing that cache would be far worse than the write).
"""

from __future__ import annotations

import contextlib
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
# rolls, nstep fuse) — the only executables XLA:CPU's serializer has ever
# aborted on (round-4 multistream merging, round-5 the PNDM window scan
# mid-suite; both `Fatal Python error: Aborted` inside
# `compilation_cache.py:265 put_executable_and_time`).
_RISKY_MODULE_PREFIX = "jit__jitted"


def _install_serialize_guard() -> None:
    """Fence the persistent-cache write path against XLA:CPU's
    giant-executable serializer abort (round-4 verdict #1).

    `executable.serialize()` is native code that has aborted the whole
    process (suite-state-dependently, but reproducibly 4/4) on the big
    milestone-scan executables. A Python try/except cannot catch a native
    abort, so for those modules on the CPU backend the serialize is first
    *probed in a forked child*: the child runs serialize and `_exit(0)`;
    if it dies (signal, abort, alarm) the parent skips that one cache
    write and the suite keeps running — the executable stays usable
    in-memory, it just isn't persisted. TPU executables serialize through
    the PJRT plugin and are untouched.

    Optional diagnostics: when BDM_CACHE_WRITE_LOG names a file, one
    fsynced line is appended per write attempt (module + RSS) before the
    native serialize runs, so even an unguarded crash names its culprit.
    """
    from jax._src import compilation_cache as _cc
    if getattr(_cc, "_bdm_serialize_guarded", False):
        return
    real_put = _cc.put_executable_and_time
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

    def _probe_serialize(executable) -> bool:
        """True iff serialize() completes in a forked child."""
        try:
            pid = os.fork()
        except OSError:
            return True  # cannot probe — attempt the write unguarded
        if pid == 0:
            # child: bounded probe; _exit always (no atexit/teardown)
            import signal
            signal.alarm(180)  # a wedged fork (lock held at fork time)
            try:
                os.close(1)
                os.close(2)
                executable.serialize()
                os._exit(0)
            except BaseException:
                os._exit(1)
        _, status = os.waitpid(pid, 0)
        return os.waitstatus_to_exitcode(status) == 0

    def guarded_put(cache_key, module_name, executable, backend,
                    compile_time):
        _log(f"WRITE {module_name}")
        if (getattr(backend, "platform", None) == "cpu"
                and str(module_name).startswith(_RISKY_MODULE_PREFIX)):
            if not _probe_serialize(executable):
                _log(f"SKIP {module_name} (serializer probe died)")
                return
        return real_put(cache_key, module_name, executable, backend,
                        compile_time)

    _cc.put_executable_and_time = guarded_put
    _cc._bdm_serialize_guarded = True


@contextlib.contextmanager
def no_persistent_cache():
    """Disable the persistent compilation cache around a compile whose
    executable is known to crash XLA:CPU's serializer (the multi-stream
    samplers' S-duplicated graphs). No-op on non-CPU backends, and no-op
    for already-compiled signatures (jit's in-memory cache is unaffected
    — verified: toggling this flag does not invalidate jit keys)."""
    if jax.default_backend() != "cpu":
        yield
        return
    try:
        from jax._src import config as _jcfg
        ctx = _jcfg.enable_compilation_cache(False)
    except Exception:  # private API moved — run unguarded
        ctx = contextlib.nullcontext()
    with ctx:
        yield
