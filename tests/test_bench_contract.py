"""The bench.py driver contract: exactly ONE JSON line on stdout, no
matter how the run dies.

Round 3's driver bench produced NO output (rc=124): the TPU backend was
down, the old retry loop re-paid full tracing at every halved batch, and
SIGTERM killed the process before the JSON emit was reached. These tests
pin the hardened behavior: failure classification (backend-init errors
don't retry; OOM does), immediate reporting, and signal safety.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


def _run(extra_args=(), env_extra=None, timeout=120):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env.update(env_extra or {})
    proc = subprocess.run(
        [sys.executable, BENCH, "--quick", "--precision", "no",
         *extra_args],
        capture_output=True, text=True, timeout=timeout, env=env)
    return proc


def _json_lines(stdout):
    out = []
    for line in stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            out.append(json.loads(line))
    return out


def test_classify_failure():
    sys.path.insert(0, os.path.dirname(BENCH))
    import bench
    assert bench.classify_failure(
        RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")
    ) == "unretryable"
    assert bench.classify_failure(AssertionError("x")) == "unretryable"
    assert bench.classify_failure(ImportError("x")) == "unretryable"
    assert bench.classify_failure(
        RuntimeError("RESOURCE_EXHAUSTED: out of memory")) == "retryable"
    assert bench.classify_failure(
        RuntimeError("Attempting to allocate 1.2G")) == "retryable"
    # unknown errors must NOT burn the budget retrying
    assert bench.classify_failure(RuntimeError("???")) == "unretryable"


def test_unretryable_reports_immediately_without_retry():
    t0 = time.monotonic()
    proc = _run(env_extra={"BDM_BENCH_FAIL": "unavailable"})
    assert proc.returncode == 0
    lines = _json_lines(proc.stdout)
    assert len(lines) == 1
    assert lines[0]["value"] == 0.0
    assert lines[0]["unit"] == "clouds/sec/chip"
    # exactly one attempt: no "attempt batch=4" in the log
    assert "attempt batch=8" in proc.stderr
    assert "attempt batch=4" not in proc.stderr
    assert time.monotonic() - t0 < 60


def test_oom_retries_with_halved_batch_then_reports():
    proc = _run(env_extra={"BDM_BENCH_FAIL": "oom"})
    assert proc.returncode == 0
    lines = _json_lines(proc.stdout)
    assert len(lines) == 1
    assert lines[0]["value"] == 0.0
    assert "attempt batch=8" in proc.stderr
    assert "attempt batch=4" in proc.stderr
    assert "attempt batch=1" in proc.stderr


def test_deadline_expiry_still_reports():
    proc = _run(extra_args=["--deadline", "35"],
                env_extra={"BDM_BENCH_FAIL": "hang"}, timeout=120)
    assert proc.returncode == 0
    lines = _json_lines(proc.stdout)
    assert len(lines) == 1
    assert lines[0]["value"] == 0.0
    assert "deadline" in proc.stderr


def test_sigterm_still_reports():
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env["BDM_BENCH_FAIL"] = "hang"
    proc = subprocess.Popen(
        [sys.executable, BENCH, "--quick", "--precision", "no"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
    time.sleep(5)  # let the supervisor install handlers + spawn worker
    proc.send_signal(signal.SIGTERM)
    stdout, stderr = proc.communicate(timeout=60)
    lines = _json_lines(stdout)
    assert len(lines) == 1, (stdout, stderr)
    assert lines[0]["value"] == 0.0
    assert lines[0]["unit"] == "clouds/sec/chip"


@pytest.mark.slow
def test_quick_bench_end_to_end_succeeds():
    proc = _run(timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = _json_lines(proc.stdout)
    assert len(lines) == 1
    assert lines[0]["value"] > 0
    assert lines[0]["unit"] == "clouds/sec/chip"
    assert "vs_baseline" in lines[0]


def test_worker_segfault_wipes_cache_and_retries_once(tmp_path):
    """A signal-killed worker (the corrupt-compile-cache segfault seen in
    round 4: jax crashed deserializing a half-written cache entry) gets
    ONE same-batch retry after the cache dir is wiped, then reports."""
    cache = tmp_path / "xla_cache"
    cache.mkdir()
    (cache / "entry").write_bytes(b"corrupt")
    proc = _run(env_extra={"BDM_BENCH_FAIL": "segv",
                           "BDM_COMPILE_CACHE_DIR": str(cache)})
    assert proc.returncode == 0
    lines = _json_lines(proc.stdout)
    assert len(lines) == 1
    assert lines[0]["value"] == 0.0
    assert "worker crashed" in lines[0]["error"]
    assert proc.stderr.count("attempt batch=8") == 2  # same batch, once
    assert "wiping" in proc.stderr
    assert not cache.exists()  # the corrupt cache was removed
