"""Benchmark: BDM-Blending sampling throughput on one chip.

Prints ONE JSON line to stdout:
  {"metric": "...", "value": N, "unit": "clouds/sec/chip", "vs_baseline": N}

Measures the full coupled sampler (PC2 + PVD, DDPM 1000 steps, milestones
[1000,968,936,872,128,64,32,0], roll 16 — `example_sample_blending.sh`) at
4096 points with randomly-initialized production-size weights (throughput
is weight-independent). Runs under bf16 mixed precision — the production
configuration (`run.mixed_precision` defaults to bf16, mirroring the
reference's fp16-autocast default; pass --precision no for f32). Baseline:
the driver target of one 4096-pt cloud in <2 s/chip, i.e. 0.5 clouds/sec
(BASELINE.md; the reference publishes no wall-clock numbers).

Extras (stderr): per-executable compile logging (jax_log_compiles), an
on-device kernel self-check before timing (the Pallas scatter and conv are
only interpret-tested in CI — a Mosaic lowering regression must fail the
bench loudly, not publish wrong-but-fast numbers), and an MFU estimate
from XLA's cost analysis of the compiled window scan.

Robustness (the round-3 driver run died rc=124 with NO JSON emitted —
never again): the default invocation runs a lightweight SUPERVISOR that
executes the actual bench in a worker subprocess. The supervisor is pure
Python in a poll loop, so it can always react to SIGTERM/SIGINT and to
the --deadline (worker exceptions that strike while JAX is blocked inside
a native compile RPC cannot). Failures are classified:
  * retryable  (OOM / RESOURCE_EXHAUSTED): retry at half the batch, but
    only if the remaining deadline budget plausibly covers another
    attempt;
  * unretryable (backend init UNAVAILABLE, self-check assertion, import
    errors, anything else): emit the failure JSON IMMEDIATELY and exit 0.
The JSON line is emitted exactly once, no matter what — on success, on
first unrecoverable error, on deadline expiry, and from the SIGTERM/
SIGINT handlers and an atexit backstop (value 0.0 on total failure).
"""

import argparse
import atexit
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

MILESTONES = [1000, 968, 936, 872, 128, 64, 32, 0]
ROLL_STEP = 16
BASELINE_CLOUDS_PER_SEC = 0.5

# Worker exit codes for failure classification (supervisor protocol).
EXIT_RETRYABLE = 3
EXIT_UNRETRYABLE = 4

# bf16 peak TFLOPs per chip by device kind (public spec sheets)
_PEAK_TFLOPS = {
    "TPU v4": 275.0, "TPU v5": 459.0, "TPU v5p": 459.0,
    "TPU v5 lite": 197.0, "TPU v5e": 197.0, "TPU v6e": 918.0,
    "TPU v6 lite": 918.0,
}

_RETRYABLE_MARKERS = (
    "RESOURCE_EXHAUSTED", "out of memory", "OOM", "vmem",
    "Attempting to allocate",
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def classify_failure(exc):
    """'retryable' only for memory-pressure errors where a smaller batch
    can plausibly help; everything else (backend init UNAVAILABLE,
    self-check AssertionError, ImportError, ...) is 'unretryable' —
    re-paying ~25 min of tracing on those burned the whole round-3
    driver budget without ever reporting."""
    if isinstance(exc, (AssertionError, ImportError, KeyboardInterrupt)):
        return "unretryable"
    msg = f"{type(exc).__name__}: {exc}"
    if any(m in msg for m in _RETRYABLE_MARKERS):
        return "retryable"
    return "unretryable"


def kernel_self_check():
    """Assert the Pallas production kernels against XLA references ON THE
    REAL BACKEND at production-like shapes (CI covers interpret mode only)."""
    import jax
    import jax.numpy as jnp
    from bdm_tpu.ops.voxelize import make_voxel_context, \
        _scatter_sums_with_counts, _use_pallas_scatter
    if not _use_pallas_scatter():
        log("self-check: non-TPU backend, Pallas paths inactive — skipped")
        return
    from bdm_tpu.ops.pallas.conv3d import conv3d_pallas

    rng = np.random.default_rng(0)
    b, n, c, r = 2, 4096, 32, 32
    coords = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    ctx = make_voxel_context(coords, r)
    sums, counts = _scatter_sums_with_counts(feats, ctx, r ** 3)
    faug = jnp.concatenate([feats, jnp.ones((b, n, 1))], axis=-1)
    fs = jnp.take_along_axis(faug, ctx.order[..., None], axis=1)
    flat = (ctx.ids_sorted + jnp.arange(b)[:, None] * r ** 3).reshape(-1)
    want = jax.ops.segment_sum(fs.reshape(b * n, c + 1), flat,
                               num_segments=b * r ** 3,
                               indices_are_sorted=True
                               ).reshape(b, r ** 3, c + 1)
    np.testing.assert_allclose(np.asarray(sums), np.asarray(want[..., :c]),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(counts), np.asarray(want[..., c]),
                               rtol=0, atol=0.5)

    # padded-layout fused scatter (the wide stage-0 production path)
    from bdm_tpu.ops.voxelize import avg_voxelize_padded_ctx, \
        avg_voxelize_ctx
    pad = avg_voxelize_padded_ctx(feats, ctx, r, jnp.bfloat16)
    ref_grid = avg_voxelize_ctx(feats, ctx, r).reshape(b, r, r * r, c)
    np.testing.assert_allclose(np.asarray(pad[:, 0]), 0.0)
    np.testing.assert_allclose(np.asarray(pad[:, r + 1]), 0.0)
    np.testing.assert_allclose(
        np.asarray(pad[:, 1:r + 1].astype(jnp.float32)),
        np.asarray(ref_grid), rtol=3e-2, atol=3e-2)

    grid = jnp.asarray(
        rng.standard_normal((2, r, r, r, c)).astype(np.float32))
    k = jnp.asarray((rng.standard_normal((3, 3, 3, c, c)) * 0.1)
                    .astype(np.float32))
    bias = jnp.zeros((c,), jnp.float32)
    dn = jax.lax.conv_dimension_numbers(grid.shape, k.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    ref = jax.lax.conv_general_dilated(
        grid, k, (1, 1, 1), "SAME", dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST) + bias
    scale = float(jnp.abs(ref).max())
    from bdm_tpu.ops.pallas.conv3d import conv3d_ms_pallas
    errs = {}
    for nm, fn in (("slab", conv3d_pallas), ("ms", conv3d_ms_pallas)):
        got = fn(grid, k, bias, r)
        err = float(jnp.abs(got.astype(jnp.float32) - ref).max())
        assert err < 0.05 * scale + 0.05, (nm, err, scale)
        errs[nm] = err
    log(f"self-check passed: scatter == segsum, padded scatter == pad, "
        f"conv3d max-err {errs} (scale {scale:.3g})")


def estimate_mfu(pc2, pc2_params, batch, points, seconds_per_step):
    """MFU from XLA's cost analysis of ONE compiled denoise step."""
    import jax
    import jax.numpy as jnp
    try:
        x = jnp.zeros((batch["image"].shape[0], points, 3), jnp.float32)
        if jax.default_backend() in ("tpu", "axon"):
            # the TPU lowering returns no client-side cost analysis,
            # compiling just for it trips the remote helper's size limit
            # (HTTP 413), and even the MLIR conversion alone costs ~2 min
            # through the tunnel; use the CPU-HLO count of the SAME graph
            # (re-measured r4: 750.7 GFLOP bf16 / 749.4 f32 at batch 8,
            # N=4096, production specs — re-run the CPU cost_analysis
            # below when the graph changes)
            flops = 7.507e11 * (x.shape[0] / 8.0)
        else:
            cond_map = pc2.conditioning_map(pc2_params, batch["image"])
            t = jnp.zeros((x.shape[0],), jnp.int32)
            fn = jax.jit(lambda p, x, t: pc2.denoise(
                p, x, t, batch["camera"], cond_map))
            ca = fn.lower(pc2_params, x, t).cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) if ca else 0.0
        if not flops:
            flops = 7.507e11 * (x.shape[0] / 8.0)
        kind = jax.devices()[0].device_kind
        peak = _PEAK_TFLOPS.get(kind)
        achieved = flops / seconds_per_step / 1e12
        if peak:
            log(f"MFU: {flops/1e9:.1f} GFLOP/denoise, {achieved:.2f} "
                f"TFLOP/s achieved vs {peak:.0f} peak ({kind}) = "
                f"{100*achieved/peak:.1f}%")
        else:
            log(f"MFU: {flops/1e9:.1f} GFLOP/denoise, {achieved:.2f} "
                f"TFLOP/s achieved ({kind}: peak unknown)")
    except Exception as e:  # diagnostics only — never fail the bench
        log(f"MFU estimate unavailable: {type(e).__name__}: {e}")


def run_once(batch_size, points, repeats, quick, precision,
             precontract=False, sampler="blending"):
    import jax
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        # the axon TPU plugin ignores the env var; honor it explicitly so
        # `JAX_PLATFORMS=cpu python bench.py --quick` really runs on CPU
        jax.config.update("jax_platforms", plat)
    # persistent compile cache: the ~5 big window-scan executables cost
    # ~10 min each to compile cold through the remote compile helper;
    # cached reruns skip that entirely. flock-guarded: a concurrent jax
    # process is redirected to a per-PID namespace (compile_cache.py).
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bdm_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache(min_compile_secs=0.0)
    jax.config.update("jax_log_compiles", True)  # per-executable timings
    from bdm_tpu.samplers import PC2Model, ProjectionConfig, PVDModel, \
        bdm_blending
    from bdm_tpu.samplers.merging import bdm_merging
    from __graft_entry__ import _synthetic_batch

    blocks = {}
    if quick:
        from tests.test_models import TINY_FP, TINY_SA
        cfg = ProjectionConfig(image_size=16,
                               image_feature_model="identity",
                               raster_point_radius=0.3,
                               point_cloud_model_embed_dim=8,
                               mixed_precision=precision,
                               precontract=precontract)
        blocks = {"sa_blocks": TINY_SA, "fp_blocks": TINY_FP}
        pc2 = PC2Model(cfg, **blocks)
        pvd = PVDModel(embed_dim=8, mixed_precision=precision, **blocks)
        points, milestones, roll, steps = 64, [8, 6, 2, 0], 2, 8
    else:
        kernel_self_check()
        pc2 = PC2Model(ProjectionConfig(mixed_precision=precision,
                                        precontract=precontract))
        pvd = PVDModel(mixed_precision=precision)
        milestones, roll, steps = MILESTONES, ROLL_STEP, 1000

    key = jax.random.PRNGKey(0)
    log(f"init params (batch={batch_size}, points={points}, "
        f"precision={precision}, sampler={sampler})...")
    pc2_params = pc2.init_params(key, num_points=1024)
    pvd_params = pvd.init_params(key, num_points=1024)
    if sampler == "merging":
        from bdm_tpu.samplers.merging import BDMMergingModel
        merge_model = BDMMergingModel(pc2=pc2, **blocks)
        merge_params = merge_model.init_params(jax.random.PRNGKey(3),
                                               num_points=1024)

    rng = np.random.default_rng(0)
    batch = _synthetic_batch(batch_size, points, pc2.cfg.image_size, rng)

    # NOTE: deliberately NOT one outer jit: the milestone loop is a static
    # Python loop over jitted scans cached by window LENGTH (3 distinct
    # lengths in the canonical schedule), so warmup compiles ~5 programs
    # instead of one giant 14-segment graph.
    if sampler == "merging":
        def run(k):
            return bdm_merging(merge_model, merge_params, pc2, pc2_params,
                               pvd, pvd_params, batch, k,
                               num_points=points, milestones=milestones,
                               roll_step=roll, scheduler="ddpm",
                               num_inference_steps=steps)
    else:
        def run(k):
            return bdm_blending(pc2, pc2_params, pvd, pvd_params, batch, k,
                                num_points=points, milestones=milestones,
                                roll_step=roll, scheduler="ddpm",
                                num_inference_steps=steps)

    log("warmup (compiles the window scans)...")
    t0 = time.perf_counter()
    out = run(jax.random.PRNGKey(1))
    out.block_until_ready()
    log(f"warmup done in {time.perf_counter() - t0:.1f}s")
    assert bool(np.isfinite(np.asarray(out)).all()), "non-finite output"

    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        out = run(jax.random.PRNGKey(2 + i))
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
        log(f"run {i}: {times[-1]:.2f}s")

    if not quick and sampler == "blending":
        # ~1160 denoise evals per run (1000 main-path + coupled rolls);
        # the FLOP constant is the pc2 denoise graph, so the estimate is
        # blending-only (merging adds fusion-network forwards)
        n_evals = (milestones[0] - milestones[-1]) + \
            2 * roll * (len(milestones) - 3)
        estimate_mfu(pc2, pc2_params, batch, points,
                     min(times) / n_evals)
    return batch_size / min(times), points, steps


def make_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--points", type=int, default=4096)
    parser.add_argument("--repeats", type=int, default=2)
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--precision", default="bf16",
                        choices=["bf16", "no"])
    parser.add_argument("--sampler", default="blending",
                        choices=["blending", "merging"],
                        help="which coupled sampler to measure (BDM-B is "
                             "the headline; BDM-M adds the learned fusion "
                             "network forward at interior milestones)")
    parser.add_argument("--precontract", action="store_true",
                        help="tap-precontraction path (lost the r3 A/B; "
                             "kept for chips where the balance may flip)")
    parser.add_argument("--deadline", type=float,
                        default=float(os.environ.get(
                            "BDM_BENCH_DEADLINE", 9000.0)),
                        help="wall-clock budget in seconds; the supervisor "
                             "stops retrying (and reports) before it runs "
                             "out")
    parser.add_argument("--worker", action="store_true",
                        help=argparse.SUPPRESS)  # internal: one attempt,
    # no retry, JSON to stdout; exit 3 retryable / 4 unretryable
    return parser


def result_json(clouds_per_sec, points, steps, batch, sampler="blending"):
    sdesc = f"batch {batch}"
    name = "BDM-Blending" if sampler == "blending" else "BDM-Merging"
    return {
        "metric": f"{name} sampling throughput "
                  f"({points} pts, DDPM {steps} steps, {sdesc}, "
                  "1 chip)",
        "value": round(clouds_per_sec, 4),
        "unit": "clouds/sec/chip",
        "vs_baseline": round(clouds_per_sec / BASELINE_CLOUDS_PER_SEC, 4),
    }


def _maybe_inject_failure():
    """Test hook: BDM_BENCH_FAIL simulates the round-3 failure modes so
    the supervisor protocol is testable without a TPU (see
    tests/test_bench_contract.py)."""
    mode = os.environ.get("BDM_BENCH_FAIL")
    if not mode:
        return
    if mode == "unavailable":
        raise RuntimeError(
            "Unable to initialize backend 'axon': UNAVAILABLE: "
            "injected test failure")
    if mode == "oom":
        raise RuntimeError("RESOURCE_EXHAUSTED: injected test failure")
    if mode == "assert":
        raise AssertionError("injected self-check failure")
    if mode == "hang":
        time.sleep(3600)
    if mode == "segv":
        # simulate the corrupt-compile-cache crash (jax segfaults
        # deserializing a half-written cache entry)
        os.kill(os.getpid(), signal.SIGSEGV)
    raise ValueError(f"unknown BDM_BENCH_FAIL={mode}")


def worker_main(args):
    """One attempt; classification via exit code. Runs in a subprocess so
    the supervisor stays responsive even if this blocks in native code."""
    try:
        _maybe_inject_failure()
        clouds_per_sec, points, steps = run_once(
            args.batch, args.points, args.repeats, args.quick,
            args.precision, args.precontract, args.sampler)
    except BaseException as e:  # noqa: BLE001 — classify everything
        kind = classify_failure(e)
        log(f"bench worker failed at batch={args.batch} ({kind}): "
            f"{type(e).__name__}: {e}")
        return EXIT_RETRYABLE if kind == "retryable" else EXIT_UNRETRYABLE
    print(json.dumps(result_json(clouds_per_sec, points, steps,
                                 args.batch, args.sampler)),
          flush=True)
    return 0


class Supervisor:
    """Owns the one-JSON-line contract. Pure-Python poll loop; never
    enters JAX, so SIGTERM/deadline handling cannot be blocked by a
    stuck compile RPC."""

    def __init__(self, args):
        self.args = args
        self.t_start = time.monotonic()
        self.emitted = False
        self.child = None
        # fallback result if nothing better is ever produced
        self.failure = result_json(0.0, args.points,
                                   8 if args.quick else 1000, args.batch,
                                   args.sampler)
        atexit.register(self.emit, None)
        for sig in (signal.SIGTERM, signal.SIGINT):
            signal.signal(sig, self._on_signal)

    def remaining(self):
        return self.args.deadline - (time.monotonic() - self.t_start)

    def emit(self, result, error=None):
        if self.emitted:
            return
        self.emitted = True
        if result is None:
            result = dict(self.failure)
            if error:
                result["error"] = error
        print(json.dumps(result), flush=True)

    def _on_signal(self, signum, frame):
        log(f"supervisor: caught signal {signum}, reporting and exiting")
        if self.child is not None and self.child.poll() is None:
            self.child.terminate()
        self.emit(None, error=f"killed by signal {signum} mid-run")
        os._exit(0)

    def _wait_for_backend(self):
        """Pre-gate: a wedged terminal (an orphaned giant compile on the
        remote helper — r5 diagnosis, ARCHITECTURE.md) makes backend init
        hang or fail UNAVAILABLE for minutes and then heal on its own.
        Probe `jax.devices()` in a subprocess (a hung init can't block
        the supervisor's signal handling) and wait out the wedge before
        spending the attempt budget: bounded to <=1h of probing, always
        leaving >=25 min for a real attempt, and always falling through
        to one attempt so the worker's own error is what gets reported
        if the backend never comes back."""
        t_gate = time.monotonic()
        probe = "import jax; jax.devices(); print('backend-up')"
        first = True
        while True:
            try:
                r = subprocess.run([sys.executable, "-c", probe],
                                   timeout=120.0, capture_output=True,
                                   text=True)
                if r.returncode == 0 and "backend-up" in r.stdout:
                    if not first:
                        log("supervisor: backend recovered after "
                            f"{time.monotonic() - t_gate:.0f}s")
                    return
            except subprocess.TimeoutExpired:
                pass
            if (time.monotonic() - t_gate > 3600.0
                    or self.remaining() <= 1500.0):
                log("supervisor: backend still unavailable after the "
                    "probe window — attempting anyway so the failure is "
                    "reported from the worker")
                return
            first = False
            log("supervisor: backend unavailable (terminal recovering?) "
                "— re-probing in 45s")
            time.sleep(45.0)

    def attempt(self, batch):
        """Run one worker attempt; returns (status, json_or_None).
        status in {'ok', 'retryable', 'unretryable', 'deadline'}."""
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               "--batch", str(batch), "--points", str(self.args.points),
               "--repeats", str(self.args.repeats),
               "--sampler", self.args.sampler,
               "--precision", self.args.precision]
        if self.args.quick:
            cmd.append("--quick")
        if self.args.precontract:
            cmd.append("--precontract")
        log(f"supervisor: attempt batch={batch}, "
            f"{self.remaining():.0f}s of budget left")
        self.child = subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=None, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        # Drain stdout from a thread so the pipe can't fill and block.
        import threading
        lines = []

        def _drain():
            for line in self.child.stdout:
                lines.append(line)
        th = threading.Thread(target=_drain, daemon=True)
        th.start()
        while True:
            rc = self.child.poll()
            if rc is not None:
                break
            if self.remaining() <= 30.0:
                log("supervisor: deadline reached, killing worker")
                self.child.terminate()
                try:
                    self.child.wait(timeout=15)
                except subprocess.TimeoutExpired:
                    self.child.kill()
                return "deadline", None
            time.sleep(2.0)
        th.join(timeout=10)
        if rc == 0:
            for line in reversed(lines):
                line = line.strip()
                if line.startswith("{"):
                    try:
                        return "ok", json.loads(line)
                    except json.JSONDecodeError:
                        pass
            log("supervisor: worker exited 0 but printed no JSON")
            return "unretryable", None
        if rc == EXIT_RETRYABLE:
            return "retryable", None
        if rc is not None and rc < 0:
            # killed by a signal (rc = -signum). SIGSEGV/SIGABRT here has
            # one known recoverable cause: a corrupt entry in the
            # persistent compile cache (jax segfaults deserializing it —
            # observed when an earlier run died mid-write). Report it as
            # its own class so run() can wipe the cache and retry once.
            return "crashed", None
        return "unretryable", None

    def run(self):
        self._wait_for_backend()
        batch = self.args.batch
        crash_retried = False
        while batch >= 1:
            t0 = time.monotonic()
            status, result = self.attempt(batch)
            attempt_cost = time.monotonic() - t0
            if status == "ok":
                self.emit(result)
                return 0
            if status == "crashed":
                # one cache-wipe retry at the SAME batch: a corrupt
                # compile cache is recoverable, but the retry re-pays the
                # full cold compile — only attempt it with real budget
                if not crash_retried and self.remaining() > 420.0:
                    crash_retried = True
                    import shutil
                    cache = os.environ.get("BDM_COMPILE_CACHE_DIR",
                                           "/tmp/bdm_tpu_xla_cache")
                    log(f"supervisor: worker died on a signal — wiping "
                        f"{cache} (corrupt-cache suspicion) and retrying "
                        f"batch {batch} once")
                    shutil.rmtree(cache, ignore_errors=True)
                    continue
                self.emit(None, error=f"worker crashed at batch {batch}"
                          " (signal; see stderr)")
                return 0
            if status in ("unretryable", "deadline"):
                self.emit(None, error=f"{status} failure at batch {batch}"
                          " (see stderr)")
                return 0
            # retryable: only retry if the budget plausibly covers a
            # full re-trace + run (assume the retry costs about as much
            # as the failed attempt, plus margin)
            batch //= 2
            if batch >= 1 and self.remaining() < attempt_cost + 120.0:
                log(f"supervisor: {self.remaining():.0f}s left < retry "
                    f"estimate {attempt_cost:.0f}s — reporting failure "
                    "instead of retrying")
                self.emit(None, error="deadline too close to retry OOM")
                return 0
        self.emit(None, error="all batch sizes failed (OOM-class)")
        return 0


def main():
    args = make_parser().parse_args()
    if args.worker:
        return worker_main(args)
    return Supervisor(args).run()


if __name__ == "__main__":
    sys.exit(main())
