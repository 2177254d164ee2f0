"""Benchmark: BDM-Blending sampling throughput on one chip.

Prints ONE JSON line to stdout:
  {"metric": "...", "value": N, "unit": "clouds/sec/chip", "vs_baseline": N}

Measures the full coupled sampler (PC2 + PVD, DDPM 1000 steps, milestones
[1000,968,936,872,128,64,32,0], roll 16 — `example_sample_blending.sh`) at
4096 points with randomly-initialized production-size weights (throughput
is weight-independent). Baseline: the driver target of one 4096-pt cloud in
<2 s/chip, i.e. 0.5 clouds/sec (BASELINE.md; the reference publishes no
wall-clock numbers).

Robustness: progress goes to stderr; on a failure the bench retries at a
smaller batch, and it always emits a JSON line (value 0.0 on total failure).
"""

import argparse
import json
import sys
import time

import numpy as np

MILESTONES = [1000, 968, 936, 872, 128, 64, 32, 0]
ROLL_STEP = 16
BASELINE_CLOUDS_PER_SEC = 0.5


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def run_once(batch_size, points, repeats, quick):
    import jax
    # persistent compile cache: the ~4 big window-scan executables cost
    # ~40 s each to compile cold; cached reruns skip that entirely
    jax.config.update("jax_compilation_cache_dir", "/tmp/bdm_tpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    from bdm_tpu.samplers import PC2Model, ProjectionConfig, PVDModel, \
        bdm_blending
    from __graft_entry__ import _synthetic_batch

    if quick:
        from tests.test_models import TINY_FP, TINY_SA
        cfg = ProjectionConfig(image_size=16,
                               image_feature_model="identity",
                               raster_point_radius=0.3,
                               point_cloud_model_embed_dim=8)
        pc2 = PC2Model(cfg, sa_blocks=TINY_SA, fp_blocks=TINY_FP)
        pvd = PVDModel(embed_dim=8, sa_blocks=TINY_SA, fp_blocks=TINY_FP)
        points, milestones, roll, steps = 64, [8, 6, 2, 0], 2, 8
    else:
        pc2 = PC2Model()
        pvd = PVDModel()
        milestones, roll, steps = MILESTONES, ROLL_STEP, 1000

    key = jax.random.PRNGKey(0)
    log(f"init params (batch={batch_size}, points={points})...")
    pc2_params = pc2.init_params(key, num_points=1024)
    pvd_params = pvd.init_params(key, num_points=1024)

    rng = np.random.default_rng(0)
    batch = _synthetic_batch(batch_size, points, pc2.cfg.image_size, rng)

    # NOTE: deliberately NOT one outer jit: the milestone loop is a static
    # Python loop over jitted scans cached by window LENGTH (3 distinct
    # lengths in the canonical schedule), so warmup compiles ~5 programs
    # instead of one giant 14-segment graph.
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

    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        out = run(jax.random.PRNGKey(2 + i))
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
        log(f"run {i}: {times[-1]:.2f}s")
    return batch_size / min(times), points, steps


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--points", type=int, default=4096)
    parser.add_argument("--repeats", type=int, default=2)
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()

    clouds_per_sec, points, steps = 0.0, args.points, 1000
    batch = args.batch
    while batch >= 1:
        try:
            clouds_per_sec, points, steps = run_once(
                batch, args.points, args.repeats, args.quick)
            break
        except Exception as e:
            log(f"bench failed at batch={batch}: {type(e).__name__}: {e}")
            batch //= 2

    result = {
        "metric": "BDM-Blending sampling throughput "
                  f"({points} pts, DDPM {steps} steps, batch {batch}, "
                  "1 chip)",
        "value": round(clouds_per_sec, 4),
        "unit": "clouds/sec/chip",
        "vs_baseline": round(clouds_per_sec / BASELINE_CLOUDS_PER_SEC, 4),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
