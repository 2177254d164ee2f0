"""Benchmark: BDM-Blending sampling throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "clouds/sec/chip", "vs_baseline": N}

Measures the full coupled sampler (PC2 + PVD, DDPM 1000 steps, milestones
[1000,968,936,872,128,64,32,0], roll 16 — `example_sample_blending.sh`) at
4096 points with randomly-initialized production-size weights (throughput
is weight-independent). Baseline: the driver target of one 4096-pt cloud in
<2 s/chip, i.e. 0.5 clouds/sec (BASELINE.md; the reference publishes no
wall-clock numbers).
"""

import argparse
import json
import sys
import time

import numpy as np

MILESTONES = [1000, 968, 936, 872, 128, 64, 32, 0]
ROLL_STEP = 16
BASELINE_CLOUDS_PER_SEC = 0.5


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--points", type=int, default=4096)
    parser.add_argument("--repeats", type=int, default=2)
    parser.add_argument("--quick", action="store_true",
                        help="tiny shapes for smoke-testing the bench")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from bdm_tpu.samplers import PC2Model, ProjectionConfig, PVDModel, \
        bdm_blending
    from __graft_entry__ import _synthetic_batch

    if args.quick:
        from tests.test_models import TINY_FP, TINY_SA
        cfg = ProjectionConfig(image_size=16,
                               image_feature_model="identity",
                               raster_point_radius=0.3,
                               point_cloud_model_embed_dim=8)
        pc2 = PC2Model(cfg, sa_blocks=TINY_SA, fp_blocks=TINY_FP)
        pvd = PVDModel(embed_dim=8, sa_blocks=TINY_SA, fp_blocks=TINY_FP)
        args.points = 64
        milestones = [8, 6, 2, 0]
        roll = 2
        steps = 8
    else:
        pc2 = PC2Model()
        pvd = PVDModel()
        milestones = MILESTONES
        roll = ROLL_STEP
        steps = 1000

    key = jax.random.PRNGKey(0)
    pc2_params = pc2.init_params(key, num_points=1024)
    pvd_params = pvd.init_params(key, num_points=1024)

    rng = np.random.default_rng(0)
    batch = _synthetic_batch(args.batch, args.points, pc2.cfg.image_size, rng)

    # NOTE: deliberately NOT one outer jit. The milestone loop is a static
    # Python loop over lax.scan segments; eager execution reuses the same
    # compiled scan for every segment of equal length (the schedule has only
    # 3 distinct window lengths), whereas one mega-jit compiles all ~14
    # segments as separate subgraphs of one giant program.
    def run(k):
        return bdm_blending(pc2, pc2_params, pvd, pvd_params, batch, k,
                            num_points=args.points, milestones=milestones,
                            roll_step=roll, scheduler="ddpm",
                            num_inference_steps=steps)

    # warmup / compile
    out = run(jax.random.PRNGKey(1))
    out.block_until_ready()

    times = []
    for i in range(args.repeats):
        t0 = time.perf_counter()
        out = run(jax.random.PRNGKey(2 + i))
        out.block_until_ready()
        times.append(time.perf_counter() - t0)

    best = min(times)
    clouds_per_sec = args.batch / best
    result = {
        "metric": "BDM-Blending sampling throughput "
                  f"({args.points} pts, DDPM {steps} steps, "
                  f"batch {args.batch}, 1 chip)",
        "value": round(clouds_per_sec, 4),
        "unit": "clouds/sec/chip",
        "vs_baseline": round(clouds_per_sec / BASELINE_CLOUDS_PER_SEC, 4),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
