"""Micro-benchmarks for the point-cloud ops and the PVCNN2 forward at
production shapes. Run on the target chip:

    python tools/microbench.py [--batch 16] [--points 4096]

Prints per-op wall times; guides which ops get Pallas kernels.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timeit(fn, *args, repeats=5):
    out = fn(*args)
    jax_block(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax_block(out)
        times.append(time.perf_counter() - t0)
    return min(times)


def jax_block(x):
    import jax
    for leaf in jax.tree_util.tree_leaves(x):
        leaf.block_until_ready()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--points", type=int, default=4096)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from bdm_tpu import ops
    from bdm_tpu.models import PVCNN2

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()[:1]}")
    b, n = args.batch, args.points
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    feats32 = jnp.asarray(
        rng.standard_normal((b, n, 32)).astype(np.float32))
    feats390 = jnp.asarray(
        rng.standard_normal((b, n, 390)).astype(np.float32))

    fps1024 = jax.jit(lambda c: ops.furthest_point_sample(c, 1024))
    print(f"fps 4096->1024:        {timeit(fps1024, coords)*1e3:8.2f} ms")

    centers = ops.gather(coords, fps1024(coords))
    bq = jax.jit(lambda c, p: ops.ball_query(c, p, 0.1, 32))
    print(f"ball_query 1024x4096:  {timeit(bq, centers, coords)*1e3:8.2f} ms")

    nbr = bq(centers, coords)
    grp = jax.jit(lambda f, i: ops.grouping(f, i))
    print(f"grouping 32ch:         {timeit(grp, feats32, nbr)*1e3:8.2f} ms")

    def vox(f, c):
        norm, vc = ops.normalize_coords(c, 32)
        return ops.avg_voxelize(f, vc, 32)
    voxj = jax.jit(vox)
    print(f"avg_voxelize r32 390ch:{timeit(voxj, feats390, coords)*1e3:8.2f} ms")
    print(f"avg_voxelize r32 32ch: {timeit(voxj, feats32, coords)*1e3:8.2f} ms")

    def devox(f, c):
        norm, _ = ops.normalize_coords(c, 32)
        grid = jnp.zeros((b, 32, 32, 32, 64), jnp.float32)
        return ops.trilinear_devoxelize(grid, norm)
    print(f"devoxelize r32 64ch:   {timeit(jax.jit(devox), feats32, coords)*1e3:8.2f} ms")

    tnn = jax.jit(lambda p, c, f: ops.three_nn_interpolate(p, c, f))
    cf = jnp.asarray(rng.standard_normal((b, 1024, 256)).astype(np.float32))
    print(f"3nn 4096<-1024 256ch:  {timeit(tnn, coords, centers, cf)*1e3:8.2f} ms")

    # full backbone forward (PC2-size conditioned input)
    model = PVCNN2(out_channels=3, embed_dim=64, extra_feature_channels=387)
    x = jnp.concatenate([coords, feats390[..., :387]], axis=-1)
    t = jnp.zeros((b,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x[:1, :128], t[:1])
    fwd = jax.jit(lambda p, x, t: model.apply(p, x, t))
    dt = timeit(fwd, params, x, t, repeats=3)
    print(f"PVCNN2 fwd B{b} N{n}:  {dt*1e3:8.2f} ms "
          f"({b/dt:.1f} clouds/s single step)")


if __name__ == "__main__":
    main()
