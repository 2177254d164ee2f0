"""Dispatch-floor-free op timings: run each op R times inside ONE jit call
(chained through a dependency so XLA can't elide iterations), subtract the
single-call overhead.

    python tools/microbench2.py [--batch 8] [--repeat 10]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--points", type=int, default=4096)
    parser.add_argument("--repeat", type=int, default=10)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from bdm_tpu import ops
    from bdm_tpu.models import PVCNN2

    b, n, r = args.batch, args.points, args.repeat
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    feats390 = jnp.asarray(
        rng.standard_normal((b, n, 390)).astype(np.float32))
    feats64 = feats390[..., :64]
    print(f"backend: {jax.default_backend()}; each op x{r} in one jit")

    def timed(name, fn, *xs):
        """fn maps (carry, *rest) -> carry-shaped output; looped r times
        inside one jit so per-call dispatch overhead amortizes away."""
        def looped(*xs):
            def body(c, _):
                return fn(c, *xs[1:]), None
            c, _ = jax.lax.scan(body, xs[0], None, length=r)
            return c
        f = jax.jit(looped)
        out = f(*xs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(*xs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / r * 1e3
        print(f"{name:34s} {dt:8.3f} ms/iter")

    # fps: carry = coords (perturb via the selected indices to chain deps)
    def fps_step(c):
        idx = ops.furthest_point_sample(c, 1024)
        delta = ops.gather(c, idx).mean(axis=(1, 2), keepdims=True)
        return c + 0.0 * delta

    timed("fps 4096->1024 (pallas on tpu)", fps_step, coords)

    def fps_xla(c):
        idx = ops.furthest_point_sample(c, 1024, use_pallas=False)
        delta = ops.gather(c, idx).mean(axis=(1, 2), keepdims=True)
        return c + 0.0 * delta

    timed("fps 4096->1024 (xla loop)", fps_xla, coords)

    centers = ops.gather(coords, ops.furthest_point_sample(
        coords, 1024, use_pallas=False))

    def bq_step(c, pts):
        nbr = ops.ball_query(c, pts, 0.1, 32)
        return c + 0.0 * nbr.astype(jnp.float32).mean()

    timed("ball_query 1024x4096 u32", bq_step, centers, coords)

    def group_step(f, nbr):
        g = ops.grouping(f, nbr)
        return f + 0.0 * g.mean()

    nbr = ops.ball_query(centers, coords, 0.1, 32)
    timed("grouping 64ch u32", group_step, feats64, nbr)

    def vox_step(f, c):
        norm, vc = ops.normalize_coords(c, 32)
        g = ops.avg_voxelize(f, vc, 32)
        return f + 0.0 * g.mean()

    timed("avg_voxelize r32 390ch", vox_step, feats390, coords)
    timed("avg_voxelize r32 64ch", vox_step, feats64, coords)

    grid = jnp.asarray(rng.standard_normal(
        (b, 32, 32, 32, 64)).astype(np.float32))

    def devox_step(g, c):
        norm, _ = ops.normalize_coords(c, 32)
        o = ops.trilinear_devoxelize(g, norm)
        return g + 0.0 * o.mean()

    timed("devoxelize r32 64ch", devox_step, grid, coords)

    cfeats = jnp.asarray(rng.standard_normal(
        (b, 1024, 256)).astype(np.float32))

    def tnn_step(p, c, f):
        o = ops.three_nn_interpolate(p, c, f)
        return p + 0.0 * o.mean()

    timed("3nn 4096<-1024 256ch", tnn_step, coords, centers, cfeats)

    # full forward chained
    model = PVCNN2(out_channels=3, embed_dim=64, extra_feature_channels=387)
    x = jnp.concatenate([coords, feats390[..., :387]], axis=-1)
    t = jnp.zeros((b,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x[:1, :128], t[:1])

    def fwd_step(x):
        out = model.apply(params, x, t)
        return x + 0.001 * jnp.pad(out, ((0, 0), (0, 0), (0, x.shape[-1] - 3)))

    timed("PVCNN2 forward (full PC2)", fwd_step, x)


if __name__ == "__main__":
    main()
