"""Chained-in-one-jit timings for the voxel branch candidates (the axon
tunnel makes per-call wall timing meaningless; see microbench2.py).

Coupling note: the carry MUST depend on the op through a non-foldable
expression: `c + 0.0 * g.mean()` is simplified away under the terminal's
--xla_allow_excess_precision (the loop body becomes identity and every
op "measures" ~6 us); `(g.mean() > 1e30).astype(...)` survives.

    python tools/microbench3.py [--repeat 10]
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
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from bdm_tpu import ops
    from bdm_tpu.models import PVCNN2

    b, n, r_ = args.batch, args.points, args.repeat
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    print(f"backend: {jax.default_backend()}; each op x{r_} in one jit")

    def timed(name, fn, *xs):
        def looped(*xs):
            def body(c, _):
                return fn(c, *xs[1:]), None
            c, _ = jax.lax.scan(body, xs[0], None, length=r_)
            return c
        f = jax.jit(looped)
        out = f(*xs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(*xs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / r_ * 1e3
        print(f"{name:40s} {dt:8.3f} ms/iter")

    # ---- voxel context (sort + searchsorted) and ctx-voxelize per shape
    for r, c in [(32, 390), (32, 32), (32, 64), (16, 128), (8, 256)]:
        feats = jnp.asarray(
            rng.standard_normal((b, n, c)).astype(np.float32))

        def mk_step(co):
            ctx = ops.make_voxel_context(co, r)
            return co + (ctx.norm_coords.mean() > 1e30).astype(co.dtype)

        timed(f"make_ctx R={r}", mk_step, coords)
        ctx = ops.make_voxel_context(coords, r)

        def vox_step(f, ctx):
            g = ops.avg_voxelize_ctx(f, ctx, r)
            return f + (g.mean() > 1e30).astype(f.dtype)

        timed(f"vox_ctx R={r} C={c}", vox_step, feats, ctx)

        def old_step(f, co):
            _, vc = ops.normalize_coords(co, r)
            g = ops.avg_voxelize(f, vc, r)
            return f + (g.mean() > 1e30).astype(f.dtype)

        timed(f"vox_segsum R={r} C={c}", old_step, feats, coords)

        grid = ops.avg_voxelize_ctx(feats, ctx, r)

        def dev_step(g, nc):
            p = ops.trilinear_devoxelize(g, nc)
            return g + (p.mean() > 1e30).astype(g.dtype)

        timed(f"devox R={r} C={c}", dev_step, grid, ctx.norm_coords)

    # ---- conv3d f32 vs bf16 at PVConv shapes
    dn = jax.lax.conv_dimension_numbers(
        (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC"))
    for r, cin, cout in [(32, 390, 32), (32, 32, 32), (32, 64, 64),
                         (16, 128, 128), (8, 256, 256)]:
        x = jnp.asarray(
            rng.standard_normal((b, r, r, r, cin)).astype(np.float32))
        w = jnp.asarray(
            (rng.standard_normal((3, 3, 3, cin, cout)) * 0.01).astype(
                np.float32))

        def conv_f32(xc, w):
            y = jax.lax.conv_general_dilated(
                xc, w, (1, 1, 1), "SAME", dimension_numbers=dn)
            return xc + (y.mean() > 1e30).astype(xc.dtype)

        def conv_bf16(xc, w):
            y = jax.lax.conv_general_dilated(
                xc.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                (1, 1, 1), "SAME", dimension_numbers=dn)
            return xc + (y.astype(jnp.float32).mean() > 1e30).astype(xc.dtype)

        timed(f"conv3d f32 R={r} {cin}->{cout}", conv_f32, x, w)
        timed(f"conv3d bf16 R={r} {cin}->{cout}", conv_bf16, x, w)

    # ---- full forward
    model = PVCNN2(extra_feature_channels=387)
    x = jnp.asarray(rng.standard_normal((b, n, 390)).astype(np.float32))
    t = jnp.full((b,), 500, dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x[:1, :128], t[:1])

    def fwd_step(x, t):
        out = model.apply(params, x, t)
        return x + (out.mean() > 1e30).astype(x.dtype)

    timed("PVCNN2 forward (full PC2)", fwd_step, x, t)


if __name__ == "__main__":
    main()
