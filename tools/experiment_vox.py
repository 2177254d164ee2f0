"""Voxelize/devoxelize strategy experiments on the target chip.

    python tools/experiment_vox.py [--batch 8]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--repeat", type=int, default=5)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from bdm_tpu import ops

    b, n, r3, res = args.batch, 4096, 32768, 32
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))

    def timed(name, fn, *xs):
        def looped(*xs):
            def body(c, _):
                return fn(c, *xs[1:]), None
            return jax.lax.scan(body, xs[0], None, length=args.repeat)[0]
        f = jax.jit(looped)
        jax.block_until_ready(f(*xs))
        t0 = time.perf_counter()
        jax.block_until_ready(f(*xs))
        print(f"{name:32s} {(time.perf_counter()-t0)/args.repeat*1e3:8.2f} ms",
              flush=True)

    for c in (64, 390):
        feats = jnp.asarray(
            rng.standard_normal((b, n, c)).astype(np.float32))

        def vox_now(f, coords=coords):
            _, vc = ops.normalize_coords(coords, res)
            return f + 0.0 * ops.avg_voxelize(f, vc, res).mean()

        timed(f"segsum C{c}", vox_now, feats)

        def vox_sorted(f, coords=coords):
            _, vc = ops.normalize_coords(coords, res)
            ids = vc[..., 0] * res * res + vc[..., 1] * res + vc[..., 2]
            order = jnp.argsort(ids, axis=1)
            sids = jnp.take_along_axis(ids, order, axis=1)
            sf = jnp.take_along_axis(f, order[..., None], axis=1)
            flat = (sids + jnp.arange(b)[:, None] * r3).reshape(-1)
            sums = jax.ops.segment_sum(sf.reshape(b * n, -1), flat,
                                       num_segments=b * r3,
                                       indices_are_sorted=True)
            cnt = jax.ops.segment_sum(jnp.ones((b * n,), jnp.float32), flat,
                                      num_segments=b * r3,
                                      indices_are_sorted=True)
            out = sums / jnp.maximum(cnt, 1.0)[:, None]
            return f + 0.0 * out.mean()

        timed(f"sorted segsum C{c}", vox_sorted, feats)

        def vox_onehot(f, coords=coords):
            _, vc = ops.normalize_coords(coords, res)
            ids = vc[..., 0] * res * res + vc[..., 1] * res + vc[..., 2]
            # one-hot matmul on the MXU (default precision)
            oh = jax.nn.one_hot(ids, r3, dtype=jnp.bfloat16)   # (B, N, r3)
            sums = jnp.einsum("bnv,bnc->bvc", oh, f.astype(jnp.bfloat16))
            cnt = jnp.einsum("bnv->bv", oh)
            out = sums.astype(jnp.float32) / jnp.maximum(
                cnt.astype(jnp.float32), 1.0)[..., None]
            return f + 0.0 * out.mean()

        timed(f"one-hot bf16 C{c}", vox_onehot, feats)

    # devoxelize
    grid = jnp.asarray(rng.standard_normal((b, res, res, res, 64)).astype(
        np.float32))

    def devox(g, coords=coords):
        norm, _ = ops.normalize_coords(coords, res)
        return g + 0.0 * ops.trilinear_devoxelize(g, norm).mean()

    timed("devox gather C64", devox, grid)

    def devox_onehot(g, coords=coords):
        norm, _ = ops.normalize_coords(coords, res)
        lo = jnp.floor(norm).astype(jnp.int32)
        frac = norm - lo
        step = (frac > 0).astype(jnp.int32)
        flat = g.reshape(b, r3, 64).astype(jnp.bfloat16)
        out = jnp.zeros((b, n, 64), jnp.float32)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    idx = ((lo[..., 0] + dx * step[..., 0]) * res * res
                           + (lo[..., 1] + dy * step[..., 1]) * res
                           + (lo[..., 2] + dz * step[..., 2]))
                    w = ((frac[..., 0] if dx else 1 - frac[..., 0])
                         * (frac[..., 1] if dy else 1 - frac[..., 1])
                         * (frac[..., 2] if dz else 1 - frac[..., 2]))
                    oh = jax.nn.one_hot(idx, r3, dtype=jnp.bfloat16)
                    out = out + w[..., None] * jnp.einsum(
                        "bnv,bvc->bnc", oh, flat).astype(jnp.float32)
        return g + 0.0 * out.mean()

    timed("devox one-hot bf16 C64", devox_onehot, grid)


if __name__ == "__main__":
    main()
