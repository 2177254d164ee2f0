"""Experiment: sorted-range Pallas matmul-scatter at C=391 (the stage-0
conditioning width) vs the production sorted segment_sum.

Round-2 kept segment_sum for C>=128 based on the UNSORTED one-hot kernel's
mask FLOPs (R^3 x N compares). The SORTED kernel's mask work is
MAXP x TILE_V per tile — independent of C — and its dot rides the MXU, so
wide channels should win too IF (a) the full (N, C) f32 feature block fits
VMEM alongside the output tile (~6.4 MB at N=4096 C=391, ~16 MB/core) and
(b) a smaller MAXP (per-tile occupancy is ~64 points at R=32, N=4096)
cuts the 16x wasted window work.

Run ON the TPU terminal (single job — the queue is serial):
    python tools/experiment_wide_scatter.py

Findings (fill in after running):
  - see stdout; wall-clock through the axon tunnel is only trustworthy
    for chained many-iteration loops (see tools/microbench3.py header).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/bdm_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bdm_tpu.ops.voxelize import make_voxel_context  # noqa: E402
from bdm_tpu.ops.pallas.voxelize import scatter_sum_sorted_pallas  # noqa: E402

B, N, C, R = 8, 4096, 391, 32
R3 = R ** 3
ITERS = 50


def chain(fn, feats, *args):
    """Chain ITERS dependent calls so the tunnel cannot hide latency; the
    data coupling uses a compare (0.0*x gets algebraically removed)."""

    @jax.jit
    def run(f):
        out = None
        for _ in range(ITERS):
            out = fn(f, *args)
            f = f + (out.mean() > 1e30).astype(f.dtype)
        return out

    return run


def main():
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32)
                         * 0.3)
    feats = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    ctx = make_voxel_context(coords, R)
    f_sorted = jnp.take_along_axis(feats, ctx.order[..., None], axis=1)
    flat_ids = (ctx.ids_sorted.astype(jnp.int32)
                + jnp.arange(B, dtype=jnp.int32)[:, None] * R3).reshape(-1)

    def seg_sum(f, ids):
        return jax.ops.segment_sum(
            f.reshape(B * N, C), ids, num_segments=B * R3,
            indices_are_sorted=True).reshape(B, R3, C)

    want = np.asarray(seg_sum(f_sorted, flat_ids))

    variants = {"segment_sum": (seg_sum, (flat_ids,))}
    for maxp in (1024, 512, 256):
        def pall(f, lo, m=maxp):
            return scatter_sum_sorted_pallas(f, ctx.ids_sorted, lo, R3,
                                             False, None, m)
        variants[f"sorted_pallas_maxp{maxp}"] = (pall, (ctx.tile_lo,))

    for name, (fn, args) in variants.items():
        try:
            got = np.asarray(fn(f_sorted, *args))
            err = np.abs(got - want).max() / (np.abs(want).max() + 1e-8)
            run = chain(fn, f_sorted, *args)
            run(f_sorted).block_until_ready()  # compile
            t0 = time.perf_counter()
            run(f_sorted).block_until_ready()
            dt = (time.perf_counter() - t0) / ITERS * 1e3
            print(f"{name:28s} {dt:7.3f} ms/call  rel-err {err:.2e}",
                  flush=True)
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
