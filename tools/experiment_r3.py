"""Round-3 TPU experiment: conv formulations, wide scatter, z-buffer.

Run ON the TPU terminal (the queue is serial — one job at a time):
    python tools/experiment_r3.py [conv|scatter|zbuf]

Timing via chained dependent calls (ITERS deep) — single-shot wall clock
through the axon tunnel is meaningless (see tools/microbench3.py).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/bdm_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

ITERS = 30


def timeit(name, fn, x, *args):
    @jax.jit
    def run(x):
        out = None
        for _ in range(ITERS):
            out = fn(x, *args)
            x = x + (out.mean() > 1e30).astype(x.dtype)
        return out

    try:
        run(x).block_until_ready()
        t0 = time.perf_counter()
        run(x).block_until_ready()
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{name:32s} {dt:8.3f} ms/call", flush=True)
        return dt
    except Exception as e:
        print(f"{name:32s} FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        return None


def conv_exp():
    from bdm_tpu.ops.conv_wide import conv3d_wide
    from bdm_tpu.ops.pallas.conv3d import conv3d_mm_pallas, conv3d_pallas

    rng = np.random.default_rng(0)
    for cin, cout, r, dt in ((390, 32, 32, jnp.bfloat16),
                             (64, 64, 8, jnp.bfloat16),
                             (32, 32, 32, jnp.bfloat16),
                             (64, 64, 32, jnp.bfloat16),
                             (256, 256, 8, jnp.bfloat16)):
        x = jnp.asarray(rng.standard_normal((8, r, r, r, cin)).astype(
            np.float32)).astype(dt)
        k = jnp.asarray((rng.standard_normal((3, 3, 3, cin, cout)) * 0.1)
                        .astype(np.float32))
        bias = jnp.zeros((cout,), jnp.float32)
        print(f"--- conv cin={cin} cout={cout} r={r} {dt.__name__}")
        dn = jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))

        def xla_conv(x):
            return jax.lax.conv_general_dilated(
                x, k.astype(x.dtype), (1, 1, 1), "SAME",
                dimension_numbers=dn) + bias.astype(x.dtype)

        timeit("xla_conv", xla_conv, x)
        timeit("conv_wide(xla mm+shift)", lambda x: conv3d_wide(x, k, bias),
               x)
        timeit("im2col_pallas",
               lambda x: conv3d_pallas(x, k, bias, r), x)
        timeit("mm_pallas",
               lambda x: conv3d_mm_pallas(x, k, bias, r), x)


def scatter_exp():
    from bdm_tpu.ops.voxelize import make_voxel_context
    from bdm_tpu.ops.pallas.voxelize import scatter_sum_sorted_pallas

    B, N, R = 8, 4096, 32
    R3 = R ** 3
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32)
                         * 0.3)
    ctx = make_voxel_context(coords, R)
    for C in (391, 33):
        feats = jnp.asarray(rng.standard_normal((B, N, C)).astype(
            np.float32))
        f_sorted = jnp.take_along_axis(feats, ctx.order[..., None], axis=1)
        flat_ids = (ctx.ids_sorted.astype(jnp.int32)
                    + jnp.arange(B, dtype=jnp.int32)[:, None] * R3
                    ).reshape(-1)
        print(f"--- scatter C={C}")

        def seg(f):
            return jax.ops.segment_sum(
                f.reshape(B * N, C), flat_ids, num_segments=B * R3,
                indices_are_sorted=True).reshape(B, R3, C)

        want = np.asarray(seg(f_sorted))
        timeit("segment_sum", seg, f_sorted)
        for maxp in (1024, 256):
            def pall(f, m=maxp):
                return scatter_sum_sorted_pallas(f, ctx.ids_sorted,
                                                 ctx.tile_lo, R3, False,
                                                 None, m)
            got = None
            try:
                got = np.asarray(pall(f_sorted))
            except Exception as e:
                print(f"   maxp={maxp} check FAILED: {str(e)[:160]}")
            if got is not None:
                err = np.abs(got - want).max() / (np.abs(want).max() + 1e-8)
                print(f"   maxp={maxp} rel-err {err:.2e}")
                timeit(f"sorted_pallas_maxp{maxp}", pall, f_sorted)


def zbuf_exp():
    import importlib
    m = importlib.import_module("tools.experiment_zbuf")
    m.main()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("conv", "all"):
        conv_exp()
    if which in ("scatter", "all"):
        scatter_exp()
    if which in ("zbuf", "all"):
        zbuf_exp()
