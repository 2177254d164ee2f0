"""Experiment: whole-grid-per-batch conv kernel vs the per-slab kernel.

The profiled per-(batch, slice) conv3d_pallas runs 0.65-0.72 ms at
(8, 32^3, 32/64) — ~2.8 us/program over 256 programs, ~20x off roofline;
suspected program + redundant-DMA overhead (each slab is DMAd 3x by the
lo/mid/hi specs). conv3d_wg_pallas runs ONE program per batch with a
fori_loop over slices.

Run ON the TPU terminal (single job — the queue is serial):
    python tools/experiment_conv_wg.py

Findings (r3, chained-coupling wall-clock — RELATIVE ordering only, the
harness has a ~0.9 ms/call floor; see tools/microbench3.py):
  - fill in after running
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/tmp/bdm_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bdm_tpu.ops.pallas.conv3d import (  # noqa: E402
    conv3d_pallas,
    conv3d_wg_pallas,
)

ITERS = 50


def chain(fn, x, *args):
    def step(i, acc):
        y = fn(acc, *args)
        # data coupling via compare (0.0*x gets algebraically removed)
        return acc + (y.mean() > 1e30).astype(acc.dtype)

    return jax.jit(lambda x0: jax.lax.fori_loop(0, ITERS, step, x0))(x)


def bench(name, fn, x, *args):
    try:
        out = chain(fn, x, *args)
        out.block_until_ready()
        t0 = time.time()
        out = chain(fn, x, *args)
        out.block_until_ready()
        dt = (time.time() - t0) / ITERS * 1e3
        print(f"{name:42s} {dt:7.3f} ms/call", flush=True)
    except Exception as e:
        print(f"{name:42s} ERR {type(e).__name__}: "
              f"{str(e)[:120]}", flush=True)


def main():
    rng = np.random.default_rng(0)
    for b, r, cin, cout in [(8, 32, 32, 32), (8, 32, 64, 64),
                            (8, 16, 128, 128), (8, 8, 256, 256)]:
        x = jnp.asarray(rng.standard_normal((b, r, r, r, cin))
                        .astype(np.float32)).astype(jnp.bfloat16)
        k = jnp.asarray((rng.standard_normal((3, 3, 3, cin, cout)) * 0.1)
                        .astype(np.float32))
        bias = jnp.zeros((cout,), jnp.float32)
        print(f"--- conv b={b} r={r} cin={cin} cout={cout} bf16")
        # correctness first (on-TPU)
        try:
            got = conv3d_wg_pallas(x, k, bias, r)
            ref = conv3d_pallas(x, k, bias, r)
            err = float(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32)).max())
            print(f"   wg vs per-slab max err {err:.3g}", flush=True)
        except Exception as e:
            print(f"   wg check ERR {type(e).__name__}: {str(e)[:150]}",
                  flush=True)
            continue
        bench("per_slab(conv3d_pallas)", conv3d_pallas, x, k, bias, r)
        bench("whole_grid(conv3d_wg_pallas)", conv3d_wg_pallas, x, k,
              bias, r)


if __name__ == "__main__":
    main()
