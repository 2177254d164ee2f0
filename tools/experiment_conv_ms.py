"""Experiment: multi-slice conv kernel (conv3d_ms) vs per-slab conv3d.

The profiled per-(batch, slice) conv3d_pallas runs B*R tiny programs
(~2.5 us each at C<=64): R=32 C=64 measures 0.716 ms vs a 0.29 ms MXU
roofline. conv3d_ms groups DS slices per program and contracts the three
dz slabs in ONE (HW, 3C) @ (3C, 9Cout) matmul per slice.

Method: each variant runs 50 data-coupled calls inside one jit, traced
with jax.profiler; per-op times come from the xplane (in-graph ground
truth — the chained wall-clock harness has a ~0.9 ms/call floor).

Run ON the TPU terminal (single job — the queue is serial):
    python tools/experiment_conv_ms.py

Findings (r3, us/call in-graph):
  - fill in after running
"""

import glob
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/tmp/bdm_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bdm_tpu.ops.pallas.conv3d import (  # noqa: E402
    conv3d_ms_pallas,
    conv3d_pallas,
)

ITERS = 50
TRACE = "/tmp/conv_ms_prof"


def xla_conv(x, k, bias, r):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1, 1), "SAME",
        dimension_numbers=dn) + bias.astype(x.dtype)


def chain(fn, x, *args):
    def step(i, acc):
        y = fn(acc, *args)
        return acc + (y[..., : x.shape[-1]].mean() > 1e30).astype(acc.dtype)

    return jax.jit(lambda x0: jax.lax.fori_loop(0, ITERS, step, x0))


def main():
    rng = np.random.default_rng(0)
    shapes = [(8, 32, 32, 32), (8, 32, 64, 64), (8, 16, 128, 128),
              (8, 16, 64, 64), (8, 8, 256, 256)]
    fns = {}
    args = {}
    for b, r, cin, cout in shapes:
        x = jnp.asarray(rng.standard_normal((b, r, r, r, cin))
                        .astype(np.float32)).astype(jnp.bfloat16)
        k = jnp.asarray((rng.standard_normal((3, 3, 3, cin, cout)) * 0.1)
                        .astype(np.float32))
        bias = jnp.zeros((cout,), jnp.float32)
        tag = f"r{r}c{cin}"
        variants = [("slab", lambda a, kk, bb, _r=r:
                     conv3d_pallas(a, kk, bb, _r)),
                    ("xla", lambda a, kk, bb, _r=r:
                     xla_conv(a, kk, bb, _r))]
        for ds in (2, 4, 8):
            if r % ds:
                continue
            for taps in ("roll", "pad"):
                variants.append(
                    (f"ms{ds}{taps[0]}",
                     lambda a, kk, bb, _r=r, _d=ds, _t=taps:
                     conv3d_ms_pallas(a, kk, bb, _r, None, _d, _t)))
        for name, fn in variants:
            fns[f"{tag}/{name}"] = chain(fn, x, k, bias)
            args[f"{tag}/{name}"] = x

    # compile everything first (serial TPU queue); variants that blow the
    # scoped-vmem limit are dropped with a note
    ref_out = {}
    for key, fn in list(fns.items()):
        try:
            fn(args[key]).block_until_ready()
            print(f"compiled {key}", flush=True)
        except Exception as e:
            print(f"DROP {key}: {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            del fns[key]

    import time
    for key, fn in fns.items():
        t0 = time.time()
        fn(args[key]).block_until_ready()
        dt = (time.time() - t0) / ITERS * 1e3
        print(f"wall {key:16s} {dt:7.3f} ms/call", flush=True)

    jax.profiler.start_trace(TRACE)
    for key, fn in fns.items():
        fn(args[key]).block_until_ready()
    jax.profiler.stop_trace()
    print("module order: " + ", ".join(fns), flush=True)
    print("traced; parse:", flush=True)
    subprocess.run([sys.executable, "tools/parse_xplane.py", TRACE,
                    "--iters", str(ITERS), "--top", "40", "--modules"],
                   cwd="/root/repo")


if __name__ == "__main__":
    main()
