"""Experiment: z-buffer winner detection for the multi-splat surface
projection — XLA scatter-min (production) vs a sort-based formulation.

The production path (`conditioning/projection.py::surface_projection`)
scatter-mins (B, N, 4) candidate depths into a (B, HW+1) z-buffer
(~16K serial scatter rows/sample ≈ 2.1 ms/step) and then gathers
winner_z back per candidate (16K gather starts ≈ 1.4 ms).

Sort-based alternative: pack (pid, z) into one int64 key
(pid << 32 | monotone-z-bits), sort once carrying the candidate index,
mark run starts (first key of each pid run = min z), and return the flags
to candidate order with a second argsort + gather — no scatter, no
winner-z gather.

Run ON the TPU terminal (serial queue!):
    python tools/experiment_zbuf.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/bdm_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

B, N, KK, S = 8, 4096, 4, 224
HW = S * S
ITERS = 50
_INF = jnp.float32(3.4e38)


def won_scatter(pid, zc):
    """Production formulation (projection.py:152-159)."""
    b = pid.shape[0]
    zbuf = jnp.full((b, HW + 1), _INF, jnp.float32)
    zbuf = zbuf.at[jnp.arange(b)[:, None, None], pid].min(zc)
    wz = jnp.take_along_axis(zbuf, pid.reshape(b, N * KK),
                             axis=1).reshape(b, N, KK)
    return (zc <= wz) & (zc < _INF)


def won_sort(pid, zc):
    """Sort-based: lexicographic (pid, z-bits) two-key sort (x64 is
    disabled, so no packed int64 keys); run starts win."""
    b = pid.shape[0]
    m = N * KK
    zbits = jax.lax.bitcast_convert_type(zc, jnp.int32)  # z>0: monotone
    idx = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[None], (b, m))
    spid, _, sidx = jax.lax.sort(
        (pid.reshape(b, m), zbits.reshape(b, m), idx), num_keys=2)
    first = jnp.concatenate(
        [jnp.ones((b, 1), bool), spid[:, 1:] != spid[:, :-1]], axis=1)
    inv = jnp.argsort(sidx, axis=1)
    won = jnp.take_along_axis(first, inv, axis=1).reshape(b, N, KK)
    return won & (zc < _INF)


def chain(fn, pid, zc):
    @jax.jit
    def run(z):
        out = None
        for _ in range(ITERS):
            out = fn(pid, z)
            z = z + (out.sum() > 10 ** 9).astype(z.dtype)
        return out

    return run


def main():
    rng = np.random.default_rng(0)
    pid = rng.integers(0, HW, (B, N, KK)).astype(np.int32)
    pid[rng.random((B, N, KK)) < 0.3] = HW  # invalid candidates
    zc = np.where(pid < HW, rng.uniform(0.5, 3.0, (B, N, KK)),
                  np.float32(3.4e38)).astype(np.float32)
    pid, zc = jnp.asarray(pid), jnp.asarray(zc)

    want = np.asarray(won_scatter(pid, zc))
    for name, fn in (("scatter_min", won_scatter), ("sort", won_sort)):
        got = np.asarray(fn(pid, zc))
        # the sort picks exactly ONE winner per pixel; scatter-min admits
        # z-ties — compare per-pixel winner counts instead of raw masks
        agree = (got == want).mean()
        run = chain(fn, pid, zc)
        run(zc).block_until_ready()
        t0 = time.perf_counter()
        run(zc).block_until_ready()
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{name:12s} {dt:7.3f} ms/call  mask-agreement {agree:.6f}",
              flush=True)


if __name__ == "__main__":
    main()
