"""Fused 3-nearest-neighbors as a Pallas kernel.

Computes distances AND the 3 iterative masked argmins in VMEM (the XLA
path materializes the (B, N, M) distance tensor in HBM and re-reads it per
argmin pass). Semantics identical to `bdm_tpu.ops.interpolate.three_nn`
(reference `neighbor_interpolate.cu:21-80`): squared L2, ties to the
lowest index, squared distances clamped to [1e-10, 1e10] for the IDW
weights.

Layout: grid tiles the query-point dimension; centers stay resident; the
batch dim is a fori_loop (see ball_query.py for the Mosaic constraints
that force this shape). Outputs are six (B, N) planes (3 indices + 3
distances); the wrapper assembles (B, N, 3) indices/weights.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tnn_kernel(px_ref, py_ref, pz_ref, cx_ref, cy_ref, cz_ref,
                i0_ref, i1_ref, i2_ref, d0_ref, d1_ref, d2_ref):
    b, n_tile = px_ref.shape
    m = cx_ref.shape[1]
    ids = jax.lax.broadcasted_iota(jnp.int32, (n_tile, m), dimension=1)
    inf = jnp.float32(3.4e38)

    def batch_body(bb, _):
        px = px_ref[pl.ds(bb, 1), :].reshape(n_tile, 1)
        py = py_ref[pl.ds(bb, 1), :].reshape(n_tile, 1)
        pz = pz_ref[pl.ds(bb, 1), :].reshape(n_tile, 1)
        cx = cx_ref[pl.ds(bb, 1), :].reshape(1, m)
        cy = cy_ref[pl.ds(bb, 1), :].reshape(1, m)
        cz = cz_ref[pl.ds(bb, 1), :].reshape(1, m)
        dx = px - cx
        dy = py - cy
        dz = pz - cz
        d2 = dx * dx + dy * dy + dz * dz                 # (TN, M)

        cur = d2
        for i_ref, d_ref in ((i0_ref, d0_ref), (i1_ref, d1_ref),
                             (i2_ref, d2_ref)):
            v = jnp.min(cur, axis=1)                     # (TN,)
            # lowest index among the (tied) minima of the ORIGINAL d2
            idx = jnp.min(jnp.where(cur == v[:, None], ids, m), axis=1)
            i_ref[pl.ds(bb, 1), :] = idx[None, :].astype(jnp.int32)
            d_ref[pl.ds(bb, 1), :] = v[None, :]
            cur = jnp.where(ids == idx[:, None], inf, cur)
        return 0

    jax.lax.fori_loop(0, b, batch_body, 0)


@functools.partial(jax.jit, static_argnums=(2,))
def three_nn_pallas(points: jnp.ndarray, centers: jnp.ndarray,
                    interpret: bool = False):
    """points (B, N, 3), centers (B, M, 3) -> (idx (B, N, 3) int32,
    weights (B, N, 3) f32)."""
    b, n, _ = points.shape
    m = centers.shape[1]
    tile_n = n if n < 512 else 512
    assert n % tile_n == 0, (n, tile_n)

    def split(x):
        return x[..., 0], x[..., 1], x[..., 2]

    px, py, pz = split(points)
    cx, cy, cz = split(centers)

    point_spec = pl.BlockSpec((b, tile_n), lambda ni: (0, ni),
                              memory_space=pltpu.VMEM)
    center_spec = pl.BlockSpec((b, m), lambda ni: (0, 0),
                               memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((b, tile_n), lambda ni: (0, ni),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _tnn_kernel,
        grid=(n // tile_n,),
        out_shape=[jax.ShapeDtypeStruct((b, n), jnp.int32)] * 3
        + [jax.ShapeDtypeStruct((b, n), jnp.float32)] * 3,
        in_specs=[point_spec] * 3 + [center_spec] * 3,
        out_specs=[out_spec] * 6,
        interpret=interpret,
    )(px, py, pz, cx, cy, cz)
    idx = jnp.stack(outs[:3], axis=-1)                    # (B, N, 3)
    best = jnp.clip(jnp.stack(outs[3:], axis=-1), 1e-10, 1e10)
    d0, d1, d2 = best[..., 0], best[..., 1], best[..., 2]
    denom = d0 * d1 + d0 * d2 + d1 * d2
    w = jnp.stack([d1 * d2, d0 * d2, d0 * d1], axis=-1) / denom[..., None]
    return idx, w
