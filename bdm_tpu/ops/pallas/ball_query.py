"""Fused ball query as a Pallas kernel.

One kernel computes the center-to-point distances AND selects the first-U
hits in scan order (reference `ball_query.cu:19-58` semantics), entirely in
VMEM — the XLA path materializes a (B, M, N) distance tensor in HBM and
runs a top_k sort over it.

Selection is iterative min-extraction on the index key (U steps of a
masked min-reduction over N): take the smallest in-radius index, mask
everything up to it, repeat — exactly "first U hits in scan order". Slots
beyond the hit count repeat the first hit; zero-hit centers yield 0.

Compile-friendliness: both the batch loop and the U loop are
`lax.fori_loop`s (a fully unrolled version generated MLIR big enough to
kill the TPU compile helper); the running mask lives in a VMEM scratch.
Layout notes: Mosaic requires the last two block dims to divide (8, 128)
or equal the array dims, and dynamic store indices must land on the
sublane dim — hence the (B, U, M) output layout (transposed back by the
wrapper) and the batch dim resident per tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bq_kernel(cx_ref, cy_ref, cz_ref, px_ref, py_ref, pz_ref, out_ref,
               mask_ref, *, radius2: float, num_neighbors: int):
    b, m_tile = cx_ref.shape
    n = px_ref.shape[1]
    ids = jax.lax.broadcasted_iota(jnp.int32, (m_tile, n), dimension=1)

    def batch_body(bb, _):
        cx = cx_ref[pl.ds(bb, 1), :].reshape(m_tile, 1)
        cy = cy_ref[pl.ds(bb, 1), :].reshape(m_tile, 1)
        cz = cz_ref[pl.ds(bb, 1), :].reshape(m_tile, 1)
        px = px_ref[pl.ds(bb, 1), :].reshape(1, n)
        py = py_ref[pl.ds(bb, 1), :].reshape(1, n)
        pz = pz_ref[pl.ds(bb, 1), :].reshape(1, n)
        dx = cx - px
        dy = cy - py
        dz = cz - pz
        d2 = dx * dx + dy * dy + dz * dz
        # keyed mask: a hit keeps its index, a miss becomes n; the u-loop
        # then just tracks a running lower bound (no mask write-back)
        mask_ref[:] = jnp.where(d2 < radius2, ids, n)

        def u_body(u, prev):
            keys = mask_ref[:]
            cur = jnp.min(jnp.where(keys > prev[:, None], keys, n),
                          axis=1)                            # (TM,)
            out_ref[bb, pl.ds(u, 1), :] = cur[None, :].astype(jnp.int32)
            return cur

        jax.lax.fori_loop(0, num_neighbors, u_body,
                          jnp.full((m_tile,), -1, jnp.int32))
        return 0

    jax.lax.fori_loop(0, b, batch_body, 0)


def ball_query_pallas(centers: jnp.ndarray, points: jnp.ndarray,
                      radius: float, num_neighbors: int,
                      interpret: bool = False) -> jnp.ndarray:
    """centers (B, M, 3), points (B, N, 3) -> (B, M, U) int32."""
    b, m, _ = centers.shape
    n = points.shape[1]
    u = int(num_neighbors)
    tile_m = m if m < 128 else 128
    assert m % tile_m == 0, (m, tile_m)

    def split(x):
        return x[..., 0], x[..., 1], x[..., 2]

    cx, cy, cz = split(centers)
    px, py, pz = split(points)

    center_spec = pl.BlockSpec((b, tile_m), lambda mi: (0, mi),
                               memory_space=pltpu.VMEM)
    point_spec = pl.BlockSpec((b, n), lambda mi: (0, 0),
                              memory_space=pltpu.VMEM)
    kernel = functools.partial(_bq_kernel, radius2=float(radius) ** 2,
                               num_neighbors=u)
    out = pl.pallas_call(
        kernel,
        grid=(m // tile_m,),
        out_shape=jax.ShapeDtypeStruct((b, u, m), jnp.int32),
        in_specs=[center_spec] * 3 + [point_spec] * 3,
        out_specs=pl.BlockSpec((b, u, tile_m), lambda mi: (0, 0, mi),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tile_m, n), jnp.int32)],
        interpret=interpret,
    )(cx, cy, cz, px, py, pz)
    out = jnp.transpose(out, (0, 2, 1))                       # (B, M, U)
    first = out[..., 0:1]
    base = jnp.where(first < n, first, 0)
    return jnp.where(out < n, out, base)