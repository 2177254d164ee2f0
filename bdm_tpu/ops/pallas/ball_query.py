"""Fused ball query as a Pallas kernel.

One kernel computes the center-to-point distances AND selects the first-U
hits in scan order (reference `ball_query.cu:19-58` semantics), entirely in
VMEM — the XLA path materializes a (B, M, N) distance tensor in HBM and
runs a top_k sort over it.

Selection is iterative min-extraction on the index key (U unrolled steps of
a masked min-reduction over N): take the smallest in-radius index, mask
everything up to it, repeat — exactly "first U hits in scan order". Slots
beyond the hit count repeat the first hit; zero-hit centers yield 0.

Layout: the grid tiles the center dimension only (Mosaic requires the last
two block dims to divide (8, 128) or equal the array dims, so a (1, tile)
per-batch block is not allowed); the batch dimension stays resident and is
a static unrolled loop in the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bq_kernel(cx_ref, cy_ref, cz_ref, px_ref, py_ref, pz_ref, out_ref, *,
               radius2: float, num_neighbors: int):
    b, m_tile = cx_ref.shape
    n = px_ref.shape[1]
    ids = jax.lax.broadcasted_iota(jnp.int32, (m_tile, n), dimension=1)
    for bb in range(b):  # static unroll over the resident batch dim
        dx = cx_ref[bb, :][:, None] - px_ref[bb, :][None, :]  # (TM, N)
        dy = cy_ref[bb, :][:, None] - py_ref[bb, :][None, :]
        dz = cz_ref[bb, :][:, None] - pz_ref[bb, :][None, :]
        d2 = dx * dx + dy * dy + dz * dz
        mask = d2 < radius2
        cols = []
        for _ in range(num_neighbors):
            cur = jnp.min(jnp.where(mask, ids, n), axis=1)  # smallest hit
            cols.append(cur)
            mask = mask & (ids > cur[:, None])
        out = jnp.stack(cols, axis=1)                   # (TM, U)
        first = out[:, 0:1]
        base = jnp.where(first < n, first, 0)
        out_ref[bb, :, :] = jnp.where(out < n, out, base).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
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
    return pl.pallas_call(
        kernel,
        grid=(m // tile_m,),
        out_shape=jax.ShapeDtypeStruct((b, m, u), jnp.int32),
        in_specs=[center_spec] * 3 + [point_spec] * 3,
        out_specs=pl.BlockSpec((b, tile_m, u), lambda mi: (0, mi, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cx, cy, cz, px, py, pz)
