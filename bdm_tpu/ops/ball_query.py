"""Ball query with the reference's order-dependent "first u within radius"
semantics.

Reference: `functional/src/ball_query/ball_query.cu:19-58` — for each center,
scan points in index order; collect the first `u` points with squared
distance strictly below radius^2; when the FIRST hit is found, pre-fill all
`u` slots with it (so trailing slots repeat the first hit); centers with no
hit at all keep the zero-initialized output (see host wrapper, which
allocates a zeros tensor).

These exact semantics matter because pretrained checkpoints were trained
against these neighborhoods. TPU design: a masked-cumsum scatter — O(M*N)
vector work, no sorting, no data-dependent shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def ball_query(centers: jnp.ndarray, points: jnp.ndarray, radius: float,
               num_neighbors: int) -> jnp.ndarray:
    """For each center, indices of the first `num_neighbors` points within
    `radius` (scan order), padded with the first hit.

    Args:
        centers: (B, M, 3).
        points: (B, N, 3).
        radius: ball radius (compared on squared distance, strict <).
        num_neighbors: U, max neighbors (static).

    Returns:
        (B, M, U) int32 indices into N.
    """
    b, m, _ = centers.shape
    n = points.shape[1]
    u = int(num_neighbors)

    # Squared distances without materializing (B, M, N, 3).
    d2 = jnp.zeros((b, m, n), dtype=jnp.float32)
    for ax in range(3):
        diff = centers[..., ax][:, :, None] - points[..., ax][:, None, :]
        d2 = d2 + diff * diff

    mask = d2 < jnp.float32(radius) ** 2                       # (B, M, N)
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1)         # 1-indexed hit rank
    first_hit = jnp.argmax(mask, axis=-1).astype(jnp.int32)    # 0 if no hit
    any_hit = mask.any(axis=-1)
    base = jnp.where(any_hit, first_hit, 0)                    # (B, M)

    # Scatter point index k into slot rank-1 (for the first U hits). Extra
    # slot U absorbs non-hits and overflow writes; each real slot has at
    # most one writer so `set` is deterministic.
    slot = jnp.where(mask & (rank <= u), rank - 1, u)          # (B, M, N)
    point_ids = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[None, None, :], (b, m, n))
    buf = jnp.full((b, m, u + 1), -1, dtype=jnp.int32)
    buf = buf.at[
        jnp.arange(b)[:, None, None],
        jnp.arange(m)[None, :, None],
        slot,
    ].set(point_ids)
    out = buf[..., :u]
    return jnp.where(out < 0, base[..., None], out)
