"""Neighbor feature grouping.

Reference: `functional/src/grouping/grouping.cu:18-85` — gather features at
(B, M, U) neighbor indices; backward is a scatter-add, which JAX autodiff
derives from the gather automatically.
"""

from __future__ import annotations

import jax.numpy as jnp


def grouping(features: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbor features.

    Args:
        features: (B, N, C).
        indices: (B, M, U) int32 indices into N.

    Returns:
        (B, M, U, C).
    """
    b, m, u = indices.shape
    c = features.shape[-1]
    flat = jnp.take_along_axis(
        features, indices.reshape(b, m * u, 1).astype(jnp.int32), axis=1)
    return flat.reshape(b, m, u, c)
