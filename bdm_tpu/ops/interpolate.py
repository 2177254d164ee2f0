"""Three-nearest-neighbor inverse-distance interpolation.

Reference: `functional/src/interpolate/neighbor_interpolate.cu:21-80` —
for each query point, find its 3 nearest centers (squared L2, ties to the
lowest index), clamp the squared distances to [1e-10, 1e10], and blend the
center features with inverse-distance weights
    w_i = prod_{j != i} d_j / (d0*d1 + d0*d2 + d1*d2).

TPU design: brute-force (N, M) distance matrix + `lax.top_k` — at the
reference's sizes (N <= 4096, M <= 1024) this is dense vector/matrix work
that XLA tiles well; the backward (scatter-add to centers,
`neighbor_interpolate.cu:110-181`) comes from autodiff of the gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def three_nn(points: jnp.ndarray, centers: jnp.ndarray,
             use_pallas: bool | None = None):
    """Indices and inverse-distance weights of each point's 3 nearest centers.

    Args:
        points: (B, N, 3) query points.
        centers: (B, M, 3) source centers (M >= 1).
        use_pallas: force the fused Pallas kernel on/off (default: auto —
            TPU backend + tiling-compatible shapes).

    Returns:
        indices: (B, N, 3) int32.
        weights: (B, N, 3) float32, rows sum to 1.
    """
    # no coordinate backward in the reference (`neighbor_interpolate.cu`
    # differentiates features only); see furthest_point_sample
    points = jax.lax.stop_gradient(points)
    centers = jax.lax.stop_gradient(centers)
    b, n, _ = points.shape
    m = centers.shape[1]

    from bdm_tpu.ops.sampling import _PALLAS_OVERRIDE
    if use_pallas is None:
        use_pallas = _PALLAS_OVERRIDE
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and m >= 3 and n % min(n, 512) == 0:
        from bdm_tpu.ops.pallas.three_nn import three_nn_pallas
        return three_nn_pallas(points, centers)

    d2 = jnp.zeros((b, n, m), dtype=jnp.float32)
    for ax in range(3):
        diff = points[..., ax][:, :, None] - centers[..., ax][:, None, :]
        d2 = d2 + diff * diff

    # three iterative masked argmins (first occurrence wins ties, like the
    # CUDA scan) — much cheaper than a full top_k sort on TPU
    k = min(3, m)
    cur = d2
    bests, idxs = [], []
    for _ in range(k):
        i = jnp.argmin(cur, axis=-1).astype(jnp.int32)         # (B, N)
        v = jnp.take_along_axis(d2, i[..., None], axis=-1)[..., 0]
        bests.append(v)
        idxs.append(i)
        cur = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, cur.shape, 2) == i[..., None],
            jnp.float32(jnp.inf), cur)
    best = jnp.stack(bests, axis=-1)
    idx = jnp.stack(idxs, axis=-1)
    if k < 3:  # degenerate M < 3: repeat the last center like a clamp
        pad = 3 - k
        best = jnp.concatenate([best] + [best[..., -1:]] * pad, axis=-1)
        idx = jnp.concatenate([idx] + [idx[..., -1:]] * pad, axis=-1)

    best = jnp.clip(best, 1e-10, 1e10)
    d0, d1, d2_ = best[..., 0], best[..., 1], best[..., 2]
    denom = d0 * d1 + d0 * d2_ + d1 * d2_
    w = jnp.stack([d1 * d2_, d0 * d2_, d0 * d1], axis=-1) / denom[..., None]
    return idx.astype(jnp.int32), w


def three_nn_interpolate(points: jnp.ndarray, centers: jnp.ndarray,
                         centers_features: jnp.ndarray) -> jnp.ndarray:
    """Interpolate center features onto query points via 3-NN IDW.

    Args:
        points: (B, N, 3).
        centers: (B, M, 3).
        centers_features: (B, M, C).

    Returns:
        (B, N, C).
    """
    idx, w = three_nn(points, centers)
    b, n, _ = idx.shape
    m = centers_features.shape[1]
    c = centers_features.shape[-1]
    import os
    impl = os.environ.get("BDM_INTERP")
    use_onehot = (impl == "onehot"
                  or (impl is None and jax.default_backend() == "tpu"))
    if (use_onehot
            and centers_features.dtype == jnp.bfloat16
            and m >= 128 and n % min(n, 512) == 0):
        # one-hot weighted matmul on the MXU (ops/pallas/interp_mm.py):
        # the gather's 3N serialized starts (0.65 ms/step at the big FP
        # stage) become one resident-centers contraction per query tile.
        # bf16-only: the weights round once to bf16, the same rounding
        # the devoxelize einsum takes under mixed precision. DEFAULT on
        # TPU since the r5 A/B (27.7 vs 28.6 ms/step); BDM_INTERP=gather
        # opts out.
        from bdm_tpu.ops.pallas.interp_mm import interp_mm
        return interp_mm(idx, w, centers_features)
    gathered = jnp.take_along_axis(
        centers_features, idx.reshape(b, n * 3, 1), axis=1).reshape(b, n, 3, c)
    return jnp.sum(gathered * w[..., None], axis=2)
