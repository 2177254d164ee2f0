"""Generative point-cloud metrics: MMD, Coverage, 1-NNA, JSD.

Rebuild of the reference's `pvd/utils/metrics.py` surface (SURVEY.md #49 —
TF1-era and effectively dead there) as clean batched JAX: all pairwise
chamfer distances are computed on device in tiles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bdm_tpu.evaluation.metrics import chamfer_distance


def pairwise_chamfer_matrix(a: jnp.ndarray, b: jnp.ndarray,
                            tile: int = 16) -> np.ndarray:
    """Chamfer distance between every pair: a (S, N, 3), b (R, M, 3) ->
    (S, R)."""
    s = a.shape[0]
    out = np.zeros((s, b.shape[0]), dtype=np.float32)

    @jax.jit
    def row(ai, b):
        return chamfer_distance(
            jnp.broadcast_to(ai[None], (b.shape[0],) + ai.shape), b,
            recenter=False)

    for i in range(s):
        out[i] = np.asarray(row(a[i], b))
    return out


def mmd_cov(sample: jnp.ndarray, reference: jnp.ndarray):
    """MMD-CD (mean over references of min distance to a sample) and
    Coverage (fraction of references matched by some sample)."""
    d = pairwise_chamfer_matrix(sample, reference)  # (S, R)
    mmd = float(d.min(axis=0).mean())
    cov = float(len(np.unique(d.argmin(axis=1))) / d.shape[1])
    return mmd, cov


def one_nna(sample: jnp.ndarray, reference: jnp.ndarray) -> float:
    """1-NN two-sample test accuracy (0.5 is ideal)."""
    s, r = sample.shape[0], reference.shape[0]
    allpc = jnp.concatenate([sample, reference], axis=0)
    d = pairwise_chamfer_matrix(allpc, allpc)
    np.fill_diagonal(d, np.inf)
    nn = d.argmin(axis=1)
    labels = np.arange(s + r) < s  # True = sample
    pred = nn < s
    return float((pred == labels).mean())


def jsd_between_point_cloud_sets(sample: np.ndarray, reference: np.ndarray,
                                 resolution: int = 28) -> float:
    """Jensen-Shannon divergence between voxel-occupancy marginals over
    [-0.5, 0.5]^3 (the standard PVD evaluation grid)."""

    def occupancy(clouds):
        grid = np.zeros(resolution ** 3, dtype=np.float64)
        for pc in np.asarray(clouds):
            ids = np.clip(((pc + 0.5) * resolution).astype(int), 0,
                          resolution - 1)
            flat = (ids[:, 0] * resolution + ids[:, 1]) * resolution \
                + ids[:, 2]
            grid[np.unique(flat)] += 1.0
        return grid / max(grid.sum(), 1e-12)

    p, q = occupancy(sample), occupancy(reference)
    m = 0.5 * (p + q)

    def kl(x, y):
        mask = x > 0
        return float(np.sum(x[mask] * np.log(x[mask] / y[mask])))

    return 0.5 * kl(p, m) + 0.5 * kl(q, m)
