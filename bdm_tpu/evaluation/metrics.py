"""Chamfer distance and F-score, batched on device.

Reference semantics:
  * CD — `evaluation_cd.py:111-132`: both clouds recentered by their mean,
    CD = mean-over-points of squared nearest-neighbor distance, summed over
    both directions (PyTorch3D `chamfer_distance` default), reported x1000.
  * F1 — `evaluation_f1.py:90-110`: precision/recall of min *squared*
    distance < threshold (default 0.01), F = 2PR/(P+R).

TPU design: one (N, M) distance matrix per pair via the |a|^2+|b|^2-2ab
expansion (MXU matmul, HIGHEST precision for exact thresholds), min over
rows/cols. At eval sizes (4096^2) this is a single fused kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_min_sqdist(a: jnp.ndarray, b: jnp.ndarray):
    """Min squared distance from each point of `a` to `b` and vice versa.

    a: (B, N, 3); b: (B, M, 3). Returns ((B, N), (B, M)).
    """
    a2 = jnp.sum(a * a, axis=-1)
    b2 = jnp.sum(b * b, axis=-1)
    ab = jnp.einsum("bnc,bmc->bnm", a, b,
                    precision=jax.lax.Precision.HIGHEST)
    d2 = a2[..., :, None] + b2[..., None, :] - 2.0 * ab
    d2 = jnp.maximum(d2, 0.0)
    return d2.min(axis=2), d2.min(axis=1)


def chamfer_distance(pred: jnp.ndarray, gt: jnp.ndarray,
                     recenter: bool = True) -> jnp.ndarray:
    """Symmetric squared chamfer distance per batch element (B,).

    Multiply by 1000 for the reference's reported scale."""
    if recenter:
        pred = pred - pred.mean(axis=1, keepdims=True)
        gt = gt - gt.mean(axis=1, keepdims=True)
    d_pg, d_gp = pairwise_min_sqdist(pred, gt)
    return d_pg.mean(axis=1) + d_gp.mean(axis=1)


def fscore(pred: jnp.ndarray, gt: jnp.ndarray, threshold: float = 0.01,
           recenter: bool = True):
    """F-score at a *squared*-distance threshold (reference default 0.01).

    Returns (f1, precision, recall), each (B,)."""
    if recenter:
        pred = pred - pred.mean(axis=1, keepdims=True)
        gt = gt - gt.mean(axis=1, keepdims=True)
    d_pg, d_gp = pairwise_min_sqdist(pred, gt)
    precision = (d_pg < threshold).mean(axis=1)
    recall = (d_gp < threshold).mean(axis=1)
    f1 = 2.0 * precision * recall / jnp.maximum(precision + recall, 1e-8)
    return f1, precision, recall


# ------------------------------------------------------------- point-sharded

def chamfer_distance_sharded(pred: jnp.ndarray, gt: jnp.ndarray, mesh,
                             axis: str = "dp",
                             recenter: bool = True) -> jnp.ndarray:
    """Chamfer distance with the PRED point axis sharded over a mesh.

    The large-N scaling path (SURVEY.md §2.7 "sequence parallel" analogue):
    each device holds an N/n_dev shard of pred and the full gt; the
    pred->gt direction is embarrassingly parallel, the gt->pred direction
    is a `pmin` over per-shard minima. Exact — equals `chamfer_distance`.

    pred: (B, N, 3) with N % mesh.size == 0; gt: (B, M, 3).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    if recenter:
        pred = pred - pred.mean(axis=1, keepdims=True)
        gt = gt - gt.mean(axis=1, keepdims=True)

    @jax.jit
    def run(pred, gt):
        def shard_fn(p_shard, gt_full):
            d_pg, d_gp = pairwise_min_sqdist(p_shard, gt_full)
            # pred->gt: every shard owns its rows -> mean of psum'd sums
            pg_sum = jax.lax.psum(d_pg.sum(axis=1), axis)
            # gt->pred: min over shards of the per-shard minima
            gp_min = jax.lax.pmin(d_gp, axis)
            return pg_sum, gp_min

        pg_sum, gp_min = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(None, axis, None), P(None, None, None)),
            out_specs=(P(), P(None, None)))(pred, gt)
        n = pred.shape[1]
        return pg_sum / n + gp_min.mean(axis=1)

    return run(pred, gt)


# ------------------------------------------------------------ earth mover's

def emd_sinkhorn(pred: jnp.ndarray, gt: jnp.ndarray, epsilon: float = 0.002,
                 iters: int = 50, recenter: bool = False) -> jnp.ndarray:
    """Entropy-regularized approximation of the earth mover's distance.

    The reference's EMD lived only in its dead TF1 metric code
    (`pvd/utils/metrics.py`, never importable); this is a working,
    jittable replacement: Sinkhorn iterations on the squared-distance
    cost with uniform marginals, reported as the transport-weighted mean
    distance (the usual point-cloud "EMD" convention, comparable to the
    matched-assignment distance as epsilon -> 0).

    pred: (B, N, 3); gt: (B, M, 3). Returns (B,) f32.
    """
    if recenter:
        pred = pred - pred.mean(axis=1, keepdims=True)
        gt = gt - gt.mean(axis=1, keepdims=True)
    n, m = pred.shape[1], gt.shape[1]
    p2 = jnp.sum(pred * pred, axis=-1)
    g2 = jnp.sum(gt * gt, axis=-1)
    pg = jnp.einsum("bnc,bmc->bnm", pred, gt,
                    precision=jax.lax.Precision.HIGHEST)
    c = jnp.sqrt(jnp.maximum(
        p2[..., :, None] + g2[..., None, :] - 2.0 * pg, 0.0))  # (B, N, M)

    log_k = -c / epsilon
    log_a = jnp.full((pred.shape[0], n), -jnp.log(n), c.dtype)
    log_b = jnp.full((pred.shape[0], m), -jnp.log(m), c.dtype)

    def body(carry, _):
        f, g = carry
        f = log_a - jax.nn.logsumexp(log_k + g[:, None, :], axis=2)
        g = log_b - jax.nn.logsumexp(log_k + f[:, :, None], axis=1)
        return (f, g), None

    (f, g), _ = jax.lax.scan(
        body, (jnp.zeros_like(log_a), jnp.zeros_like(log_b)), None,
        length=iters)
    pi = jnp.exp(log_k + f[:, :, None] + g[:, None, :])       # (B, N, M)
    return jnp.sum(pi * c, axis=(1, 2))
