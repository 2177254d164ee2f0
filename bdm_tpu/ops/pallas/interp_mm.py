"""3-NN interpolation as a one-hot weighted matmul on the MXU.

The gather form of `three_nn_interpolate` costs 3 gather starts per query
row (~6.6 ns/start serialized: 0.65 ms/step at the production
N=4096, M=1024, C=128 FP stage). But the same contraction

    out[n, :] = sum_k w_k[n] * F[idx_k[n], :]

is a matmul `out = W @ F` with W[n, m] = sum_k w_k[n] * (idx_k[n] == m) —
and W needs no scatter to build: three compares of the index columns
against a lane iota, accumulated in f32 and rounded once to bf16 for the
MXU contraction. One kernel per (batch, query-tile) keeps the centers
resident in VMEM and never materializes W in HBM.

Precision: W rides the MXU in bf16 (weights round once), features in
bf16 — the same rounding the devoxelize einsum takes under mixed
precision, which is why the dispatch (ops/interpolate.py) uses this
kernel only for bf16 feature inputs.

Reference semantics: `neighbor_interpolate.cu:51-80` (the weighted
blend; indices/weights come from `three_nn`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interp_mm_kernel(idx_ref, w_ref, feats_ref, out_ref):
    tn = idx_ref.shape[1]
    m = feats_ref.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (tn, m), 1)
    mask = jnp.zeros((tn, m), jnp.float32)
    for k in range(3):  # static sub-128 lane slices of loaded values
        idx_k = idx_ref[0, :, k].reshape(tn, 1)
        w_k = w_ref[0, :, k].reshape(tn, 1)
        mask = mask + jnp.where(idx_k == iota, w_k, 0.0)
    out_ref[0] = jax.lax.dot(
        mask.astype(jnp.bfloat16), feats_ref[0],
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(3,))
def _interp_mm_fwd_pallas(idx: jnp.ndarray, w: jnp.ndarray,
                          feats: jnp.ndarray,
                          interpret: bool) -> jnp.ndarray:
    b, n, _ = idx.shape
    m, c = feats.shape[1], feats.shape[2]
    tile_n = min(n, 512)
    assert n % tile_n == 0, (n, tile_n)
    return pl.pallas_call(
        _interp_mm_kernel,
        grid=(b, n // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, 3), lambda bi, ni: (bi, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, 3), lambda bi, ni: (bi, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, c), lambda bi, ni: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n, c), lambda bi, ni: (bi, ni, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), feats.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32), w.astype(jnp.float32), feats)


@jax.custom_vjp
def interp_mm(idx: jnp.ndarray, w: jnp.ndarray,
              feats: jnp.ndarray) -> jnp.ndarray:
    """idx (B, N, 3) i32, w (B, N, 3) f32, feats (B, M, C) -> (B, N, C).

    Equal to the gather form up to one bf16 rounding of the weights and
    the MXU's bf16-input / f32-accumulate contraction.
    """
    return _interp_mm_fwd_pallas(idx, w, feats,
                                 jax.default_backend() != "tpu")


def _interp_mm_fwd(idx, w, feats):
    # zero-size carrier records the features' (M, dtype) for the backward
    proto = jnp.zeros((0, feats.shape[1]), feats.dtype)
    return interp_mm(idx, w, feats), (idx, w, proto)


def _interp_mm_bwd(res, g):
    """dF = W^T @ g — a segment-sum of the 3N weighted cotangent rows
    (training only; the sampler never differentiates this)."""
    idx, w, proto = res
    b, n, _ = idx.shape
    m, c = proto.shape[1], g.shape[-1]
    rows = (g.astype(jnp.float32)[:, :, None, :]
            * w[..., None]).reshape(b, n * 3, c)
    flat = (idx.reshape(b, n * 3)
            + (jnp.arange(b, dtype=jnp.int32) * m)[:, None]).reshape(-1)
    df = jax.ops.segment_sum(rows.reshape(b * n * 3, c), flat,
                             num_segments=b * m).reshape(b, m, c)
    # idx/w carry no gradient: both derive from stop_gradient coordinates
    # (see three_nn), so their cotangents die upstream regardless
    return (jnp.zeros_like(idx), jnp.zeros_like(w),
            df.astype(proto.dtype))


interp_mm.defvjp(_interp_mm_fwd, _interp_mm_bwd)
