"""Blocked self-attention kernel for the PVConv voxel attention.

The production attention sites are small: S = R^3 voxel tokens (<= 4096)
or downsampled points (<= 1024) at C <= 128, WITHOUT the 1/sqrt(C) scale
(reference `modules/pvconv.py:51`). XLA compiles the einsum chain into a
Mosaic mega-fusion that runs ~5x off the MXU roofline at S=4096
(profiled 0.83 ms vs 0.17 roofline, r3). Here k/v stay fully resident in
VMEM (S*C bf16 <= 0.5 MB) and a q-block loop materializes only a
(BLK_Q, S) f32 logits tile — plain row softmax, no online rescaling
needed since the full row is in VMEM.

Numerics: logits accumulate f32 from bf16 q/k (the same MXU precision
XLA gives the einsum), softmax in f32 with rowmax subtraction, weights
cast to the v dtype for the second matmul — matching the XLA path in
`models/layers.py::Attention`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, out_ref):
    out_dt = out_ref.dtype
    q = q_ref[0]                                       # (BLK_Q, C)
    k = k_ref[0]                                       # (S, C)
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (BLK_Q, S)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    w = e / jnp.sum(e, axis=1, keepdims=True)
    out_ref[0] = jnp.dot(w.astype(v_ref.dtype), v_ref[0],
                         preferred_element_type=jnp.float32).astype(out_dt)


@functools.partial(jax.jit, static_argnums=(3,))
def _attention_pallas_fwd_only(q: jnp.ndarray, k: jnp.ndarray,
                               v: jnp.ndarray,
                               interpret: bool | None = None) -> jnp.ndarray:
    """q, k, v (B, S, C) -> softmax(q @ k^T) @ v, no 1/sqrt(C) scale.

    S must be a multiple of the q-block (512 or S itself when smaller).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, s, c = q.shape
    blk = min(512, s)
    assert s % blk == 0, (s, blk)

    return pl.pallas_call(
        _attn_kernel,
        grid=(b, s // blk),
        in_specs=[
            pl.BlockSpec((1, blk, c), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, c), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, c), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, c), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c), v.dtype),
        interpret=interpret,
    )(q, k, v)


@jax.custom_vjp
def attention_pallas(q: jnp.ndarray, k: jnp.ndarray,
                     v: jnp.ndarray) -> jnp.ndarray:
    """`softmax(q @ k^T) @ v` (no 1/sqrt(C) scale): Pallas forward,
    XLA-einsum backward.

    The kernel itself has no transpose rule, and PVConv training
    differentiates through the voxel attention (`modules/pvconv.py:51`
    sites) — so the VJP recomputes the attention weights in plain
    einsum/softmax form (f32 softmax, like both forwards) and applies
    the standard softmax/matmul cotangents. Forward numerics are the
    kernel's; backward numerics match the XLA fallback path in
    `models/layers.py::Attention` — the pair a training step would use
    anyway if the kernel were gated off."""
    return _attention_pallas_fwd_only(q, k, v)


def _attn_vjp_fwd(q, k, v):
    return _attention_pallas_fwd_only(q, k, v), (q, k, v)


def _attn_vjp_bwd(res, g):
    q, k, v = res
    logits = jnp.einsum("bic,bjc->bij", q, k,
                        preferred_element_type=jnp.float32)
    w32 = jax.nn.softmax(logits, axis=-1)              # (B, S, S) f32
    w = w32.astype(v.dtype)
    dv = jnp.einsum("bij,bic->bjc", w, g)
    dw = jnp.einsum("bic,bjc->bij", g, v,
                    preferred_element_type=jnp.float32)
    # softmax VJP: dlogits = w * (dw - sum_j(dw * w))
    dlogits = (w32 * (dw - jnp.sum(dw * w32, axis=-1, keepdims=True))
               ).astype(q.dtype)
    dq = jnp.einsum("bij,bjc->bic", dlogits, k)
    dk = jnp.einsum("bij,bic->bjc", dlogits, q)
    return dq, dk, dv


attention_pallas.defvjp(_attn_vjp_fwd, _attn_vjp_bwd)
