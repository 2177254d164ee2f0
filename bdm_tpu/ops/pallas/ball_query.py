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


def _bq_rank_kernel(cx_ref, cy_ref, cz_ref, px_ref, py_ref, pz_ref,
                    tri_ref, trik_ref, out_ref, c3_ref, cnt_ref, cex_ref,
                    oh_ref, *, radius2: float, num_neighbors: int):
    """Rank-form first-U selection: O(M*N) mask/cumsum work + O(U*M*128)
    extraction, vs the min-extraction kernel's O(U*M*N).

    Layout strategy: every dynamic index lands on an outer/sublane dim of
    an f32 ref (the Mosaic-safe pattern). Points arrive pre-chunked as
    (B*nk, 128) rows; chunk-local inclusive hit cumsums c3 live as
    (nk, m_tile, 128); per-chunk counts and their exclusive cumsum live
    as (nk, m_tile) so the nk-cumsum is a LEFT matmul by a triangular
    matrix (no in-kernel transpose). All f32 — counts <= 4096 and 0/1
    masks are exact through the MXU.
    """
    b, m_tile = cx_ref.shape
    nk = c3_ref.shape[0]
    n = nk * 128
    # int32 iota + cast: tpu.iota only produces integer vectors (a float
    # broadcasted_iota fails Mosaic verification on real hardware)
    lanes = jax.lax.broadcasted_iota(
        jnp.int32, (m_tile, 128), 1).astype(jnp.float32)
    k_iota = jax.lax.broadcasted_iota(
        jnp.int32, (nk, m_tile), 0).astype(jnp.float32)

    def batch_body(bb, _):
        cx = cx_ref[pl.ds(bb, 1), :].reshape(m_tile, 1)
        cy = cy_ref[pl.ds(bb, 1), :].reshape(m_tile, 1)
        cz = cz_ref[pl.ds(bb, 1), :].reshape(m_tile, 1)

        def chunk_body(k, _):
            row = bb * nk + k
            px = px_ref[pl.ds(row, 1), :].reshape(1, 128)
            py = py_ref[pl.ds(row, 1), :].reshape(1, 128)
            pz = pz_ref[pl.ds(row, 1), :].reshape(1, 128)
            dx = cx - px
            dy = cy - py
            dz = cz - pz
            d2 = dx * dx + dy * dy + dz * dz
            mask = (d2 < radius2).astype(jnp.float32)       # (TM, 128)
            # inclusive local cumsum: tri[j, l] = [j <= l]
            c = jax.lax.dot(mask, tri_ref[:, :],
                            preferred_element_type=jnp.float32)
            c3_ref[k] = c
            cnt_ref[pl.ds(k, 1), :] = c[:, 127].reshape(1, m_tile)
            return 0

        jax.lax.fori_loop(0, nk, chunk_body, 0)
        # exclusive cumsum over chunks: trik[j, k] = [k < j], so
        # (trik @ cnt)[j] = sum_{k<j} cnt[k]
        cex_ref[:, :] = jax.lax.dot(
            trik_ref[:, :], cnt_ref[:, :],
            preferred_element_type=jnp.float32)             # (nk, TM)

        def u_body(u, _):
            uf = u.astype(jnp.float32)
            cex = cex_ref[:, :]
            cnt = cnt_ref[:, :]
            oh_ref[:, :] = jnp.where((cex <= uf) & (uf < cex + cnt),
                                     1.0, 0.0)
            onehot = oh_ref[:, :]
            k_sel = jnp.sum(onehot * k_iota, axis=0)        # (TM,)
            cex_sel = jnp.sum(onehot * cex, axis=0)         # (TM,)

            def gather_body(k, acc):
                w = oh_ref[pl.ds(k, 1), :].reshape(m_tile, 1)
                return acc + w * c3_ref[k]

            c_sel = jax.lax.fori_loop(
                0, nk, gather_body,
                jnp.zeros((m_tile, 128), jnp.float32))      # (TM, 128)
            # the u-th hit is the FIRST lane whose inclusive cumsum
            # reaches u - cex + 1 (later lanes in the run are misses)
            target = (uf - cex_sel + 1.0)[:, None]
            lane_min = jnp.min(jnp.where(c_sel == target, lanes, 128.0),
                               axis=1)                      # (TM,)
            out = jnp.where(lane_min < 128.0,
                            k_sel * 128.0 + lane_min,
                            jnp.float32(n)).astype(jnp.int32)
            out_ref[bb, pl.ds(u, 1), :] = out[None, :]
            return 0

        jax.lax.fori_loop(0, num_neighbors, u_body, 0)
        return 0

    jax.lax.fori_loop(0, b, batch_body, 0)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def ball_query_rank_pallas(centers: jnp.ndarray, points: jnp.ndarray,
                           radius: float, num_neighbors: int,
                           interpret: bool = False) -> jnp.ndarray:
    """Rank-form ball query. centers (B, M, 3), points (B, N, 3) ->
    (B, M, U) int32. Requires N % 128 == 0."""
    b, m, _ = centers.shape
    n = points.shape[1]
    u = int(num_neighbors)
    assert n % 128 == 0, n
    nk = n // 128
    tile_m = m if m < 128 else 128
    assert m % tile_m == 0, (m, tile_m)

    def split(x):
        return x[..., 0], x[..., 1], x[..., 2]

    cx, cy, cz = split(centers)
    px, py, pz = split(points)
    px, py, pz = (v.reshape(b * nk, 128) for v in (px, py, pz))

    li = jnp.arange(128, dtype=jnp.float32)
    tri = (li[:, None] <= li[None, :]).astype(jnp.float32)   # inclusive
    ki = jnp.arange(nk, dtype=jnp.float32)
    trik = (ki[None, :] < ki[:, None]).astype(jnp.float32)   # strict:
    # trik[j, k] = [k < j] so (trik @ cnt)[j] = sum_{k<j} cnt[k]

    center_spec = pl.BlockSpec((b, tile_m), lambda mi: (0, mi),
                               memory_space=pltpu.VMEM)
    point_spec = pl.BlockSpec((b * nk, 128), lambda mi: (0, 0),
                              memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_bq_rank_kernel, radius2=float(radius) ** 2,
                               num_neighbors=u)
    out = pl.pallas_call(
        kernel,
        grid=(m // tile_m,),
        out_shape=jax.ShapeDtypeStruct((b, u, m), jnp.int32),
        in_specs=[center_spec] * 3 + [point_spec] * 3 + [const_spec] * 2,
        out_specs=pl.BlockSpec((b, u, tile_m), lambda mi: (0, 0, mi),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nk, tile_m, 128), jnp.float32),
                        pltpu.VMEM((nk, tile_m), jnp.float32),
                        pltpu.VMEM((nk, tile_m), jnp.float32),
                        pltpu.VMEM((nk, tile_m), jnp.float32)],
        interpret=interpret,
    )(cx, cy, cz, px, py, pz, tri, trik)
    out = jnp.transpose(out, (0, 2, 1))                       # (B, M, U)
    first = out[..., 0:1]
    base = jnp.where(first < n, first, 0)
    return jnp.where(out < n, out, base)


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