"""Matmul-scatter: voxel scatter-sum as one-hot contractions on the MXU.

XLA lowers scatter/segment-sum on TPU as a serial per-row loop (~80 ns per
update row — measured ~2.7 ms for a (B*R^3, 32) segment sum at B=8,
N=4096, ~27x off roofline). Reformulated as a matmul it runs on the wide
units: for a tile of voxels V, build the one-hot mask
`M[v, n] = (ids[n] == v)` in VMEM and contract `M @ feats` on the MXU.
The mask is exactly representable in bf16 (zeros/ones), so the matmul is
as accurate as a bf16-input / f32-accumulate matmul over the features —
the same precision every f32 matmul gets on this MXU by default.

Reference semantics: `avg_voxelize` forward sums (`vox.cu:48-83`); the
mean division and the backward live in `bdm_tpu.ops.voxelize`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scatter_kernel(ids_ref, feats_ref, out_ref):
    tile_v = out_ref.shape[1]
    n = ids_ref.shape[2]
    base = pl.program_id(1) * tile_v
    ids = ids_ref[0, 0, :].reshape(1, n)
    vox = base + jax.lax.broadcasted_iota(jnp.int32, (tile_v, 1), 0)
    mask = (ids == vox).astype(jnp.bfloat16)              # (TILE_V, N)
    out_ref[0] = jnp.dot(mask, feats_ref[0].astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnums=(2, 3))
def scatter_sum_pallas(features: jnp.ndarray, ids: jnp.ndarray,
                       num_segments: int,
                       interpret: bool = False) -> jnp.ndarray:
    """features (B, N, C) f32, ids (B, N) int32 in [0, num_segments) ->
    per-segment sums (B, num_segments, C) f32.

    Falls back to segment_sum shapes guard at the caller; requires
    num_segments % tile == 0 with tile = min(512, num_segments).
    """
    b, n, c = features.shape
    # total mask work is tile_v-invariant (N * num_segments compares), so
    # shrink the voxel tile for wide channels to stay inside VMEM
    tile_v = min(512 if c <= 128 else 128, num_segments)
    assert num_segments % tile_v == 0, (num_segments, tile_v)

    grid = (b, num_segments // tile_v)
    return pl.pallas_call(
        _scatter_kernel,
        grid=grid,
        in_specs=[
            # ids as (B, 1, N): the block's trailing dims equal the array's
            # (Mosaic requires trailing block dims divisible by (8, 128) or
            # exactly the array dims)
            pl.BlockSpec((1, 1, n), lambda bi, vi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda bi, vi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_v, c), lambda bi, vi: (bi, vi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, num_segments, c), jnp.float32),
        interpret=interpret,
    )(ids.astype(jnp.int32).reshape(b, 1, n), features)


# ----------------------------------------------------- sorted-range variant

def _scatter_sorted_kernel(lo_ref, ids_ref, feats_ref, out_ref, *,
                           tile_v: int, maxp: int):
    """Per (batch, voxel-tile): only the sorted-id range belonging to this
    tile is compared/contracted — the one-hot mask shrinks from
    (TILE_V, N) to (MAXP, TILE_V) per chunk (typically one chunk: the
    mean occupancy is N / num_tiles points per tile). Layout notes: ids
    ride as (N, 1) so the dynamic chunk slice lands on the SUBLANE dim
    (Mosaic rejects dynamic lane-dim offsets), and the contraction runs
    as dot_general over dim 0 of the (MAXP, TILE_V) mask — no transposes
    materialize. Wide features are processed in 128-lane groups (a
    dynamic sublane slice of a >128-lane block crashes the Mosaic
    toolchain outright); the mask is built once per chunk and shared."""
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    c = feats_ref.shape[-1]
    base = t_idx * tile_v
    vox_row = base + jax.lax.broadcasted_iota(jnp.int32, (1, tile_v), 1)
    groups = [(g, min(g + 128, c)) for g in range(0, c, 128)]

    start = lo_ref[b_idx, t_idx]
    end = lo_ref[b_idx, t_idx + 1]
    # dynamic-bound loop over the maxp-ALIGNED windows overlapping
    # [start, end): a cond-gated static chunk loop cost ~1 us of scalar
    # control flow per chunk per program (the padded variant measured
    # 12 ms/step at 32 chunks). Aligned windows are disjoint (no
    # double-count) and the id-mask alone filters other tiles' rows.
    k0 = start // maxp
    k1 = (end + maxp - 1) // maxp

    def body(k, a):
        s = k * maxp
        ids = ids_ref[0, pl.ds(s, maxp), :]                # (MAXP, 1)
        mask = (ids == vox_row).astype(jnp.bfloat16)
        parts = []
        for g0, g1 in groups:
            f = feats_ref[0, pl.ds(s, maxp), g0:g1].astype(
                jnp.bfloat16)
            parts.append(jax.lax.dot_general(
                mask, f, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))       # (TILE_V, g)
        return a + (parts[0] if len(parts) == 1
                    else jnp.concatenate(parts, axis=1))

    acc = jax.lax.fori_loop(k0, k1, body,
                            jnp.zeros((tile_v, c), jnp.float32))
    out_ref[0] = acc


# ------------------------------------------- sorted + padded-grid variant

def _scatter_sorted_padded_kernel(lo_ref, ids_ref, *refs,
                                  tile_v: int, maxp: int, bps: int,
                                  ntiles: int, c: int):
    """Sorted-range matmul-scatter writing DIRECTLY into the zero-padded
    (B, R+2, HW, C) grid layout the matmul-first conv consumes — the
    standalone scatter -> cast -> pad chain cost 2.0 + 1.2 + 0.8 ms/step
    at C=390 (profiled r3). Grid programs: the first and last `bps`
    programs zero the D-pad rows; the middle `ntiles` run the sorted-range
    contraction for voxel tile (t - bps). Accumulation is f32 in VMEM,
    rounded once at the (typically bf16) output store — the same rounding
    point as the standalone-scatter + cast pipeline.

    Wide channels arrive as MULTIPLE <=128-lane bf16 feature refs
    (`refs` = feats_g0, ..., feats_gk, out_ref): Mosaic crashes outright
    on a dynamic sublane slice of a block wider than 128 lanes even with
    static in-kernel lane groups (the lane split therefore happens at
    the BlockSpec level; the caller lane-pads C to a multiple of 128 and
    the result is sliced back before the store), and f32 refs at these
    widths blow the 16 MB scoped-vmem budget once double-buffered — so
    the refs are bf16, which in turn requires every dynamic sublane
    start to be a PROVABLE multiple of 8: the chunk loop walks
    maxp-ALIGNED windows (s = k * maxp with maxp % 8 == 0), which are
    also disjoint (no double counting) — tile filtering relies on the
    voxel-id mask alone (rows of neighbouring tiles inside a window
    fail the `ids == vox_row` compare)."""
    *feats_refs, out_ref = refs
    t = pl.program_id(1)
    b_idx = pl.program_id(0)
    n = ids_ref.shape[1]
    out_dt = out_ref.dtype
    is_pad = (t < bps) | (t >= bps + ntiles)

    @pl.when(is_pad)
    def _():
        out_ref[0, 0] = jnp.zeros((tile_v, c), out_dt)

    @pl.when(jnp.logical_not(is_pad))
    def _():
        t_idx = t - bps
        base = t_idx * tile_v
        vox_row = base + jax.lax.broadcasted_iota(
            jnp.int32, (1, tile_v), 1)
        start = lo_ref[b_idx, t_idx]
        end = lo_ref[b_idx, t_idx + 1]
        cpad = sum(f.shape[-1] for f in feats_refs)

        # dynamic-bound loop over exactly the maxp-ALIGNED windows that
        # overlap [start, end): a static chunk loop with lax.cond gates
        # cost ~1 us of scalar control flow per chunk per program —
        # 12 ms/step at maxp=128 (32 conds x 544 programs), dwarfing the
        # actual contraction. Aligned windows are provably 8-aligned
        # (bf16 dynamic-sublane rule), disjoint (no double counting),
        # and the id-mask alone filters neighbouring tiles' rows.
        k0 = start // maxp
        k1 = (end + maxp - 1) // maxp

        def body(k, a):
            s = k * maxp
            ids = ids_ref[0, pl.ds(s, maxp), :]             # (MAXP, 1)
            mask = (ids == vox_row).astype(jnp.bfloat16)
            parts = []
            for fr in feats_refs:
                f = fr[0, pl.ds(s, maxp), :]
                parts.append(jax.lax.dot_general(
                    mask, f,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            return a + (parts[0] if len(parts) == 1
                        else jnp.concatenate(parts, axis=1))

        acc = jax.lax.fori_loop(
            k0, k1, body, jnp.zeros((tile_v, cpad), jnp.float32))
        out_ref[0, 0] = acc[:, :c].astype(out_dt)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def scatter_sum_sorted_padded_pallas(features: jnp.ndarray,
                                     ids: jnp.ndarray,
                                     tile_lo: jnp.ndarray,
                                     resolution: int,
                                     out_dtype=jnp.bfloat16,
                                     tile_v: int | None = None,
                                     maxp: int | None = None
                                     ) -> jnp.ndarray:
    """Sorted-range matmul-scatter into a zero-padded conv layout.

    features (B, N, C) SORTED by voxel id (pre-divided contributions for
    a scatter-mean); ids (B, N) sorted; tile_lo as in
    scatter_sum_sorted_pallas (same tile_v granularity). Returns
    (B, R+2, R*R, C) `out_dtype`, rows [1, R+1) holding the (R^3, C)
    voxel sums slice-major and rows 0 / R+1 zero — exactly the D-padded
    input of conv3d_mm_pallas(prepadded=True).
    """
    b, n, c = features.shape
    r = resolution
    hw = r * r
    r3 = r * hw
    if tile_v is None:
        tile_v = min(512, hw)
    assert hw % tile_v == 0 and r3 % tile_v == 0, (r, tile_v)
    assert tile_lo.shape[1] == r3 // tile_v + 1, (
        tile_lo.shape, r3, tile_v)
    if maxp is None:
        # the mask CONTRACTION scales with maxp * tile_v * C (unlike the
        # narrow scatter, C is wide here): small chunks keep the useful
        # ratio high — mean occupancy is N / ntiles points per tile
        # (64 at the production stage-0), and the chunk loop still
        # covers clustered tiles (maxp=512 profiled 3.8 ms/step, 8x
        # wasted MACs)
        maxp = min(n, 128)
    maxp = min(maxp, n)
    assert maxp % 8 == 0, maxp
    if n % maxp:
        pad_n = (-n) % maxp
        ids = jnp.pad(ids, ((0, 0), (0, pad_n)), constant_values=r3)
        features = jnp.pad(features, ((0, 0), (0, pad_n), (0, 0)))
        n = n + pad_n
    bps = hw // tile_v                     # out blocks per D-slice
    ntiles = r3 // tile_v
    # lane-pad C to a multiple of 128 and hand the kernel <=128-lane
    # bf16 feature blocks (dynamic sublane slices of wider blocks crash
    # Mosaic; f32 refs blow scoped vmem); the kernel slices back to C
    features = features.astype(jnp.bfloat16)
    cpad = -(-c // 128) * 128 if c > 128 else c
    if cpad != c:
        features = jnp.pad(features, ((0, 0), (0, 0), (0, cpad - c)))
    ngroups = -(-cpad // 128)
    gw = cpad // ngroups
    assert gw * ngroups == cpad and gw <= 128

    kernel = functools.partial(_scatter_sorted_padded_kernel,
                               tile_v=tile_v, maxp=maxp, bps=bps,
                               ntiles=ntiles, c=c)

    def out_map(bi, t):
        row = jnp.where(t < bps, 0,
                        jnp.where(t >= bps + ntiles, r + 1,
                                  (t - bps) // bps + 1))
        col = jnp.where(t < bps, t,
                        jnp.where(t >= bps + ntiles, t - bps - ntiles,
                                  (t - bps) % bps))
        return (bi, row, col, 0)

    feat_specs = [
        pl.BlockSpec((1, n, gw), lambda bi, t, _g=g: (bi, 0, _g),
                     memory_space=pltpu.VMEM)
        for g in range(ngroups)
    ]
    return pl.pallas_call(
        kernel,
        grid=(b, ntiles + 2 * bps),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tile_lo, full
            pl.BlockSpec((1, n, 1), lambda bi, t: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + feat_specs,
        out_specs=pl.BlockSpec((1, 1, tile_v, c), out_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r + 2, hw, c), out_dtype),
        interpret=jax.default_backend() != "tpu",
    )(tile_lo.astype(jnp.int32), ids.astype(jnp.int32).reshape(b, n, 1),
      *([features] * ngroups))


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def scatter_sum_sorted_pallas(features: jnp.ndarray, ids: jnp.ndarray,
                              tile_lo: jnp.ndarray, num_segments: int,
                              interpret: bool | None = None,
                              tile_v: int | None = None,
                              maxp: int | None = None) -> jnp.ndarray:
    """Sorted-range matmul-scatter.

    features (B, N, C) SORTED by voxel id; ids (B, N) int32 sorted
    ascending; tile_lo (B, T+1) int32 — first sorted position belonging
    to each voxel tile (tile t covers ids [t*TILE_V, (t+1)*TILE_V)),
    with tile_lo[:, T] == N. Returns per-segment sums (B, num_segments, C).

    tile_v must match the granularity tile_lo was built for (default:
    the make_voxel_context granularity min(512, num_segments)). maxp is
    the per-chunk window height: mask-build and dot work scale with it,
    so smaller values win when per-tile occupancy is far below 1024 —
    the chunk loop covers clustered tiles either way.
    """
    b, n, c = features.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile_v is None:
        tile_v = min(512, num_segments)
    assert num_segments % tile_v == 0, (num_segments, tile_v)
    # tile_lo was built for a specific tile size; a mismatch silently
    # misindexes the ranges
    assert tile_lo.shape[1] == num_segments // tile_v + 1, (
        tile_lo.shape, num_segments, tile_v)
    if maxp is None:
        maxp = min(n, 1024)
    maxp = min(maxp, n)
    if n % maxp:
        # aligned windows must tile N: pad with an out-of-range id that
        # matches no vox_row (num_segments), zero features
        pad_n = (-n) % maxp
        ids = jnp.pad(ids, ((0, 0), (0, pad_n)),
                      constant_values=num_segments)
        features = jnp.pad(features, ((0, 0), (0, pad_n), (0, 0)))
        n = n + pad_n

    grid = (b, num_segments // tile_v)
    kernel = functools.partial(_scatter_sorted_kernel, tile_v=tile_v,
                               maxp=maxp)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tile_lo, full
            pl.BlockSpec((1, n, 1), lambda bi, vi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda bi, vi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_v, c), lambda bi, vi: (bi, vi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, num_segments, c), jnp.float32),
        interpret=interpret,
    )(tile_lo.astype(jnp.int32), ids.astype(jnp.int32).reshape(b, n, 1),
      features)
