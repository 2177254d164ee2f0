"""Voxelization / devoxelization.

Reference semantics:
  * coordinate normalization — reference `modules/voxelization.py:16-25`
  * avg_voxelize (scatter-mean)  — reference `functional/src/voxelization/vox.cu:19-121`
  * trilinear_devoxelize         — reference `functional/src/interpolate/trilinear_devox.cu:22-109`

TPU design: the scatter-mean is a `segment_sum` over flattened voxel ids
(one flat id space across the batch so a single segment-sum serves all
samples); the trilinear sample is a pure gather, so autodiff provides the
scatter-add backward of `trilinear_devox.cu:119-160` for free.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def normalize_coords(coords: jnp.ndarray, resolution: int, normalize: bool = True,
                     eps: float = 0.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Map raw point coordinates into the voxel cube [0, R-1].

    Replicates reference `modules/voxelization.py:16-25`: center by the mean,
    scale by twice the max point norm (so the cloud fits in [0, 1]), shift by
    0.5, scale to voxel units and clamp.

    Args:
        coords: (B, N, 3) raw point coordinates.
        resolution: voxel grid resolution R.
        normalize: if False, assumes coords already in [-1, 1].
        eps: small constant added to the normalizer.

    Returns:
        norm_coords: (B, N, 3) float coords in [0, R-1] (input to trilinear
            devoxelization).
        vox_coords: (B, N, 3) int32 rounded coords (input to avg_voxelize).
    """
    coords = jax.lax.stop_gradient(coords)
    centered = coords - coords.mean(axis=1, keepdims=True)
    if normalize:
        # max over points of the L2 norm, per sample
        norm = jnp.linalg.norm(centered, axis=-1, keepdims=True)  # (B, N, 1)
        denom = norm.max(axis=1, keepdims=True) * 2.0 + eps  # (B, 1, 1)
        norm_coords = centered / denom + 0.5
    else:
        norm_coords = (centered + 1.0) / 2.0
    norm_coords = jnp.clip(norm_coords * resolution, 0.0, resolution - 1)
    vox_coords = jnp.round(norm_coords).astype(jnp.int32)
    return norm_coords, vox_coords


def _flat_voxel_ids(vox_coords: jnp.ndarray, resolution: int) -> jnp.ndarray:
    """Flatten (B, N, 3) integer voxel coords to (B, N) ids in [0, R^3).

    Uses the reference's x-major layout: id = x*R^2 + y*R + z
    (`vox.cu:31`).
    """
    r = resolution
    return (vox_coords[..., 0] * (r * r)
            + vox_coords[..., 1] * r
            + vox_coords[..., 2])


class VoxelContext(NamedTuple):
    """Feature-independent voxelization state, computed once per
    (coords, resolution) and shared by every PVConv in a stage (the
    reference recomputes it inside each PVConv — `modules/pvconv.py:93`).

    Per-voxel counts are NOT precomputed: each scatter appends a ones
    column and divides by its own count channel — a +1-channel scatter is
    ~free while a standalone counts kernel cost ~1.4 ms per stage.
    """

    norm_coords: jnp.ndarray       # (B, N, 3) float in [0, R-1]
    ids: jnp.ndarray               # (B, N) int32 flat voxel id per point
    order: jnp.ndarray             # (B, N) int32 argsort of ids
    ids_sorted: jnp.ndarray        # (B, N) int32
    tile_lo: jnp.ndarray           # (B, T+1) int32, T = R^3/min(512,R^2)


def make_voxel_context(coords: jnp.ndarray, resolution: int,
                       normalize: bool = True,
                       eps: float = 0.0) -> VoxelContext:
    b, n, _ = coords.shape
    r3 = resolution ** 3
    norm_coords, vox_coords = normalize_coords(coords, resolution, normalize,
                                               eps)
    ids = _flat_voxel_ids(vox_coords, resolution).astype(jnp.int32)  # (B, N)
    order = jnp.argsort(ids, axis=1).astype(jnp.int32)
    ids_sorted = jnp.take_along_axis(ids, order, axis=1)
    # per-voxel-tile ranges of the sorted order (for the sorted-range
    # Pallas scatter): tile t covers voxel ids [t*TILE_V, (t+1)*TILE_V).
    # Granularity min(512, R^2): a tile never spans a D-slice boundary,
    # so the same tile_lo serves the padded-conv-layout scatter (whose
    # out blocks live inside one slice); total mask work is
    # tile_v-invariant (T * maxp * tile_v = R^3 * maxp either way).
    tile_v = min(512, resolution * resolution)
    t = r3 // tile_v
    tid = ids_sorted // tile_v                              # (B, N)
    counts = jnp.sum(
        tid[:, None, :] == jnp.arange(t, dtype=jnp.int32)[None, :, None],
        axis=-1)                                            # (B, T)
    tile_lo = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32),
         jnp.cumsum(counts, axis=1).astype(jnp.int32)], axis=1)
    return VoxelContext(norm_coords, ids, order, ids_sorted, tile_lo)


def _use_pallas_scatter() -> bool:
    from bdm_tpu.ops.sampling import _PALLAS_OVERRIDE
    if _PALLAS_OVERRIDE is not None:
        return _PALLAS_OVERRIDE
    return jax.default_backend() == "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def avg_voxelize_ctx(features: jnp.ndarray, ctx: VoxelContext,
                     resolution: int) -> jnp.ndarray:
    """Scatter-mean with a precomputed VoxelContext.

    On TPU the scatter-sum runs as a Pallas matmul-scatter (a one-hot
    (R^3-tile, N) mask contracted with the (N, C) features on the MXU —
    XLA's native scatter serializes at ~80 ns/row, ~27x off roofline at
    these sizes); elsewhere it is a sorted segment_sum. The gradient (a
    gather of grad/count, `vox.cu:85-112`) is supplied via custom_vjp.
    """
    return _avg_voxelize_ctx_fwd_impl(features, ctx, resolution)


def run_counts_sorted(ctx: VoxelContext) -> jnp.ndarray:
    """Per-SORTED-point occupancy of its voxel, from the sorted ids as run
    lengths (two O(B*N) scans — no scatter, no gather):

        run_start[p] = cummax(first_of_run ? p : -1)
        run_end[p]   = reverse-cummin(last_of_run ? p+1 : N)
        count[p]     = run_end - run_start

    Returns (B, N) float32 >= 1, aligned with ctx.order."""
    ids = ctx.ids_sorted
    b, n = ids.shape
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    first = jnp.concatenate(
        [jnp.ones((b, 1), bool), ids[:, 1:] != ids[:, :-1]], axis=1)
    last = jnp.concatenate(
        [ids[:, :-1] != ids[:, 1:], jnp.ones((b, 1), bool)], axis=1)
    run_start = jax.lax.cummax(jnp.where(first, idx, -1), axis=1)
    run_end = jax.lax.cummin(jnp.where(last, idx + 1, n), axis=1,
                             reverse=True)
    return (run_end - run_start).astype(jnp.float32)


def scatter_mean_contributions(features: jnp.ndarray, ctx: VoxelContext,
                               r3: int) -> jnp.ndarray:
    """Scatter-MEAN without a count channel or a grid-side division: each
    point's features are pre-divided by its voxel's occupancy
    (`run_counts_sorted` — O(B*N) instead of an O(B*R^3) grid pass).

    Returns (B, R^3, C) == avg_voxelize's mean grid (empty voxels zero).
    Consumers that shift/reduce the grid (the pre-contracted stage-0 tap
    sum) need no per-voxel division pass — the XLA grid-side division
    kept baiting layout assignment into 7 ms whole-grid transposes."""
    b, n, c = features.shape
    f_sorted = jnp.take_along_axis(features, ctx.order[..., None], axis=1)
    cnt = run_counts_sorted(ctx)                         # (B, N) >= 1
    fm = f_sorted.astype(jnp.float32) / cnt[..., None]
    flat_ids = (ctx.ids_sorted.astype(jnp.int32)
                + jnp.arange(b, dtype=jnp.int32)[:, None] * r3).reshape(-1)
    return jax.ops.segment_sum(
        fm.reshape(b * n, c), flat_ids, num_segments=b * r3,
        indices_are_sorted=True).reshape(b, r3, c)


def scatter_sums_raw(features, ctx, r3):
    """One scatter of [features | 1] -> the RAW (B, R^3, C+1) array with
    the count in the last channel — for consumers that fuse the count
    division themselves (a [..., :C] slice of the wide scatter output
    materializes a full copy: profiled 2.1 ms at C=864)."""
    return _scatter_augmented(features, ctx, r3)


def _scatter_sums_with_counts(features, ctx, r3):
    """One scatter of [features | 1] -> (sums (B, R^3, C), counts)."""
    c = features.shape[-1]
    out = _scatter_augmented(features, ctx, r3)
    return out[..., :c], out[..., c]


def _scatter_augmented(features, ctx, r3):
    ids = ctx.ids  # noqa: F841  (wide-channel path uses sorted ids)
    b, n, c = features.shape
    faug = jnp.concatenate(
        [features, jnp.ones((b, n, 1), features.dtype)], axis=-1)
    # sorted-range matmul-scatter wins below ~128 channels (XLA's serial
    # scatter is the bottleneck there); at C=390 the mask matmul's FLOPs
    # exceed the scatter cost, so wide channels stay on sorted segment_sum
    # (~1.8x faster than the unsorted scatter)
    f_sorted = jnp.take_along_axis(faug, ctx.order[..., None], axis=1)
    if _use_pallas_scatter() and c < 128:
        from bdm_tpu.ops.pallas.voxelize import scatter_sum_sorted_pallas
        # f32 at the kernel boundary: Mosaic cannot prove alignment of the
        # kernel's DYNAMIC sublane-dim slices for 16-bit element types
        # ("index in dimension 1 is a multiple of 8"); the kernel casts to
        # bf16 in VMEM for the MXU contraction anyway
        out = scatter_sum_sorted_pallas(
            f_sorted.astype(jnp.float32), ctx.ids_sorted, ctx.tile_lo, r3,
            tile_v=r3 // (ctx.tile_lo.shape[1] - 1))        # (B, R^3, C+1)
    else:
        flat_ids = (ctx.ids_sorted.astype(jnp.int32)
                    + jnp.arange(b, dtype=jnp.int32)[:, None] * r3
                    ).reshape(-1)
        out = jax.ops.segment_sum(
            f_sorted.reshape(b * n, c + 1).astype(jnp.float32), flat_ids,
            num_segments=b * r3,
            indices_are_sorted=True).reshape(b, r3, c + 1)
    return out


def _avg_voxelize_ctx_fwd_impl(features, ctx, resolution):
    """Pre-divided scatter-mean: each point's contribution is divided by
    its voxel's occupancy BEFORE the scatter (`run_counts_sorted` — two
    O(B*N) scans on the sorted ids), so no count channel is scattered and
    no O(B*R^3) grid-side division pass exists. At the production widths
    this removed a 1.17 ms divide+cast fusion and a 0.22 ms count
    extraction per stage-0 step (profiled r3)."""
    b, n, c = features.shape
    r3 = resolution ** 3
    f_sorted = jnp.take_along_axis(features, ctx.order[..., None], axis=1)
    cnt = run_counts_sorted(ctx)                          # (B, N) >= 1
    fm = f_sorted.astype(jnp.float32) / cnt[..., None]
    if _use_pallas_scatter() and c < 128:
        from bdm_tpu.ops.pallas.voxelize import scatter_sum_sorted_pallas
        out = scatter_sum_sorted_pallas(
            fm, ctx.ids_sorted, ctx.tile_lo, r3,
            tile_v=r3 // (ctx.tile_lo.shape[1] - 1))      # (B, R^3, C)
    else:
        flat_ids = (ctx.ids_sorted.astype(jnp.int32)
                    + jnp.arange(b, dtype=jnp.int32)[:, None] * r3
                    ).reshape(-1)
        out = jax.ops.segment_sum(
            fm.reshape(b * n, c), flat_ids, num_segments=b * r3,
            indices_are_sorted=True).reshape(b, r3, c)
    return out.reshape(b, resolution, resolution, resolution, c)


def _avg_voxelize_ctx_fwd(features, ctx, resolution):
    # zero-size dtype carrier: the bwd must return grads in the PRIMAL
    # features dtype (bf16 under mixed precision), which residual arrays
    # otherwise don't record
    proto = jnp.zeros((0,), features.dtype)
    return _avg_voxelize_ctx_fwd_impl(features, ctx, resolution), (ctx,
                                                                   proto)


def _avg_voxelize_ctx_bwd(resolution, res, g):
    """d mean/d feature = grad[voxel(p)] / count[voxel(p)] — one gather
    (matches `avg_voxelize_grad_kernel`, `vox.cu:85-112`). The counts grid
    is rebuilt here (one 1-channel segment-sum) so the forward never
    scatters a count channel — only the training path pays it."""
    ctx, proto = res
    b = g.shape[0]
    r3 = resolution ** 3
    c = g.shape[-1]
    flat_ids = (ctx.ids_sorted.astype(jnp.int32)
                + jnp.arange(b, dtype=jnp.int32)[:, None] * r3).reshape(-1)
    counts = jax.ops.segment_sum(
        jnp.ones((b * ctx.ids_sorted.shape[1],), jnp.float32), flat_ids,
        num_segments=b * r3, indices_are_sorted=True).reshape(b, r3)
    inv = 1.0 / jnp.maximum(counts, 1.0)
    g_flat = g.reshape(b, r3, c) * inv[..., None]             # (B, R^3, C)
    grad_feats = jnp.take_along_axis(g_flat, ctx.ids[..., None].astype(
        jnp.int32), axis=1).astype(proto.dtype)
    ctx_zero = jax.tree_util.tree_map(
        lambda x: (np.zeros(x.shape, jax.dtypes.float0)
                   if jnp.issubdtype(x.dtype, jnp.integer)
                   else jnp.zeros_like(x)), ctx)
    return (grad_feats, ctx_zero)


avg_voxelize_ctx.defvjp(_avg_voxelize_ctx_fwd, _avg_voxelize_ctx_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def avg_voxelize_padded_ctx(features: jnp.ndarray, ctx: VoxelContext,
                            resolution: int,
                            out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Scatter-mean emitted directly in the D-padded conv layout
    (B, R+2, R*R, C) `out_dtype` — rows [1, R+1) hold the voxel means,
    rows 0 / R+1 are zero. On TPU one Pallas kernel produces it
    (`scatter_sum_sorted_padded_pallas`), replacing the profiled
    scatter -> bf16 cast -> pad chain of the wide stage-0 conv
    (2.0 + 1.2 + 0.8 ms/step at C=390). The f32->out_dtype rounding
    happens once at the store, the same point as the standalone
    pipeline's cast."""
    return _avg_voxelize_padded_fwd_impl(features, ctx, resolution,
                                         out_dtype)


def _avg_voxelize_padded_fwd_impl(features, ctx, resolution, out_dtype):
    b, n, c = features.shape
    r3 = resolution ** 3
    f_sorted = jnp.take_along_axis(features, ctx.order[..., None], axis=1)
    cnt = run_counts_sorted(ctx)                          # (B, N) >= 1
    fm = f_sorted.astype(jnp.float32) / cnt[..., None]
    if _use_pallas_scatter():
        from bdm_tpu.ops.pallas.voxelize import \
            scatter_sum_sorted_padded_pallas
        # f32 at the kernel boundary: Mosaic cannot prove alignment of
        # dynamic sublane slices of 16-bit blocks ("index in dimension 1
        # is a multiple of 8"); the kernel casts to bf16 in VMEM
        return scatter_sum_sorted_padded_pallas(
            fm, ctx.ids_sorted, ctx.tile_lo, resolution, out_dtype)
    flat_ids = (ctx.ids_sorted.astype(jnp.int32)
                + jnp.arange(b, dtype=jnp.int32)[:, None] * r3).reshape(-1)
    out = jax.ops.segment_sum(
        fm.reshape(b * n, c), flat_ids, num_segments=b * r3,
        indices_are_sorted=True).reshape(
        b, resolution, resolution * resolution, c)
    return jnp.pad(out, ((0, 0), (1, 1), (0, 0), (0, 0))).astype(out_dtype)


def _avg_voxelize_padded_fwd(features, ctx, resolution, out_dtype):
    proto = jnp.zeros((0,), features.dtype)
    return (_avg_voxelize_padded_fwd_impl(features, ctx, resolution,
                                          out_dtype), (ctx, proto))


def _avg_voxelize_padded_bwd(resolution, out_dtype, res, g):
    # strip the zero D-pad rows, then the standard gather-of-grad/count
    g = g[:, 1:resolution + 1].astype(jnp.float32)
    return _avg_voxelize_ctx_bwd(resolution, res, g)


avg_voxelize_padded_ctx.defvjp(_avg_voxelize_padded_fwd,
                               _avg_voxelize_padded_bwd)


def avg_voxelize(features: jnp.ndarray, vox_coords: jnp.ndarray,
                 resolution: int) -> jnp.ndarray:
    """Scatter-mean point features into an R^3 voxel grid.

    Matches `avg_voxelize` (`vox.cu:48-121`): each voxel holds the mean of
    the features of the points that fall in it; empty voxels are zero. The
    gradient (gather of grad/count) matches `avg_voxelize_grad_kernel`
    because the primal is expressed as segment_sum / count.

    Args:
        features: (B, N, C).
        vox_coords: (B, N, 3) int32 in [0, R).
        resolution: R.

    Returns:
        (B, R, R, R, C) voxel grid.
    """
    b, n, c = features.shape
    r3 = resolution ** 3
    ids = _flat_voxel_ids(vox_coords, resolution)  # (B, N)
    order = jnp.argsort(ids, axis=1)
    ids = jnp.take_along_axis(ids, order, axis=1)
    features = jnp.take_along_axis(features, order[..., None], axis=1)
    # One flat segment space across the batch: sample b's voxel v -> b*r3 + v.
    flat_ids = (ids + jnp.arange(b, dtype=ids.dtype)[:, None] * r3).reshape(-1)
    flat_feats = features.reshape(b * n, c)
    sums = jax.ops.segment_sum(flat_feats, flat_ids, num_segments=b * r3,
                               indices_are_sorted=True)
    counts = jax.ops.segment_sum(
        jnp.ones((b * n,), dtype=features.dtype), flat_ids,
        num_segments=b * r3, indices_are_sorted=True)
    out = sums / jnp.maximum(counts, 1.0)[:, None]
    return out.reshape(b, resolution, resolution, resolution, c)


def trilinear_devoxelize(grid: jnp.ndarray, norm_coords: jnp.ndarray) -> jnp.ndarray:
    """Trilinearly sample a voxel grid at fractional point coordinates.

    Matches `trilinear_devoxelize_kernel` (`trilinear_devox.cu:22-109`),
    including its corner rule: the upper corner along an axis is lo+1 only
    when the fractional part is strictly positive (the kernel encodes this
    as `x_hi = (x_d_1 > 0) ? -1 : 0` and masks the stride with it), which
    keeps indices in range because coords are pre-clamped to [0, R-1].

    On TPU this dispatches to the window-gather form (one gather of
    (2,2,2,C) neighborhoods instead of 8 row gathers — XLA's row gather
    runs ~20x off roofline at these sizes and its cost scales with the
    START count, not bytes).

    Args:
        grid: (B, R, R, R, C) voxel features.
        norm_coords: (B, N, 3) float coords in [0, R-1].

    Returns:
        (B, N, C) per-point features.
    """
    b, r, _, _, c = grid.shape
    n = norm_coords.shape[1]
    if _use_pallas_scatter() and r >= 2:
        return _trilinear_devoxelize_window(grid, norm_coords)

    lo_f = jnp.floor(norm_coords)
    frac = norm_coords - lo_f                      # (B, N, 3), in [0, 1)
    lo = lo_f.astype(jnp.int32)                    # (B, N, 3)
    step = (frac > 0).astype(jnp.int32)            # upper corner only if frac>0

    flat = grid.reshape(b, r * r * r, c)
    base = _flat_voxel_ids(lo, r)                  # (B, N)
    strides = (r * r, r, 1)

    # all 8 corners in ONE gather of (B, 8N) indices, then a weighted sum
    idx_list, w_list = [], []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                offs = (dx * step[..., 0] * strides[0]
                        + dy * step[..., 1] * strides[1]
                        + dz * step[..., 2] * strides[2])
                idx_list.append(base + offs)
                w_list.append(
                    (frac[..., 0] if dx else 1.0 - frac[..., 0])
                    * (frac[..., 1] if dy else 1.0 - frac[..., 1])
                    * (frac[..., 2] if dz else 1.0 - frac[..., 2]))
    idx = jnp.stack(idx_list, axis=2).reshape(b, n * 8)        # (B, 8N)
    w = jnp.stack(w_list, axis=2)                              # (B, N, 8)
    vals = jnp.take_along_axis(flat, idx[..., None],
                               axis=1).reshape(b, n, 8, c)
    return jnp.einsum("bnk,bnkc->bnc", w, vals,
                      precision=jax.lax.Precision.HIGHEST)


def _trilinear_devoxelize_window(grid: jnp.ndarray,
                                 norm_coords: jnp.ndarray) -> jnp.ndarray:
    """Window form of trilinear sampling: ONE gather of (2, 2, 2, C)
    neighborhoods per point, starts clamped to R-2 (so no pad/copy), with
    the corner rule folded into per-axis weight vectors:

      * frac > 0  -> weights (1-frac, frac) at window rows (0, 1)
                     (start = lo, which is <= R-2 whenever frac > 0)
      * frac == 0 -> weight 1 at window row (lo - start) in {0, 1}
                     (start = min(lo, R-2); row 1 only when lo == R-1)

    Equal to the 8-corner form to f32 rounding; the profile shows the
    gather cost follows the number of gather STARTS (N vs 8N), not bytes.
    """
    b, r, _, _, c = grid.shape
    n = norm_coords.shape[1]

    lo_f = jnp.floor(norm_coords)
    frac = norm_coords - lo_f                       # (B, N, 3) in [0, 1)
    lo = lo_f.astype(jnp.int32)
    start = jnp.minimum(lo, r - 2)                  # (B, N, 3)
    off = (lo - start).astype(jnp.float32)          # 0 or 1

    def per_sample(g, s):
        return jax.vmap(lambda st: jax.lax.dynamic_slice(
            g, (st[0], st[1], st[2], 0), (2, 2, 2, c)))(s)

    win = jax.vmap(per_sample)(grid, start)         # (B, N, 2, 2, 2, C)

    pos = jnp.asarray([0.0, 1.0])
    # per-axis (B, N, 2) weights
    def axis_w(fr, of):
        lerp = jnp.stack([1.0 - fr, fr], axis=-1)
        onehot = (of[..., None] == pos).astype(jnp.float32)
        return jnp.where((fr > 0)[..., None], lerp, onehot)

    wx = axis_w(frac[..., 0], off[..., 0])
    wy = axis_w(frac[..., 1], off[..., 1])
    wz = axis_w(frac[..., 2], off[..., 2])
    w = (wx[..., :, None, None] * wy[..., None, :, None]
         * wz[..., None, None, :])                  # (B, N, 2, 2, 2)
    if grid.dtype == jnp.bfloat16:
        # bf16 grids (mixed precision): keep the weighted sum in bf16 —
        # a HIGHEST-precision einsum forces f32 converts of every
        # gathered window (profiled ~0.33 ms per PVConv)
        return jnp.einsum("bnxyz,bnxyzc->bnc", w.astype(jnp.bfloat16),
                          win)
    return jnp.einsum("bnxyz,bnxyzc->bnc", w, win,
                      precision=jax.lax.Precision.HIGHEST)


def point_to_voxel_to_point(features: jnp.ndarray, coords: jnp.ndarray,
                            resolution: int, voxel_fn, normalize: bool = True,
                            eps: float = 0.0) -> jnp.ndarray:
    """Convenience: voxelize -> apply `voxel_fn` on the grid -> devoxelize.

    This is the PVConv data path (`modules/pvconv.py:91-97`).
    """
    norm_coords, vox_coords = normalize_coords(coords, resolution, normalize, eps)
    grid = avg_voxelize(features, vox_coords, resolution)
    grid = voxel_fn(grid)
    return trilinear_devoxelize(grid, norm_coords)
