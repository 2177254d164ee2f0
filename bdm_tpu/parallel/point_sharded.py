"""Point-axis (sequence-parallel) geometry ops via shard_map.

The large-N scaling path (SURVEY.md §2.7): the (B, N, 3) point axis is
sharded over a mesh axis and each op reproduces the EXACT semantics of
its single-device counterpart — including the reference CUDA kernels'
scan-order and first-occurrence tie-break rules (`sampling.cu:103-148`,
`ball_query.cu:19-58`) — so results are bit-identical to the unsharded
ops and therefore to the reference.

Every shard_map here is MANUAL only over the "sp" axis (axis_names):
on a multi-axis mesh (e.g. ("dp", "sp")) the remaining axes stay
automatic, so the islands compose with data parallelism — GSPMD keeps
partitioning the batch dimension through them.

Collective pattern: per-shard partials + an O(P)-byte merge collective
(independent of N), the standard sequence-parallel recipe for
nearest-neighbor ops:

  * FPS — inherently iterative (each round depends on all previous
    selections): per round, a local first-max argmax, then a pmax on the
    value and a pmin on the candidate index (ties resolve to the lowest
    global index, exactly like a full argmax), and a psum broadcast of
    the winner's coordinates. M rounds -> 3 scalar-sized collectives per
    round riding ICI.
  * ball query — each shard selects its own first-U hits in scan order;
    the global first U is a subset of the union (any global first-U hit
    is within its shard's first U), so ONE all_gather of (P, U) keyed
    candidates + a top_k merge is exact.
  * 3-NN — centers are replicated, the query axis is embarrassingly
    parallel; no collective at all.

`chamfer_distance_sharded` (evaluation/metrics.py) is the same pattern
for the metric side.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

SP_AXIS = "sp"

_INF = jnp.float32(1e10)


def fps_point_sharded(coords: jnp.ndarray, num_samples: int, mesh: Mesh,
                      axis: str = SP_AXIS) -> jnp.ndarray:
    """Furthest point sampling with the point axis sharded over `mesh`.

    coords (B, N, 3) with N % mesh.shape[axis] == 0. Returns (B, M) int32
    GLOBAL indices, replicated — bit-identical to
    `ops.furthest_point_sample` (the per-point distance arithmetic is
    elementwise-identical on every shard, so fp ties break the same way).
    """
    coords = jax.lax.stop_gradient(coords)
    b, n, _ = coords.shape
    m = int(num_samples)
    p = mesh.shape[axis]
    assert n % p == 0, (n, p)
    shard_n = n // p

    def shard_fn(c):                                   # c: (B, N/P, 3)
        pid = jax.lax.axis_index(axis)
        off = (pid * shard_n).astype(jnp.int32)
        # global point 0 seeds the loop (reference `sampling.cu:103-105`);
        # it lives on shard 0 — psum broadcasts it
        last0 = jax.lax.psum(
            jnp.where(pid == 0, c[:, 0, :], 0.0), axis)        # (B, 3)
        indices0 = jnp.zeros((b, m), jnp.int32)
        # shard-local state: mark it varying over the mesh axis so the
        # fori_loop carry types match (jax>=0.9 tracks varying manual axes)
        dist0 = jax.lax.pcast(jnp.full((b, shard_n), _INF), (axis,),
                              to="varying")

        def body(j, carry):
            dist, last, indices = carry
            d = jnp.sum((c - last[:, None, :]) ** 2, axis=-1)
            dist = jnp.minimum(dist, d)
            li = jnp.argmax(dist, axis=-1).astype(jnp.int32)   # (B,)
            lv = jnp.take_along_axis(dist, li[:, None], axis=1)[:, 0]
            gi = li + off
            # merge: global max value, lowest global index among ties —
            # exactly jnp.argmax's first-occurrence rule on the full array
            vmax = jax.lax.pmax(lv, axis)
            best = jax.lax.pmin(
                jnp.where(lv == vmax, gi, jnp.int32(n)), axis)  # (B,)
            own = (best >= off) & (best < off + shard_n)
            lc = jnp.take_along_axis(
                c, jnp.clip(best - off, 0, shard_n - 1)[:, None, None],
                axis=1)[:, 0]
            last = jax.lax.psum(jnp.where(own[:, None], lc, 0.0), axis)
            indices = indices.at[:, j].set(best)
            return dist, last, indices

        if m == 1:
            return indices0
        _, _, indices = jax.lax.fori_loop(
            1, m, body, (dist0, last0, indices0))
        return indices

    return shard_map(shard_fn, mesh=mesh, axis_names=frozenset({axis}), in_specs=P(None, axis, None),
                     out_specs=P())(coords)


def ball_query_point_sharded(centers: jnp.ndarray, points: jnp.ndarray,
                             radius: float, num_neighbors: int, mesh: Mesh,
                             axis: str = SP_AXIS) -> jnp.ndarray:
    """Ball query (first-U-hits-in-scan-order) with the POINT axis
    sharded; centers replicated. Returns (B, M, U) int32 global indices,
    replicated — bit-identical to `ops.ball_query`.
    """
    centers = jax.lax.stop_gradient(centers)
    points = jax.lax.stop_gradient(points)
    b, mq, _ = centers.shape
    n = points.shape[1]
    u = int(num_neighbors)
    p = mesh.shape[axis]
    assert n % p == 0, (n, p)
    shard_n = n // p
    k_loc = min(u, shard_n)

    def shard_fn(cen, pts):        # cen: (B, M, 3); pts: (B, N/P, 3)
        pid = jax.lax.axis_index(axis)
        off = (pid * shard_n).astype(jnp.int32)
        d2 = jnp.zeros((b, mq, shard_n), jnp.float32)
        for ax3 in range(3):
            diff = (cen[..., ax3][:, :, None]
                    - pts[..., ax3][:, None, :])
            d2 = d2 + diff * diff
        mask = d2 < jnp.float32(radius) ** 2
        ids = off + jax.lax.broadcasted_iota(
            jnp.int32, (b, mq, shard_n), dimension=2)
        # a hit keeps its global index as key, a miss is pushed past N;
        # the first U local hits contain every global first-U hit that
        # falls in this shard
        keys = jnp.where(mask, ids, ids + n)
        neg, _ = jax.lax.top_k(-keys, k_loc)                  # (B, M, k)
        local = jnp.minimum(-neg, jnp.int32(n))               # clamp pads
        if k_loc < u:
            local = jnp.pad(local, ((0, 0), (0, 0), (0, u - k_loc)),
                            constant_values=n)
        allk = jax.lax.all_gather(local, axis)                # (P,B,M,U)
        merged = jnp.moveaxis(allk, 0, 2).reshape(b, mq, p * u)
        neg_g, _ = jax.lax.top_k(-merged, u)
        return -neg_g                                          # (B, M, U)

    # check_vma=False: the all_gather+top_k merge computes the same value
    # on every shard, but vma tracking can't infer replication through
    # all_gather (it marks the output varying)
    hits = shard_map(
        shard_fn, mesh=mesh, axis_names=frozenset({axis}),
        in_specs=(P(None, None, None), P(None, axis, None)),
        out_specs=P(), check_vma=False)(centers, points)
    first = hits[..., 0:1]
    base = jnp.where(first < n, first, 0)
    return jnp.where(hits < n, hits, base).astype(jnp.int32)


def three_nn_point_sharded(points: jnp.ndarray, centers: jnp.ndarray,
                           mesh: Mesh, axis: str = SP_AXIS):
    """3-NN (indices into the replicated centers + inverse-distance
    weights) with the QUERY point axis sharded: embarrassingly parallel —
    the shard-local op already emits global center indices. Outputs stay
    point-sharded. Equal to `ops.three_nn`.
    """
    from bdm_tpu.ops.interpolate import three_nn

    def shard_fn(pts, cen):
        return three_nn(pts, cen, use_pallas=False)

    return shard_map(
        shard_fn, mesh=mesh, axis_names=frozenset({axis}),
        in_specs=(P(None, axis, None), P(None, None, None)),
        out_specs=(P(None, axis, None), P(None, axis, None)))(
        points, centers)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def fps_gather_point_sharded(coords: jnp.ndarray, num_samples: int,
                             mesh: Mesh, axis: str = SP_AXIS) -> jnp.ndarray:
    """FPS + coordinate gather under one jit (the `fps_gather`
    convenience, sharded). The gather runs on the replicated indices
    against the sharded coords via a second shard_map psum-gather."""
    idx = fps_point_sharded(coords, num_samples, mesh, axis)
    n = coords.shape[1]
    p = mesh.shape[axis]
    shard_n = n // p

    def shard_fn(c, i):
        pid = jax.lax.axis_index(axis)
        off = (pid * shard_n).astype(jnp.int32)
        own = (i >= off) & (i < off + shard_n)                # (B, M)
        lc = jnp.take_along_axis(
            c, jnp.clip(i - off, 0, shard_n - 1)[..., None], axis=1)
        return jax.lax.psum(jnp.where(own[..., None], lc, 0.0), axis)

    return shard_map(shard_fn, mesh=mesh, axis_names=frozenset({axis}),
                     in_specs=(P(None, axis, None), P(None, None)),
                     out_specs=P())(jax.lax.stop_gradient(coords), idx)


def gather_point_sharded(values: jnp.ndarray, indices: jnp.ndarray,
                         mesh: Mesh, axis: str = SP_AXIS) -> jnp.ndarray:
    """Gather rows of point-sharded `values` (B, N, C) at replicated
    GLOBAL indices (B, M) -> replicated (B, M, C): each shard gathers the
    rows it owns (clipped elsewhere, masked to zero), ONE psum merges.
    Equal to `jnp.take_along_axis(values, indices[..., None], axis=1)`.
    """
    n = values.shape[1]
    p = mesh.shape[axis]
    assert n % p == 0, (n, p)
    shard_n = n // p

    def shard_fn(v, i):
        pid = jax.lax.axis_index(axis)
        off = (pid * shard_n).astype(jnp.int32)
        own = (i >= off) & (i < off + shard_n)                # (B, M)
        lv = jnp.take_along_axis(
            v, jnp.clip(i - off, 0, shard_n - 1)[..., None], axis=1)
        return jax.lax.psum(jnp.where(own[..., None], lv,
                                      jnp.zeros((), lv.dtype)), axis)

    return shard_map(shard_fn, mesh=mesh, axis_names=frozenset({axis}),
                     in_specs=(P(None, axis, None), P(None, None)),
                     out_specs=P())(values, indices)


def voxel_grid_point_sharded(features: jnp.ndarray, coords: jnp.ndarray,
                             resolution: int, mesh: Mesh,
                             axis: str = SP_AXIS, normalize: bool = True,
                             eps: float = 0.0):
    """The point->voxel half of the PVConv voxel branch, point-sharded:
    sharded scatter-mean partials + ONE psum of the (tiny) grid.

    Returns (grid (B, R, R, R, C) replicated, norm_coords (B, N, 3)
    point-sharded). Matches `ops.make_voxel_context` +
    `ops.avg_voxelize_ctx` up to float-sum reassociation: the
    normalization stats ride O(B)-byte collectives (psum of coordinate
    sums, pmax of the per-shard max norm — `modules/voxelization.py:16-25`
    semantics), the scatter partials one (B, R^3, C+1) psum.
    """
    from bdm_tpu.ops.voxelize import _flat_voxel_ids
    b, n, c = features.shape
    r = int(resolution)
    p = mesh.shape[axis]
    assert n % p == 0, (n, p)

    def shard_fn(f, co):              # f: (B, N/P, C), co: (B, N/P, 3)
        co = jax.lax.stop_gradient(co)
        mean = jax.lax.psum(jnp.sum(co, axis=1), axis) / n      # (B, 3)
        centered = co - mean[:, None, :]
        if normalize:
            norm = jnp.linalg.norm(centered, axis=-1, keepdims=True)
            local_max = norm.max(axis=1, keepdims=True)         # (B,1,1)
            denom = jax.lax.pmax(local_max, axis) * 2.0 + eps
            norm_coords = centered / denom + 0.5
        else:
            norm_coords = (centered + 1.0) / 2.0
        norm_coords = jnp.clip(norm_coords * r, 0.0, r - 1)
        vox = jnp.round(norm_coords).astype(jnp.int32)
        ids = _flat_voxel_ids(vox, r)                           # (B, N/P)
        f32 = f.astype(jnp.float32)
        aug = jnp.concatenate(
            [f32, jnp.ones((b, f32.shape[1], 1), jnp.float32)], axis=-1)
        flat = (ids + jnp.arange(b, dtype=jnp.int32)[:, None]
                * (r ** 3)).reshape(-1)
        part = jax.ops.segment_sum(
            aug.reshape(-1, c + 1), flat,
            num_segments=b * r ** 3).reshape(b, r ** 3, c + 1)
        tot = jax.lax.psum(part, axis)                # (B, R^3, C+1)
        counts = jnp.maximum(tot[..., c:], 1.0)
        grid = (tot[..., :c] / counts).reshape(b, r, r, r, c)
        return grid.astype(f.dtype), norm_coords

    return shard_map(
        shard_fn, mesh=mesh, axis_names=frozenset({axis}),
        in_specs=(P(None, axis, None), P(None, axis, None)),
        out_specs=(P(), P(None, axis, None)), check_vma=False)(
        features, coords)


def devoxelize_point_sharded(grid: jnp.ndarray, norm_coords: jnp.ndarray,
                             mesh: Mesh, axis: str = SP_AXIS
                             ) -> jnp.ndarray:
    """Trilinear devoxelization with the query point axis sharded and the
    grid replicated — embarrassingly parallel (the voxel->point half of
    the PVConv branch). Equal to `ops.trilinear_devoxelize`."""
    from bdm_tpu.ops.voxelize import trilinear_devoxelize

    def shard_fn(g, nc):
        return trilinear_devoxelize(g, nc)

    return shard_map(
        shard_fn, mesh=mesh, axis_names=frozenset({axis}),
        in_specs=(P(), P(None, axis, None)),
        out_specs=P(None, axis, None))(grid, norm_coords)


def three_nn_interpolate_point_sharded(points: jnp.ndarray,
                                       centers: jnp.ndarray,
                                       centers_features: jnp.ndarray,
                                       mesh: Mesh, axis: str = SP_AXIS
                                       ) -> jnp.ndarray:
    """3-NN inverse-distance interpolation with the QUERY point axis
    sharded, centers + their features replicated: fully local, no
    collective (the FP upsample to the fine level). Equal to
    `ops.three_nn_interpolate`."""
    from bdm_tpu.ops.interpolate import three_nn_interpolate

    def shard_fn(pts, cen, cf):
        return three_nn_interpolate(pts, cen, cf)

    return shard_map(
        shard_fn, mesh=mesh, axis_names=frozenset({axis}),
        in_specs=(P(None, axis, None), P(None, None, None),
                  P(None, None, None)),
        out_specs=P(None, axis, None))(points, centers, centers_features)


def sp_active(sp_mesh, n: int, min_points: int,
              axis: str = SP_AXIS) -> bool:
    """Static (trace-time) predicate: shard this level's point axis?"""
    if sp_mesh is None:
        return False
    p = sp_mesh.shape.get(axis, 0)
    return p > 1 and n >= min_points and n % p == 0


def grouping_point_sharded(features: jnp.ndarray, indices: jnp.ndarray,
                           mesh: Mesh, axis: str = SP_AXIS) -> jnp.ndarray:
    """Neighbor-feature grouping with the FEATURE point axis sharded and
    the (B, M, U) global indices replicated (they come from
    `ball_query_point_sharded`). One all_gather of the feature shards
    rides ICI — the standard sequence-parallel recipe for arbitrary
    global-index gathers — then the gather itself is local. M is the
    downsampled center count (<= 1024), so the replicated output is
    small. Equal to `ops.grouping` bit-for-bit.
    """
    from bdm_tpu.ops.grouping import grouping
    b, n, c = features.shape
    p = mesh.shape[axis]
    shard_n = n // p

    def shard_fn(f, i):                 # f: (B, N/P, C), i: (B, M, U)
        allf = jax.lax.all_gather(f, axis)          # (P, B, N/P, C)
        full = jnp.moveaxis(allf, 0, 1).reshape(b, n, c)
        return grouping(full, i)

    return shard_map(
        shard_fn, mesh=mesh, axis_names=frozenset({axis}),
        in_specs=(P(None, axis, None), P(None, None, None)),
        out_specs=P(), check_vma=False)(features, indices)


def point_to_voxel_to_point_sharded(features: jnp.ndarray,
                                    coords: jnp.ndarray, resolution: int,
                                    voxel_fn, mesh: Mesh,
                                    axis: str = SP_AXIS,
                                    normalize: bool = True,
                                    eps: float = 0.0) -> jnp.ndarray:
    """The full PVConv voxel branch (`modules/pvconv.py:91-97`) with the
    point axis sharded — the piece that makes a large-N PVCNN2 stage run
    sequence-parallel end to end (SURVEY.md §2.7):

      * normalization stats: psum of coordinate sums (mean) + pmax of the
        per-shard max norm — O(B) bytes on ICI;
      * scatter-mean: per-shard segment-sum partials into the full
        (B, R^3, C+1) sums+counts grid, ONE psum merges them (the voxel
        grid is tiny next to a large-N point cloud);
      * `voxel_fn` (conv/GN/SE stack) runs replicated on the merged grid
        — closures must hold replicated values (model params are);
      * trilinear devoxelization: embarrassingly parallel per shard.

    Output stays point-sharded (B, N/P, C'). Matches
    `ops.point_to_voxel_to_point` up to psum reassociation (float sums
    in a different order).
    """
    from bdm_tpu.ops.voxelize import _flat_voxel_ids, trilinear_devoxelize
    b, n, c = features.shape
    r = int(resolution)
    p = mesh.shape[axis]
    assert n % p == 0, (n, p)

    def shard_fn(f, co):              # f: (B, N/P, C), co: (B, N/P, 3)
        co = jax.lax.stop_gradient(co)
        mean = jax.lax.psum(jnp.sum(co, axis=1), axis) / n      # (B, 3)
        centered = co - mean[:, None, :]
        if normalize:
            norm = jnp.linalg.norm(centered, axis=-1, keepdims=True)
            local_max = norm.max(axis=1, keepdims=True)         # (B,1,1)
            denom = jax.lax.pmax(local_max, axis) * 2.0 + eps
            norm_coords = centered / denom + 0.5
        else:
            norm_coords = (centered + 1.0) / 2.0
        norm_coords = jnp.clip(norm_coords * r, 0.0, r - 1)
        vox = jnp.round(norm_coords).astype(jnp.int32)
        ids = _flat_voxel_ids(vox, r)                           # (B, N/P)
        aug = jnp.concatenate(
            [f, jnp.ones((b, f.shape[1], 1), f.dtype)], axis=-1)
        flat = (ids + jnp.arange(b, dtype=jnp.int32)[:, None]
                * (r ** 3)).reshape(-1)
        part = jax.ops.segment_sum(
            aug.reshape(-1, c + 1), flat,
            num_segments=b * r ** 3).reshape(b, r ** 3, c + 1)
        tot = jax.lax.psum(part, axis)                # (B, R^3, C+1)
        counts = jnp.maximum(tot[..., c:], 1.0)
        grid = (tot[..., :c] / counts).reshape(b, r, r, r, c)
        out_grid = voxel_fn(grid)                     # replicated compute
        return trilinear_devoxelize(out_grid, norm_coords)

    return shard_map(
        shard_fn, mesh=mesh, axis_names=frozenset({axis}),
        in_specs=(P(None, axis, None), P(None, axis, None)),
        out_specs=P(None, axis, None), check_vma=False)(features, coords)
