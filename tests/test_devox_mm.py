"""Matmul-form sorted devoxelize (`ops/pallas/devox_mm.py`) vs the
reference 8-corner semantics (`trilinear_devox.cu:22-109`), interpret
mode on CPU. The kernel reads a bf16 grid and rounds the trilinear
weight product to bf16 once, so tolerances are bf16-scale."""

import jax
import jax.numpy as jnp
import numpy as np

from bdm_tpu import ops
from bdm_tpu.ops.voxelize import VoxelContext, _flat_voxel_ids

from test_ops import np_trilinear_devox


def _ctx_from_norm(norm: np.ndarray, r: int) -> VoxelContext:
    """VoxelContext from prescribed in-range norm coords (devox uses only
    norm_coords / order / ids_sorted; tile_lo is a scatter-side field)."""
    norm = jnp.asarray(norm)
    vox = jnp.round(norm).astype(jnp.int32)
    ids = _flat_voxel_ids(vox, r).astype(jnp.int32)
    order = jnp.argsort(ids, axis=1).astype(jnp.int32)
    ids_sorted = jnp.take_along_axis(ids, order, axis=1)
    dummy = jnp.zeros((norm.shape[0], 1), jnp.int32)
    return VoxelContext(norm, ids, order, ids_sorted, dummy)


def test_devox_mm_matches_reference(rng):
    r, n, c = 8, 512, 64
    grid = rng.standard_normal((2, r, r, r, c)).astype(np.float32)
    coords = rng.uniform(0, r - 1, size=(2, n, 3)).astype(np.float32)
    ctx = _ctx_from_norm(coords, r)
    got = np.asarray(ops.trilinear_devoxelize_ctx(
        jnp.asarray(grid), ctx)).astype(np.float32)
    want = np_trilinear_devox(grid.astype(np.float32), coords)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=0.08)


def test_devox_mm_multigroup_channels(rng):
    # c > 128 exercises the lane-group split (cpad=256, two MXU groups)
    r, n, c = 4, 256, 130
    grid = rng.standard_normal((1, r, r, r, c)).astype(np.float32)
    coords = rng.uniform(0, r - 1, size=(1, n, 3)).astype(np.float32)
    ctx = _ctx_from_norm(coords, r)
    got = np.asarray(ops.trilinear_devoxelize_ctx(
        jnp.asarray(grid), ctx)).astype(np.float32)
    want = np_trilinear_devox(grid, coords)
    np.testing.assert_allclose(got, want, atol=0.08)


def test_devox_mm_integer_coords_pick_exact_voxel(rng):
    # frac == 0: both corners coincide and the compare-built mask must ADD
    # their weights at the same column ((1-f) + f = 1), incl. at R-1
    r, n = 4, 256
    grid = rng.standard_normal((1, r, r, r, 8)).astype(np.float32)
    coords = rng.uniform(0, r - 1, size=(1, n, 3)).astype(np.float32)
    coords[0, 0] = (3.0, 3.0, 3.0)   # all-integer upper boundary
    coords[0, 1] = (0.0, 2.0, 3.0)
    coords[0, 2] = (1.0, 0.5, 2.0)   # mixed integer / fractional
    ctx = _ctx_from_norm(coords, r)
    got = np.asarray(ops.trilinear_devoxelize_ctx(jnp.asarray(grid), ctx))
    gb = np.asarray(jnp.asarray(grid).astype(jnp.bfloat16).astype(
        jnp.float32))
    np.testing.assert_allclose(got[0, 0], gb[0, 3, 3, 3], atol=1e-2)
    np.testing.assert_allclose(got[0, 1], gb[0, 0, 2, 3], atol=1e-2)
    np.testing.assert_allclose(
        got[0, 2], 0.5 * (gb[0, 1, 0, 2] + gb[0, 1, 1, 2]), atol=2e-2)


def test_devox_mm_sorted_out_roundtrip(rng):
    r, n, c = 8, 256, 16
    grid = rng.standard_normal((2, r, r, r, c)).astype(np.float32)
    coords = rng.uniform(0, r - 1, size=(2, n, 3)).astype(np.float32)
    ctx = _ctx_from_norm(coords, r)
    srt = ops.trilinear_devoxelize_ctx(jnp.asarray(grid), ctx,
                                       sorted_out=True)
    unsorted = ops.trilinear_devoxelize_ctx(jnp.asarray(grid), ctx)
    inv = jnp.argsort(ctx.order, axis=1)
    np.testing.assert_array_equal(
        np.asarray(jnp.take_along_axis(srt, inv[..., None], axis=1)),
        np.asarray(unsorted))


def test_devox_mm_in_pvconv_flag(rng, monkeypatch):
    """BDM_DEVOX=mm routes PVConv's devox through the sorted kernel and
    stays close to the default window path."""
    from bdm_tpu.models.pvcnn import PVConv
    from bdm_tpu.ops import sampling as _s

    monkeypatch.setattr(_s, "_PALLAS_OVERRIDE", True)
    feats = rng.standard_normal((1, 256, 16)).astype(np.float32)
    coords = rng.standard_normal((1, 256, 3)).astype(np.float32)
    m = PVConv(out_channels=16, resolution=4, dropout=0.0)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                    jnp.asarray(coords))
    base = m.apply(params, jnp.asarray(feats), jnp.asarray(coords))
    monkeypatch.setenv("BDM_DEVOX", "mm")
    got = m.apply(params, jnp.asarray(feats), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               atol=0.08, rtol=0.1)
