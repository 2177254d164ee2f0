"""Matmul-form trilinear devoxelization over sorted point chunks.

XLA's window-gather devoxelize (`ops/voxelize.py:_trilinear_devoxelize_window`)
is START-bound: ~650 us per R=32 / N=4096 PVConv site (~20x its byte
cost), because each point issues one strided (2,2,2,C) gather. This
kernel reformulates the whole sample as MXU contractions, using the
voxel-sort the stage already owns (`VoxelContext.order`):

  * points ride in SORTED voxel-id order, chunked into maxp-aligned
    windows — a chunk's trilinear windows touch only a few adjacent
    D-slices of the grid (sorted ids are D-slice-major, `vox.cu:31`);
  * per chunk, the in-slice trilinear weight matrix
    `Wyz[p, col] = wy(p,col) * wz(p,col)` (4 nonzeros per row) is built
    ONCE from iota compares — the same one-hot-compare trick as the
    matmul scatter (`pallas/voxelize.py`) but with fractional weights;
  * the kernel loops over the chunk's slice range [xlo, xhi] and
    accumulates `(wx_s * Wyz) @ grid[s]` on the MXU, f32 accumulation.

Weight precision matches the bf16 window path: the wx*wy*wz product is
formed in f32 and rounded to bf16 exactly once, at the mask (the window
path rounds the same product at its einsum input); accumulation here is
f32 (the window path's bf16 einsum accumulates in bf16 — this kernel is
the more accurate of the two).

Reference semantics: `trilinear_devox.cu:22-109`, including the corner
rule — the upper corner is lo+1 only when frac > 0; at frac == 0 both
corners coincide and the compare-built mask ADDS their weights
((1-f) + f = 1) at the same column, which is exactly the reference's
masked-stride behavior.

Output rows are in SORTED order; the caller unsorts (or keeps the whole
stage sorted — see `ops/voxelize.py:trilinear_devoxelize_ctx`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _devox_mm_kernel(xlo_ref, xhi_ref, dq_ref, *refs, r: int, hw: int,
                     ht: int, maxp: int, c: int):
    *grid_refs, out_ref = refs
    b = pl.program_id(0)
    k = pl.program_id(1)
    dq = dq_ref[0]                                   # (maxp, 12) f32
    xc0, xc1 = dq[:, 0:1], dq[:, 1:2]
    wx0, wx1 = dq[:, 2:3], dq[:, 3:4]
    y0, y1 = dq[:, 4:5], dq[:, 5:6]
    wy0, wy1 = dq[:, 6:7], dq[:, 7:8]
    z0, z1 = dq[:, 8:9], dq[:, 9:10]
    wz0, wz1 = dq[:, 10:11], dq[:, 11:12]

    s0 = xlo_ref[b, k]
    s1 = xhi_ref[b, k]

    # The in-slice (hw) dimension is processed in STATIC tiles of ht
    # columns: the compare-built weight temporaries are (maxp, ht), not
    # (maxp, hw) — a hoisted full-width build blew Mosaic's scoped-vmem
    # stack (18.5M > 16M) at the R=32 / hw=1024 stage-0 site. The
    # compares are recomputed per D-slice iteration; that is a handful of
    # VPU elementwise passes against the MXU contraction they feed.
    # NOTE the t-loop is Python-unrolled, so Mosaic keeps every tile's
    # temporaries live at once — maxp bounds the real footprint (256
    # still measured 16.12M > 16M at that site; callers pass 128).
    def body(s, acc):
        sf = s.astype(jnp.float32)
        xw = wx0 * (sf == xc0) + wx1 * (sf == xc1)   # (maxp, 1)
        tparts = []
        for t in range(hw // ht):
            col = jax.lax.broadcasted_iota(jnp.int32, (1, ht), 1) + t * ht
            cy = (col // r).astype(jnp.float32)
            cz = (col % r).astype(jnp.float32)
            # in-slice weights: 2x2 window per point, coincident corners
            # at frac == 0 ADD their weights at the same column
            ay = wy0 * (cy == y0) + wy1 * (cy == y1)   # (maxp, ht)
            az = wz0 * (cz == z0) + wz1 * (cz == z1)
            m = (xw * (ay * az)).astype(jnp.bfloat16)  # one f32->bf16 round
            parts = []
            for gref in grid_refs:
                # the D-slice is a LEADING (untiled) block dim — a dynamic
                # index there is legal for bf16 blocks, where a dynamic
                # sublane-dim slice is not (Mosaic alignment proof); the
                # hw-tile slice is STATIC, so it is legal on the sublane dim
                g = gref[0, s, t * ht:(t + 1) * ht]    # (ht, <=128) bf16
                parts.append(
                    jnp.dot(m, g, preferred_element_type=jnp.float32))
            tparts.append(parts[0] if len(parts) == 1
                          else jnp.concatenate(parts, axis=1))
        return acc + sum(tparts)

    acc = jax.lax.fori_loop(s0, s1 + 1, body,
                            jnp.zeros((maxp, c), jnp.float32))
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def devox_mm_sorted_pallas(grid: jnp.ndarray, dq: jnp.ndarray,
                           xlo: jnp.ndarray, xhi: jnp.ndarray,
                           resolution: int, maxp: int = 256,
                           out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """grid (B, R*R*R, C) bf16 D-slice-major; dq (B, Np, 12) f32 per-point
    corner/weight table in SORTED voxel order (Np a multiple of maxp,
    padded rows all-zero); xlo/xhi (B, Np // maxp) int32 per-chunk
    inclusive D-slice bounds. Returns (B, Np, C) `out_dtype`, sorted
    order."""
    b, r3, c = grid.shape
    r = resolution
    hw = r * r
    assert r3 == r * hw, (grid.shape, resolution)
    npad = dq.shape[1]
    assert npad % maxp == 0 and maxp % 8 == 0, (npad, maxp)
    k = npad // maxp
    assert xlo.shape == (b, k) and xhi.shape == (b, k), (xlo.shape, k)

    grid = grid.astype(jnp.bfloat16)
    cpad = c if c <= 128 else -(-c // 128) * 128
    if cpad != c:
        grid = jnp.pad(grid, ((0, 0), (0, 0), (0, cpad - c)))
    ngroups = -(-cpad // 128)
    gw = cpad // ngroups
    assert gw * ngroups == cpad and gw <= 128

    # hw tile width: bounds the kernel's scoped-vmem temporaries at
    # (maxp, ht) while keeping full 128-lane tiles (hw = r*r >= 256 at
    # every production site; r=8 -> hw=64 stays one sub-width tile)
    ht = hw
    while ht > 256:
        ht //= 2
    kernel = functools.partial(_devox_mm_kernel, r=r, hw=hw, ht=ht,
                               maxp=maxp, c=cpad)
    grid4 = grid.reshape(b, r, hw, cpad)
    grid_specs = [
        pl.BlockSpec((1, r, hw, gw), lambda bi, ki, _g=g: (bi, 0, 0, _g),
                     memory_space=pltpu.VMEM)
        for g in range(ngroups)
    ]
    out = pl.pallas_call(
        kernel,
        grid=(b, k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # xlo
            pl.BlockSpec(memory_space=pltpu.SMEM),   # xhi
            pl.BlockSpec((1, maxp, 12), lambda bi, ki: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
        ] + grid_specs,
        out_specs=pl.BlockSpec((1, maxp, cpad), lambda bi, ki: (bi, ki, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, npad, cpad), out_dtype),
        interpret=jax.default_backend() != "tpu",
    )(xlo.astype(jnp.int32), xhi.astype(jnp.int32), dq,
      *([grid4] * ngroups))
    return out[..., :c] if cpad != c else out
