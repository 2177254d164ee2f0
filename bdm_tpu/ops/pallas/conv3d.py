"""3x3x3 voxel convolution as im2col matmuls in VMEM.

XLA's conv3d on the PVConv grids compiles into layout-hostile fusions
(profiled 6.1 ms for the R=32 C=32 conv+GN in-graph vs 1.8 ms isolated,
plus ~0.8 ms layout copies). This kernel fixes the layout: the grid stays
(B, R, H*W, C) row-major; each program computes one output D-slice as
   out[d] = sum_dz col(in[d+dz-1]) @ W[dz]          (dz in {0, 1, 2})
where col(.) lays the 9 (dy, dx)-shifted copies of the (H*W, C) slice
side by side, so the whole tap reduction is ONE MXU contraction of
(H*W, 9C) x (9C, Cout) per dz. Shifts are static slice+concat rolls with
y/x border masks; the D border comes from an f32 zero-pad of the input
(three pipelined slice specs). Measured variants: pad+bf16-cast in HBM
cost 1.7 ms/conv; clamped (non-affine) index maps broke Mosaic's
pipelining (1.30 vs 0.86 ms); a VMEM-resident whole-grid variant OOMed
the Mosaic stack. f32-pad + in-kernel cast wins.

Reference semantics: `modules/pvconv.py:69-83` voxel_layers Conv3d
(stride 1, SAME). bf16 inputs / f32 accumulation — the same precision XLA
gives f32 convs on this MXU by default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(w_ref, b_ref, lo_ref, mid_ref, hi_ref, out_ref, *, h, w):
    hw = h * w
    cin = mid_ref.shape[-1]
    cout = out_ref.shape[-1]
    out_dt = out_ref.dtype

    rows = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)
    ys = rows // w
    xs = rows % w

    acc = jnp.zeros((hw, cout), jnp.float32)
    for dz, src in enumerate((lo_ref, mid_ref, hi_ref)):
        # D-borders come from the zero-padded input (pad in f32 is cheap;
        # a pad+bf16 cast fusion cost 1.7 ms, and clamped index maps broke
        # Mosaic's pipelining: 1.30 ms vs 0.86 ms per conv at R=32 C=32)
        slab = src[0, 0].astype(jnp.bfloat16)              # (HW, Cin)
        cols = []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                s = dy * w + dx
                if s:
                    # static circular shift by -s (rows are masked below,
                    # so the wrap-around content never survives)
                    k = s % hw
                    shifted = jnp.concatenate([slab[k:], slab[:k]], axis=0)
                else:
                    shifted = slab
                ok = ((ys + dy >= 0) & (ys + dy < h)
                      & (xs + dx >= 0) & (xs + dx < w))
                cols.append(jnp.where(ok, shifted, jnp.bfloat16(0)))
        col = jnp.concatenate(cols, axis=1)                # (HW, 9*Cin)
        acc = acc + jnp.dot(col, w_ref[pl.ds(dz * 9 * cin, 9 * cin), :],
                            preferred_element_type=jnp.float32)
    out_ref[0, 0] = (acc + b_ref[0, :]).astype(out_dt)


@functools.partial(jax.jit, static_argnums=(3, 4))
def conv3d_pallas(grid: jnp.ndarray, weights: jnp.ndarray,
                  bias: jnp.ndarray, resolution: int,
                  interpret: bool | None = None) -> jnp.ndarray:
    """grid (B, R, R, R, Cin) f32, weights (3, 3, 3, Cin, Cout),
    bias (Cout,) -> (B, R, R, R, Cout) in the input dtype (stride 1,
    SAME). Pass a bf16 grid to halve the pad + kernel input traffic (the
    matmuls are bf16-input/f32-accumulate either way)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, r, _, _, cin = grid.shape
    assert r == resolution
    cout = weights.shape[-1]
    hw = r * r
    out_dt = grid.dtype

    gp = jnp.pad(grid.reshape(b, r, hw, cin),
                 ((0, 0), (1, 1), (0, 0), (0, 0)))
    wm = weights.astype(jnp.bfloat16).reshape(27 * cin, cout)
    bm = bias.astype(jnp.float32).reshape(1, cout)

    def slice_spec(off):
        return pl.BlockSpec((1, 1, hw, cin),
                            lambda bi, d, _o=off: (bi, d + _o, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_conv_kernel, h=r, w=r),
        grid=(b, r),
        in_specs=[
            pl.BlockSpec((27 * cin, cout), lambda bi, d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bi, d: (0, 0),
                         memory_space=pltpu.VMEM),
            slice_spec(0), slice_spec(1), slice_spec(2),
        ],
        out_specs=pl.BlockSpec((1, 1, hw, cout),
                               lambda bi, d: (bi, d, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r, hw, cout), out_dt),
        interpret=interpret,
    )(wm, bm, gp, gp, gp)
    return out.reshape(b, r, r, r, cout)


# ------------------------------------------------------- differentiable form

def _xla_conv3d(grid, weights, bias):
    dn = jax.lax.conv_dimension_numbers(
        (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(
        grid, weights, (1, 1, 1), "SAME", dimension_numbers=dn) + bias


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3d(grid: jnp.ndarray, weights: jnp.ndarray, bias: jnp.ndarray,
           resolution: int) -> jnp.ndarray:
    """Differentiable 3x3x3 SAME conv over (B, R, R, R, C) grids: the
    Pallas im2col kernel forward (same bf16-input precision as XLA's
    default f32 conv on this MXU) with an XLA-conv backward."""
    return conv3d_pallas(grid, weights, bias, resolution)


def _conv3d_fwd(grid, weights, bias, resolution):
    return conv3d_pallas(grid, weights, bias, resolution), (grid, weights)


def _conv3d_bwd(resolution, res, g):
    grid, weights = res
    # grids may be bf16 while params stay f32: cast inside so the vjp
    # returns cotangents in the primal dtypes
    _, vjp = jax.vjp(
        lambda x, w, b: _xla_conv3d(x, w.astype(x.dtype), b.astype(x.dtype)),
        grid, weights, jnp.zeros((weights.shape[-1],), weights.dtype))
    return vjp(g.astype(grid.dtype))


conv3d.defvjp(_conv3d_fwd, _conv3d_bwd)


# ---------------------------------------------- whole-grid-per-batch form

def _conv_wg_kernel(w_ref, b_ref, g_ref, out_ref, *, h, w, r):
    """One program per BATCH: the full padded grid block sits in VMEM and
    a fori_loop walks the D slices (dynamic indexing on the untiled
    leading dim). vs the per-(batch, slice) kernel this runs R x fewer
    programs and DMAs each slab once instead of three times (the lo/mid/hi
    specs of neighbouring programs cannot share blocks)."""
    hw = h * w
    cin = g_ref.shape[-1]
    cout = out_ref.shape[-1]
    out_dt = out_ref.dtype

    rows = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)
    ys = rows // w
    xs = rows % w
    masks = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            masks.append((ys + dy >= 0) & (ys + dy < h)
                         & (xs + dx >= 0) & (xs + dx < w))

    def body(d, carry):
        acc = jnp.zeros((hw, cout), jnp.float32)
        for dz in range(3):
            slab = g_ref[0, d + dz].astype(jnp.bfloat16)    # (HW, Cin)
            cols = []
            j = 0
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    s = dy * w + dx
                    if s:
                        k = s % hw
                        shifted = jnp.concatenate([slab[k:], slab[:k]],
                                                  axis=0)
                    else:
                        shifted = slab
                    cols.append(jnp.where(masks[j], shifted,
                                          jnp.bfloat16(0)))
                    j += 1
            col = jnp.concatenate(cols, axis=1)             # (HW, 9*Cin)
            acc = acc + jnp.dot(col,
                                w_ref[pl.ds(dz * 9 * cin, 9 * cin), :],
                                preferred_element_type=jnp.float32)
        out_ref[0, d] = (acc + b_ref[0, :]).astype(out_dt)
        return carry

    jax.lax.fori_loop(0, r, body, 0)


@functools.partial(jax.jit, static_argnums=(3, 4))
def conv3d_wg_pallas(grid: jnp.ndarray, weights: jnp.ndarray,
                     bias: jnp.ndarray, resolution: int,
                     interpret: bool | None = None) -> jnp.ndarray:
    """Whole-grid-per-batch 3x3x3 SAME conv — same contract as
    conv3d_pallas. VMEM budget: padded grid bf16 + out + col matrix; fits
    for C <= 64 at R = 32 and any smaller stage."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, r, _, _, cin = grid.shape
    assert r == resolution
    cout = weights.shape[-1]
    hw = r * r
    out_dt = grid.dtype

    gp = jnp.pad(grid.reshape(b, r, hw, cin).astype(jnp.bfloat16),
                 ((0, 0), (1, 1), (0, 0), (0, 0)))
    wm = weights.astype(jnp.bfloat16).reshape(27 * cin, cout)
    bm = bias.astype(jnp.float32).reshape(1, cout)

    out = pl.pallas_call(
        functools.partial(_conv_wg_kernel, h=r, w=r, r=r),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((27 * cin, cout), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r + 2, hw, cin), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, hw, cout), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r, hw, cout), out_dt),
        interpret=interpret,
    )(wm, bm, gp)
    return out.reshape(b, r, r, r, cout)


# ------------------------------------------- multi-slice matmul variant

def _conv_ms_kernel(w_ref, b_ref, a_ref, n_ref, out_ref, scr_ref, *,
                    h, w, ds):
    """Per (batch, slice-GROUP): compute DS consecutive output D-slices.
    The per-slab kernels run B*R programs of one (HW, C) slice each —
    ~2.5 us/program of mostly fixed overhead at C<=64 (profiled 0.65 ms
    for R=32 C=64, ~2.4x off the MXU roofline). Here each program owns a
    DS-slice group; the halo (2 extra slices from the next group's
    aligned block) is assembled into a VMEM scratch window and a
    fori_loop walks the slices — the loop body's temporaries are REUSED
    across iterations (a fully unrolled version kept every slice's f32
    tap matrix live and blew the 16 MB scoped-vmem stack). Per output
    slice the three dz slabs are stacked channel-wise into ONE
    (HW, 3*Cin) @ (3*Cin, 9*Cout) MXU contraction (K = 3*Cin fills the
    systolic depth at C >= 43), then the 9 (dy, dx) blocks are
    accumulated with static row-rolls and border masks."""
    hw = h * w
    cout = out_ref.shape[-1]
    out_dt = out_ref.dtype

    scr_ref[0:ds] = a_ref[0]
    scr_ref[ds:ds + 2] = n_ref[0, 0:2]

    rows = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)
    ys = rows // w
    xs = rows % w
    masks = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            masks.append((ys + dy >= 0) & (ys + dy < h)
                         & (xs + dx >= 0) & (xs + dx < w))

    def body(i, carry):
        slab3 = jnp.concatenate(
            [scr_ref[i], scr_ref[i + 1], scr_ref[i + 2]],
            axis=-1)                                        # (HW, 3*Cin)
        m = jnp.dot(slab3, w_ref[...],
                    preferred_element_type=jnp.float32)     # (HW, 9*Cout)
        acc = jnp.zeros((hw, cout), jnp.float32)
        j = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                blk = m[:, j * cout:(j + 1) * cout]
                s = dy * w + dx
                if s:
                    k = s % hw
                    blk = jnp.concatenate([blk[k:], blk[:k]], axis=0)
                acc = acc + jnp.where(masks[j], blk, 0.0)
                j += 1
        out_ref[0, i] = (acc + b_ref[0, :]).astype(out_dt)
        return carry

    jax.lax.fori_loop(0, ds, body, 0)


def _conv_ms_pad_kernel(w_ref, b_ref, a_ref, n_ref, out_ref, scr_ref,
                        mp_ref, *, h, w, ds):
    """conv_ms with padded-window tap accumulation instead of masked
    rolls: the (HW, 9*Cout) tap matrix is stored into the center of a
    zero-bordered (H+2, W+2, 9*Cout) scratch, and each (dy, dx) tap is a
    STATIC window slice-add — one VPU add per tap element, replacing the
    roll-copy + border-select + add chain (the R=32 small-C convs are
    VPU-bound on exactly that chain: ms4 profiled 0.54 ms at C=64 vs a
    0.29 ms MXU roofline)."""
    hw = h * w
    cout = out_ref.shape[-1]
    out_dt = out_ref.dtype
    ncol = mp_ref.shape[-1]                                 # 9*Cout

    scr_ref[0:ds] = a_ref[0]
    scr_ref[ds:ds + 2] = n_ref[0, 0:2]
    # zero the pad border once; the center is overwritten every slice
    mp_ref[0] = jnp.zeros((w + 2, ncol), jnp.float32)
    mp_ref[h + 1] = jnp.zeros((w + 2, ncol), jnp.float32)
    mp_ref[1:h + 1, 0:1] = jnp.zeros((h, 1, ncol), jnp.float32)
    mp_ref[1:h + 1, w + 1:w + 2] = jnp.zeros((h, 1, ncol), jnp.float32)

    def body(i, carry):
        slab3 = jnp.concatenate(
            [scr_ref[i], scr_ref[i + 1], scr_ref[i + 2]],
            axis=-1)                                        # (HW, 3*Cin)
        m = jnp.dot(slab3, w_ref[...],
                    preferred_element_type=jnp.float32)     # (HW, 9*Cout)
        mp_ref[1:h + 1, 1:w + 1] = m.reshape(h, w, ncol)
        acc = jnp.zeros((h, w, cout), jnp.float32)
        j = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                acc = acc + mp_ref[1 + dy:1 + dy + h, 1 + dx:1 + dx + w,
                                   j * cout:(j + 1) * cout]
                j += 1
        out_ref[0, i] = (acc.reshape(hw, cout)
                         + b_ref[0, :]).astype(out_dt)
        return carry

    jax.lax.fori_loop(0, ds, body, 0)


def _ms_group_size(r: int, cin: int, cout: int) -> int:
    """Empirical slice-group size: Mosaic's scoped-vmem stack accounting
    is opaque (a modelled 6 MB case measured 18.45 MB), so this is a
    table from the TPU compile sweep (tools/experiment_conv_ms.py):
    ds=8 OOMs at R=32 for any C; ds=4 compiles and ties ds=2 on speed;
    R<=16 compiles at ds=8 for C<=256."""
    if r % 2:
        return 0                                # >= 2: halo needs 2 rows
    if r >= 32:
        return 4 if r % 4 == 0 else 2
    return max(d for d in (8, 4, 2) if r % d == 0)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def conv3d_ms_pallas(grid: jnp.ndarray, weights: jnp.ndarray,
                     bias: jnp.ndarray, resolution: int,
                     interpret: bool | None = None,
                     ds: int | None = None,
                     taps: str = "roll",
                     prepadded: bool = False) -> jnp.ndarray:
    """Multi-slice matmul-first 3x3x3 SAME conv (see _conv_ms_kernel).
    Same contract as conv3d_pallas. `ds` overrides the slice-group size
    (must divide R, >= 2); `taps` selects the in-kernel tap accumulation
    ("roll" = masked row-rolls, "pad" = zero-bordered scratch window).
    With `prepadded`, `grid` is already the D-padded (B, R+2, HW, Cin)
    bf16 layout that `scatter_sum_sorted_padded_pallas` emits; ds is then
    fixed to 2 (the only group size whose halo layout, 1 front + ds-1
    back zero rows, coincides with the R+2 pad — and ds=4 tied ds=2 on
    speed in the TPU sweep anyway)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if prepadded:
        b, rp2, hw, cin = grid.shape
        r = rp2 - 2
        assert r == resolution and hw == r * r, grid.shape
        assert r % 2 == 0 and taps == "roll", (r, taps)
        cout = weights.shape[-1]
        out_dt = grid.dtype
        ds = 2
        # production inputs are already bf16 (the fused scatter's store
        # dtype); the cast is a no-op there but keeps f32 callers legal
        gp = grid.astype(jnp.bfloat16)
    else:
        b, r, _, _, cin = grid.shape
        assert r == resolution
        cout = weights.shape[-1]
        hw = r * r
        out_dt = grid.dtype
        if ds is None:
            ds = _ms_group_size(r, cin, cout)
        if not ds:
            return conv3d_pallas(grid, weights, bias, resolution,
                                 interpret=interpret)
        # padded D length (ngroups + 1) * ds so the halo block (group
        # g+1) is always in range; rows beyond r+1 are zero, never read
        gp = jnp.pad(grid.reshape(b, r, hw, cin).astype(jnp.bfloat16),
                     ((0, 0), (1, ds - 1), (0, 0), (0, 0)))
    ngroups = r // ds
    # (3*Cin, 9*Cout), dz-major rows, (dy, dx)-major out blocks
    wm = (weights.astype(jnp.bfloat16)
          .reshape(3, 9, cin, cout).transpose(0, 2, 1, 3)
          .reshape(3 * cin, 9 * cout))
    bm = bias.astype(jnp.float32).reshape(1, cout)

    def blk_spec(off):
        return pl.BlockSpec((1, ds, hw, cin),
                            lambda bi, g, _o=off: (bi, g + _o, 0, 0),
                            memory_space=pltpu.VMEM)

    scratch = [pltpu.VMEM((ds + 2, hw, cin), jnp.bfloat16)]
    if taps == "pad":
        kern = functools.partial(_conv_ms_pad_kernel, h=r, w=r, ds=ds)
        scratch.append(pltpu.VMEM((r + 2, r + 2, 9 * cout), jnp.float32))
    else:
        assert taps == "roll", taps
        kern = functools.partial(_conv_ms_kernel, h=r, w=r, ds=ds)

    out_specs = pl.BlockSpec((1, ds, hw, cout),
                             lambda bi, g: (bi, g, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, r, hw, cout), out_dt)

    out = pl.pallas_call(
        kern,
        grid=(b, ngroups),
        in_specs=[
            pl.BlockSpec((3 * cin, 9 * cout), lambda bi, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bi, g: (0, 0),
                         memory_space=pltpu.VMEM),
            blk_spec(0), blk_spec(1),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(wm, bm, gp, gp)
    return out.reshape(b, r, r, r, cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3d_ms(grid: jnp.ndarray, weights: jnp.ndarray, bias: jnp.ndarray,
              resolution: int) -> jnp.ndarray:
    """Differentiable multi-slice conv: Pallas forward, XLA-conv
    backward — same contract as conv3d."""
    return conv3d_ms_pallas(grid, weights, bias, resolution)


def _conv3d_ms_fwd(grid, weights, bias, resolution):
    return conv3d_ms_pallas(grid, weights, bias, resolution), (grid,
                                                               weights)


conv3d_ms.defvjp(_conv3d_ms_fwd, _conv3d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3d_ms_prepadded(gp: jnp.ndarray, weights: jnp.ndarray,
                        bias: jnp.ndarray, resolution: int) -> jnp.ndarray:
    """Differentiable multi-slice conv over an already D-padded
    (B, R+2, HW, Cin) grid (the fused scatter output); skips the pad
    pass. Returns (B, R, R, R, Cout) in the grid dtype."""
    return conv3d_ms_pallas(gp, weights, bias, resolution, None, None,
                            "roll", True)


def _conv3d_ms_prepadded_fwd(gp, weights, bias, resolution):
    return conv3d_ms_prepadded(gp, weights, bias, resolution), (gp, weights)


def _conv3d_ms_prepadded_bwd(resolution, res, g):
    gp, weights = res
    r = resolution
    b, _, hw, cin = gp.shape
    grid = gp[:, 1:r + 1].reshape(b, r, r, r, cin)
    dgrid, dw, db = _conv3d_bwd(resolution, (grid, weights), g)
    dgp = jnp.pad(dgrid.reshape(b, r, hw, cin),
                  ((0, 0), (1, 1), (0, 0), (0, 0))).astype(gp.dtype)
    return (dgp, dw, db)


conv3d_ms_prepadded.defvjp(_conv3d_ms_prepadded_fwd,
                           _conv3d_ms_prepadded_bwd)


# ------------------------------------------------- matmul-first variant

def _conv_mm_kernel(w_ref, b_ref, lo_ref, mid_ref, hi_ref, out_ref, *,
                    h, w):
    """Per (batch, D-slice): dot each input slab with ALL of its dz's tap
    weights at once — (HW, Cin) @ (Cin, 9*Cout) — then accumulate the 9
    (dy, dx) blocks with static row-rolls and border masks. The im2col
    kernel builds a (HW, 9*Cin) col matrix first, which is copy-bound at
    wide Cin (27 shifted copies of the slab); here the only shifted
    copies are Cout-wide."""
    hw = h * w
    cout = out_ref.shape[-1]
    out_dt = out_ref.dtype

    rows = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)
    ys = rows // w
    xs = rows % w

    acc = jnp.zeros((hw, cout), jnp.float32)
    for dz, src in enumerate((lo_ref, mid_ref, hi_ref)):
        slab = src[0, 0].astype(jnp.bfloat16)               # (HW, Cin)
        m = jnp.dot(slab, w_ref[dz],
                    preferred_element_type=jnp.float32)     # (HW, 9*Cout)
        j = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                blk = m[:, j * cout:(j + 1) * cout]
                s = dy * w + dx
                if s:
                    k = s % hw
                    blk = jnp.concatenate([blk[k:], blk[:k]], axis=0)
                ok = ((ys + dy >= 0) & (ys + dy < h)
                      & (xs + dx >= 0) & (xs + dx < w))
                acc = acc + jnp.where(ok, blk, 0.0)
                j += 1
    out_ref[0, 0] = (acc + b_ref[0, :]).astype(out_dt)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def conv3d_mm_pallas(grid: jnp.ndarray, weights: jnp.ndarray,
                     bias: jnp.ndarray, resolution: int,
                     interpret: bool | None = None,
                     prepadded: bool = False) -> jnp.ndarray:
    """Matmul-first 3x3x3 SAME conv (see _conv_mm_kernel). Same contract
    as conv3d_pallas. interpret=None auto-selects the Pallas interpreter
    off-TPU so the differentiable wrapper is testable on CPU. With
    `prepadded`, `grid` is already the D-padded (B, R+2, HW, Cin) bf16
    layout (scatter_sum_sorted_padded_pallas emits it directly) and the
    pad pass is skipped; the output dtype is then bf16."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if prepadded:
        b, rp2, hw, cin = grid.shape
        r = rp2 - 2
        assert r == resolution and hw == r * r, grid.shape
        gp = grid
        out_dt = grid.dtype
        cout = weights.shape[-1]
    else:
        b, r, _, _, cin = grid.shape
        assert r == resolution
        cout = weights.shape[-1]
        hw = r * r
        out_dt = grid.dtype
        # the kernel contracts in bf16 regardless (slabs were cast
        # in-kernel before) — casting at the pad fuses cast+pad into ONE
        # pass for f32 inputs (the pre-divided scatter-mean output) and
        # halves the DMA
        gp = jnp.pad(grid.reshape(b, r, hw, cin).astype(jnp.bfloat16),
                     ((0, 0), (1, 1), (0, 0), (0, 0)))
    # (3, Cin, 9*Cout): per-dz blocks, (dy, dx)-major along the out axis
    wm = (weights.astype(jnp.bfloat16)
          .reshape(3, 9, cin, cout).transpose(0, 2, 1, 3)
          .reshape(3, cin, 9 * cout))
    bm = bias.astype(jnp.float32).reshape(1, cout)

    def slice_spec(off):
        return pl.BlockSpec((1, 1, hw, cin),
                            lambda bi, d, _o=off: (bi, d + _o, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_conv_mm_kernel, h=r, w=r),
        grid=(b, r),
        in_specs=[
            pl.BlockSpec((3, cin, 9 * cout), lambda bi, d: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bi, d: (0, 0),
                         memory_space=pltpu.VMEM),
            slice_spec(0), slice_spec(1), slice_spec(2),
        ],
        out_specs=pl.BlockSpec((1, 1, hw, cout),
                               lambda bi, d: (bi, d, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r, hw, cout), out_dt),
        interpret=interpret,
    )(wm, bm, gp, gp, gp)
    return out.reshape(b, r, r, r, cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3d_mm(grid: jnp.ndarray, weights: jnp.ndarray, bias: jnp.ndarray,
              resolution: int) -> jnp.ndarray:
    """Differentiable matmul-first conv (wide-Cin path): Pallas forward,
    XLA-conv backward — same contract as conv3d."""
    return conv3d_mm_pallas(grid, weights, bias, resolution)


def _conv3d_mm_fwd(grid, weights, bias, resolution):
    return conv3d_mm_pallas(grid, weights, bias, resolution), (grid,
                                                               weights)


conv3d_mm.defvjp(_conv3d_mm_fwd, _conv3d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3d_mm_prepadded(gp: jnp.ndarray, weights: jnp.ndarray,
                        bias: jnp.ndarray, resolution: int) -> jnp.ndarray:
    """Differentiable matmul-first conv over an already D-padded
    (B, R+2, HW, Cin) grid (the fused wide-scatter output); skips the pad
    pass. Returns (B, R, R, R, Cout) in the grid dtype."""
    return conv3d_mm_pallas(gp, weights, bias, resolution, None, True)


def _conv3d_mm_prepadded_fwd(gp, weights, bias, resolution):
    return conv3d_mm_prepadded(gp, weights, bias, resolution), (gp, weights)


def _conv3d_mm_prepadded_bwd(resolution, res, g):
    gp, weights = res
    r = resolution
    b, _, hw, cin = gp.shape
    grid = gp[:, 1:r + 1].reshape(b, r, r, r, cin)
    dgrid, dw, db = _conv3d_bwd(resolution, (grid, weights), g)
    dgp = jnp.pad(dgrid.reshape(b, r, hw, cin),
                  ((0, 0), (1, 1), (0, 0), (0, 0))).astype(gp.dtype)
    return (dgp, dw, db)


conv3d_mm_prepadded.defvjp(_conv3d_mm_prepadded_fwd,
                           _conv3d_mm_prepadded_bwd)
