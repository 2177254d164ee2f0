"""Wide-input 3x3x3 voxel conv as one MXU matmul + a shift-sum.

The stage-0 PVConv conv sees Cin=390 (x_t + image conditioning,
`modules/pvconv.py:69-83` with the PC2 input width): XLA's conv3d picks
tap-blocked accumulation from HBM there (profiled 4.8 ms at B=8, R=32),
and the Pallas im2col kernel is col-build-bound at that width (27 copies
of a (1024, 390) slab per D-slice). Reordering fixes both:

    conv(x)[v] = sum_t shift_t(x)[v] @ W_t            (t = 27 taps)
               = sum_t shift_t(x @ W_t)[v]            (shift commutes with
                                                       the per-voxel matmul)

so the whole tap family is ONE (B*R^3, Cin) x (Cin, 27*Cout) matmul — a
clean MXU contraction with no col building — followed by 27 shifted
slice-adds of narrow (Cout-wide) grids, which XLA fuses into a single
elementwise pass over the zero-padded intermediate. Same FLOPs as the
conv, reordered for the hardware.

Precision: bf16 matmul inputs / f32 accumulation — the default precision
XLA gives f32 convs on this MXU; the (27*Cout)-wide intermediate rides
bf16 to halve the shift-sum's reads.
"""

from __future__ import annotations

import jax.numpy as jnp


def tap_shift_sum(g: jnp.ndarray, cout: int,
                  inv: jnp.ndarray | None = None) -> jnp.ndarray:
    """Reduce a per-tap grid (B, R, R, R, 27*Cout) — tap-major blocks in
    (kd, kh, kw) C-order — to the SAME-conv output (B, R, R, R, Cout):
    out[v] = sum_t g[v + delta(t), t-block] * inv[v + delta(t)]. XLA
    fuses the 27 shifted slice-adds over the zero-padded grid into one
    elementwise pass (profiled 0.54 ms at B=8, R=32, Cout=32). `inv`
    (B, R, R, R) folds the scatter-mean's per-voxel count division into
    the same pass, saving a full pass over the 27*Cout-wide grid."""
    b, r = g.shape[0], g.shape[1]
    # stay on the natural 5D (..., 27*Cout) form: a 6D (..., 27, Cout)
    # reshape baits XLA's layout assignment into physical transposes
    # (profiled 4.3 + 5.7 ms of reshape/copy at B=8 R=32) — static
    # channel slices keep the array in its row-major layout
    gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    if inv is not None:
        ip = jnp.pad(inv.reshape(b, r, r, r), ((0, 0),) + ((1, 1),) * 3)
    acc = None
    t = 0
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                part = gp[:, dz:dz + r, dy:dy + r, dx:dx + r,
                          t * cout:(t + 1) * cout].astype(jnp.float32)
                if inv is not None:
                    part = part * ip[:, dz:dz + r, dy:dy + r,
                                     dx:dx + r, None]
                acc = part if acc is None else acc + part
                t += 1
    return acc


def tap_shift_sum_mean(g: jnp.ndarray, cout: int) -> jnp.ndarray:
    """tap_shift_sum over a RAW scatter output (B, R, R, R, 27*Cout + 1)
    whose last channel is the per-voxel point count: computes
    out[v] = sum_t g[v+d(t), t-block] / max(g[v+d(t), -1], 1) in one
    fused pass — the count rides at the same shifted position as its
    taps, so no separate inv array, no channel slice materialization and
    no extra pass over the 27*Cout-wide grid."""
    b, r = g.shape[0], g.shape[1]
    gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    acc = None
    t = 0
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                win = gp[:, dz:dz + r, dy:dy + r, dx:dx + r, :]
                part = win[..., t * cout:(t + 1) * cout].astype(jnp.float32)
                cnt = win[..., -1:].astype(jnp.float32)
                acc_t = part / jnp.maximum(cnt, 1.0)
                acc = acc_t if acc is None else acc + acc_t
                t += 1
    return acc


def conv3d_wide(x: jnp.ndarray, kernel: jnp.ndarray,
                bias: jnp.ndarray) -> jnp.ndarray:
    """SAME 3x3x3 conv over a cubic voxel grid, matmul-first.

    Args:
        x: (B, R, R, R, Cin) voxel grid (any float dtype).
        kernel: (3, 3, 3, Cin, Cout) — nn.Conv's DHWIO layout.
        bias: (Cout,).

    Returns:
        (B, R, R, R, Cout) float32.
    """
    b, r = x.shape[0], x.shape[1]
    cin, cout = kernel.shape[3], kernel.shape[4]
    # (Cin, 27 * Cout): tap-major blocks along the output axis
    w_all = kernel.reshape(27, cin, cout).transpose(1, 0, 2).reshape(
        cin, 27 * cout)
    g = jnp.dot(x.reshape(b, r * r * r, cin).astype(jnp.bfloat16),
                w_all.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    g = g.reshape(b, r, r, r, 27 * cout).astype(jnp.bfloat16)
    return tap_shift_sum(g, cout) + bias.astype(jnp.float32)
