"""Compare conv3d formulations on TPU at the PVConv grid shapes.

The profiled forward spends most of its time in/waiting on XLA's native
NDHWC conv3d (weight-copy stalls at R=8 C=256; ~60x-off-roofline fusions
at R=32 C=32). Candidates:

  native   nn.Conv-style lax.conv_general_dilated NDHWC
  im2col   pad + 27 shifted slices -> (B*R^3, 27C) @ (27C, C_out)
  dstack   conv3d as conv2d over (H, W) with the D-neighborhood stacked
           into input channels (kernel (3, 3, 3C_in) -> C_out)

    python tools/experiment_conv3d.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    def timeit(fn, *args, repeats=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / repeats

    dn = jax.lax.conv_dimension_numbers(
        (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC"))

    def native(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME", dimension_numbers=dn)

    def im2col(x, w):
        b, d, h, ww, c = x.shape
        co = w.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        cols = []
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    cols.append(jax.lax.dynamic_slice(
                        xp, (0, dz, dy, dx, 0), (b, d, h, ww, c)))
        col = jnp.concatenate(cols, axis=-1).reshape(b * d * h * ww, 27 * c)
        wm = w.reshape(27 * c, co)
        return (col @ wm).reshape(b, d, h, ww, co)

    dn2 = jax.lax.conv_dimension_numbers(
        (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))

    def dstack(x, w):
        b, d, h, ww, c = x.shape
        co = w.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        xs = jnp.concatenate(
            [xp[:, 0:d], xp[:, 1:d + 1], xp[:, 2:d + 2]], axis=-1)
        w2 = w.transpose(1, 2, 0, 3, 4).reshape(3, 3, 3 * c, co)
        y = jax.lax.conv_general_dilated(
            xs.reshape(b * d, h, ww, 3 * c), w2, (1, 1), "SAME",
            dimension_numbers=dn2)
        return y.reshape(b, d, h, ww, co)

    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}")
    shapes = [
        (8, 8, 256, 256),    # fp0/fp1
        (8, 8, 390, 256),
        (16, 16, 128, 128),  # stage2/fp2-ish
        (32, 32, 32, 32),    # stage0
        (32, 32, 390, 32),   # stage0 conv0
        (32, 32, 64, 64),    # fp3
    ]
    fns = {"native": native, "im2col": im2col, "dstack": dstack}
    for b, r, cin, cout in [(8, *s[1:]) if False else s for s in shapes]:
        b = 8
        x = jnp.asarray(
            rng.standard_normal((b, r, r, r, cin)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32)
            * 0.01)
        row = [f"R={r:2d} {cin:3d}->{cout:3d}:"]
        ref = None
        for name, fn in fns.items():
            jfn = jax.jit(fn)
            try:
                out = jfn(x, w)
                if ref is None:
                    ref = out
                else:
                    err = float(jnp.max(jnp.abs(out - ref))
                                / (jnp.max(jnp.abs(ref)) + 1e-9))
                    assert err < 3e-2, (name, err)
                ms = timeit(jfn, x, w) * 1e3
                row.append(f"{name} {ms:7.2f} ms")
            except Exception as e:  # noqa: BLE001
                row.append(f"{name} FAIL({type(e).__name__})")
        print("  ".join(row))


if __name__ == "__main__":
    main()
