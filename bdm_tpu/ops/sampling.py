"""Furthest point sampling (FPS) and index gather.

Reference semantics: `functional/src/sampling/sampling.cu:82-170` — start
from point 0, then iteratively pick the point with the largest distance to
the already-selected set (squared L2, running min-distance array, ties go to
the lowest index).

TPU design: FPS is inherently sequential in M, so it is a `lax.fori_loop`
of M-1 steps over a resident (B, N) distance array — all vector work, no
host sync. `gather` is `take_along_axis` (autodiff supplies the
scatter-add backward of `sampling.cu:52-75`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e38)

# Global override for the Pallas FPS kernel: None = auto (TPU backend),
# True/False = forced. Set False when running TPU-default processes whose
# computations target CPU devices (e.g. virtual-device dryruns).
_PALLAS_OVERRIDE = None


def set_pallas_enabled(value: bool | None) -> None:
    global _PALLAS_OVERRIDE
    _PALLAS_OVERRIDE = value


def furthest_point_sample(coords: jnp.ndarray, num_samples: int,
                          use_pallas: bool | None = None) -> jnp.ndarray:
    """Iterative furthest point sampling.

    Args:
        coords: (B, N, 3) float32 point coordinates.
        num_samples: M, number of centers to select (static).
        use_pallas: force the Pallas kernel on/off; default: on when the
            default backend is TPU (the kernel keeps the whole loop VMEM-
            resident — see `bdm_tpu.ops.pallas.fps`).

    Returns:
        (B, M) int32 indices into N. indices[:, 0] == 0 per the reference
        kernel (`sampling.cu:103-105`).
    """
    # the reference kernel has no coordinate backward (`sampling.cu`
    # returns indices only); stop_gradient also keeps structurally-nonzero
    # (but value-zero) tangents out of the Pallas kernel, whose jvp rule
    # would reject them
    coords = jax.lax.stop_gradient(coords)
    b, n, _ = coords.shape
    m = int(num_samples)
    if use_pallas is None:
        use_pallas = _PALLAS_OVERRIDE
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and m > 1:
        from bdm_tpu.ops.pallas.fps import furthest_point_sample_pallas
        return furthest_point_sample_pallas(coords, m)

    def body(j, carry):
        dist, last, indices = carry
        # Squared distance of every point to the last selected point.
        d = jnp.sum((coords - last[:, None, :]) ** 2, axis=-1)  # (B, N)
        dist = jnp.minimum(dist, d)
        best = jnp.argmax(dist, axis=-1).astype(jnp.int32)  # (B,)
        indices = indices.at[:, j].set(best)
        last = jnp.take_along_axis(coords, best[:, None, None].astype(jnp.int32),
                                   axis=1)[:, 0, :]
        return dist, last, indices

    indices0 = jnp.zeros((b, m), dtype=jnp.int32)
    dist0 = jnp.full((b, n), _INF)
    last0 = coords[:, 0, :]
    if m == 1:
        return indices0
    _, _, indices = jax.lax.fori_loop(1, m, body, (dist0, last0, indices0))
    return indices


def gather(features: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Gather per-point features at the given indices.

    Args:
        features: (B, N, C).
        indices: (B, M) int32.

    Returns:
        (B, M, C).
    """
    return jnp.take_along_axis(features, indices[..., None].astype(jnp.int32),
                               axis=1)


def fps_gather(coords: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """FPS returning the sampled coordinates, like the reference's
    `furthest_point_sample` wrapper (`functional/sampling.py:37-48`)."""
    return gather(coords, furthest_point_sample(coords, num_samples))
