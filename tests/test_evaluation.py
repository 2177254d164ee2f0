"""Chamfer / F-score metric tests against brute-force numpy."""

import jax.numpy as jnp
import numpy as np

from bdm_tpu.evaluation import chamfer_distance, fscore


def _np_chamfer(a, b):
    a = a - a.mean(0); b = b - b.mean(0)
    d = ((a[:, None] - b[None]) ** 2).sum(-1)
    return d.min(1).mean() + d.min(0).mean()


def test_chamfer_matches_numpy(rng):
    a = rng.standard_normal((2, 50, 3)).astype(np.float32)
    b = rng.standard_normal((2, 70, 3)).astype(np.float32)
    got = np.asarray(chamfer_distance(jnp.asarray(a), jnp.asarray(b)))
    want = [_np_chamfer(a[i], b[i]) for i in range(2)]
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_chamfer_zero_for_identical(rng):
    a = rng.standard_normal((1, 64, 3)).astype(np.float32)
    got = float(chamfer_distance(jnp.asarray(a), jnp.asarray(a))[0])
    assert got < 1e-6


def test_fscore_perfect_and_disjoint(rng):
    a = rng.standard_normal((1, 64, 3)).astype(np.float32)
    f1, p, r = fscore(jnp.asarray(a), jnp.asarray(a))
    assert float(f1[0]) > 0.999
    far = a + 100.0
    # recenter=True collapses the offset; use recenter=False to keep it
    f1, p, r = fscore(jnp.asarray(a), jnp.asarray(far), recenter=False)
    assert float(f1[0]) == 0.0


def test_fscore_threshold_semantics(rng):
    # one point exactly at sqdist 0.009 (inside) vs 0.011 (outside)
    a = np.zeros((1, 1, 3), dtype=np.float32)
    b_in = np.array([[[np.sqrt(0.009), 0, 0]]], dtype=np.float32)
    b_out = np.array([[[np.sqrt(0.011), 0, 0]]], dtype=np.float32)
    f_in, _, _ = fscore(jnp.asarray(a), jnp.asarray(b_in), recenter=False)
    f_out, _, _ = fscore(jnp.asarray(a), jnp.asarray(b_out), recenter=False)
    assert float(f_in[0]) == 1.0 and float(f_out[0]) == 0.0


def test_chamfer_sharded_matches_dense():
    """Point-sharded chamfer over an 8-device mesh equals the dense one."""
    import jax
    from bdm_tpu.evaluation.metrics import (chamfer_distance,
                                            chamfer_distance_sharded)
    from bdm_tpu.parallel import get_mesh
    mesh = get_mesh(min(8, len(jax.devices())))
    rng = np.random.default_rng(0)
    n = 16 * mesh.devices.size
    pred = jnp.asarray(rng.standard_normal((2, n, 3)).astype(np.float32))
    gt = jnp.asarray(rng.standard_normal((2, 40, 3)).astype(np.float32))
    want = np.asarray(chamfer_distance(pred, gt))
    got = np.asarray(chamfer_distance_sharded(pred, gt, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_emd_sinkhorn_identity_and_shift():
    """EMD of a permuted copy is ~0; of a rigid translation it is ~|t|
    (every unit of mass moves exactly |t|)."""
    from bdm_tpu.evaluation.metrics import emd_sinkhorn
    rng = np.random.default_rng(0)
    a = rng.standard_normal((1, 64, 3)).astype(np.float32)
    perm = rng.permutation(64)
    same = np.asarray(emd_sinkhorn(jnp.asarray(a), jnp.asarray(a[:, perm])))
    assert same[0] < 0.02, same
    t = np.array([0.5, 0.0, 0.0], np.float32)
    shifted = np.asarray(
        emd_sinkhorn(jnp.asarray(a), jnp.asarray(a + t)))
    np.testing.assert_allclose(shifted[0], 0.5, atol=0.05)
