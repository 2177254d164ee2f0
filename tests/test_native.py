"""Native pointio loader tests (builds the C++ library on first use)."""

import numpy as np
import pytest

from bdm_tpu.native import native_available, read_many_npy, read_points
from bdm_tpu.utils import write_ply


def test_native_builds():
    assert native_available(), "g++ build of pointio.cpp failed"


def test_read_npy_roundtrip(tmp_path, rng):
    pts = rng.standard_normal((1000, 3)).astype(np.float32)
    path = str(tmp_path / "c.npy")
    np.save(path, pts)
    out = read_points(path)
    np.testing.assert_array_equal(out, pts)


def test_read_npy_f64(tmp_path, rng):
    pts = rng.standard_normal((100, 3))
    path = str(tmp_path / "c64.npy")
    np.save(path, pts)
    out = read_points(path)
    np.testing.assert_allclose(out, pts.astype(np.float32), rtol=1e-6)


def test_read_npy_subsample(tmp_path, rng):
    pts = rng.standard_normal((500, 3)).astype(np.float32)
    path = str(tmp_path / "c.npy")
    np.save(path, pts)
    out = read_points(path, max_points=64, seed=7)
    assert out.shape == (64, 3)
    # every row must be one of the source points
    src = {tuple(np.round(p, 5)) for p in pts}
    assert all(tuple(np.round(p, 5)) in src for p in out)


def test_read_ply_binary(tmp_path, rng):
    pts = rng.standard_normal((200, 3)).astype(np.float32)
    path = str(tmp_path / "c.ply")
    write_ply(path, pts)
    out = read_points(path)
    np.testing.assert_array_equal(out, pts)


def test_read_many_parallel(tmp_path, rng):
    paths = []
    truths = []
    for i in range(8):
        pts = rng.standard_normal((300, 3)).astype(np.float32)
        p = str(tmp_path / f"c{i}.npy")
        np.save(p, pts)
        paths.append(p)
        truths.append(pts)
    out = read_many_npy(paths, max_points=32, seed=1, n_threads=4)
    assert out.shape == (8, 32, 3)
    for i in range(8):
        src = {tuple(np.round(p, 5)) for p in truths[i]}
        assert all(tuple(np.round(p, 5)) in src for p in out[i])
