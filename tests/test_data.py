"""Data-layer tests against synthetic on-disk dataset trees."""

import json
import os

import numpy as np
import pytest

from bdm_tpu.data import DataLoader, Pix3DDataset, ShapeNetR2N2Dataset, \
    SyntheticDataset, collate
from bdm_tpu.data.preprocess_pix3d import main as preprocess_main
from bdm_tpu.data.shapenet_r2n2 import transform_v2_to_v1


def _write_png(path, size, rng):
    from PIL import Image
    arr = (rng.uniform(0, 255, (size, size, 4))).astype(np.uint8)
    Image.fromarray(arr, "RGBA").save(path)


@pytest.fixture
def fake_r2n2(tmp_path, rng):
    """A 3-object fake ShapeNet-R2N2 tree."""
    cate = "03001627"  # chair
    root = tmp_path / "PC15k"
    r2n2 = tmp_path / "R2N2"
    (r2n2 / "ShapeNetRendering").mkdir(parents=True)
    objects = [f"obj{i}" for i in range(3)]
    split = {"train": {cate: {o: 1 for o in objects}},
             "test": {cate: {o: 1 for o in objects[:2]}}}
    pc_dict = {"train": {cate: {o: "train" for o in objects}},
               "test": {cate: {o: "test" for o in objects}}}
    (r2n2 / "R2N2_split.json").write_text(json.dumps(split))
    (r2n2 / "pc_dict_v2.json").write_text(json.dumps(pc_dict))
    for split_name in ("train", "test"):
        (root / cate / split_name).mkdir(parents=True, exist_ok=True)
    for o in objects:
        pc = rng.standard_normal((15000, 3)).astype(np.float32) * 0.3
        np.save(root / cate / "train" / f"{o}.npy", pc)
        np.save(root / cate / "test" / f"{o}.npy", pc)
        rend = r2n2 / "ShapeNetRendering" / cate / o / "rendering"
        rend.mkdir(parents=True)
        lines = [f"{30.0 * v} 25.0 0 0.7 25\n" for v in range(24)]
        (rend / "rendering_metadata.txt").write_text("".join(lines))
        _write_png(rend / "00.png", 137, rng)
    return str(root), str(r2n2)


def test_r2n2_dataset_loads_and_normalizes(fake_r2n2):
    root, r2n2 = fake_r2n2
    ds = ShapeNetR2N2Dataset(root_dir=root, r2n2_dir=r2n2, split="train",
                             max_points=256, image_size=32)
    assert len(ds) == 3
    s = ds[0]
    assert s["points"].shape == (256, 3)
    assert s["image"].shape == (32, 32, 3)
    assert s["camera"].R.shape == (1, 3, 3)
    # dataset-global normalization: pooled points ~ zero-mean unit-std
    allpts = np.concatenate([ds[i]["points"] for i in range(3)], axis=0)
    assert abs(allpts.mean()) < 0.1
    assert 0.8 < allpts.std() < 1.2


def test_r2n2_subset_ratio(fake_r2n2):
    root, r2n2 = fake_r2n2
    ds = ShapeNetR2N2Dataset(root_dir=root, r2n2_dir=r2n2, split="train",
                             max_points=64, image_size=32,
                             subset_ratio=1 / 3)
    assert len(ds) == 1


def test_v2_to_v1_remap():
    pts = np.array([[1.0, 2.0, 3.0]], dtype=np.float32)
    out = transform_v2_to_v1(pts)
    np.testing.assert_allclose(out, [[-3.0, 2.0, -1.0]])


@pytest.fixture
def fake_pix3d(tmp_path, rng):
    root = tmp_path / "pix3d"
    (root / "img" / "chair").mkdir(parents=True)
    (root / "model" / "chair" / "m1").mkdir(parents=True)
    # a unit tetrahedron obj
    obj = ("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
           "f 1 2 3\nf 1 2 4\nf 1 3 4\nf 2 3 4\n")
    (root / "model" / "chair" / "m1" / "model.obj").write_text(obj)
    entries = []
    for i in range(5):
        img_name = f"img/chair/{i:04d}.png"
        _write_png(root / img_name, 64, rng)
        entries.append({
            "category": "chair", "img": img_name,
            "model": "model/chair/m1/model.obj",
            "img_size": [64, 64], "bbox": [8, 8, 56, 56],
            "focal_length": 35.0,
            "rot_mat": np.eye(3).tolist(),
            "trans_mat": [0.0, 0.0, 2.0],
        })
    (root / "pix3d.json").write_text(json.dumps(entries))
    return str(root)


def test_pix3d_raw_dataset(fake_pix3d):
    ds = Pix3DDataset(root_dir=fake_pix3d, split="train", max_points=128,
                      image_size=32, processed=False)
    assert len(ds) == 4  # 80% of 5
    s = ds[0]
    assert s["points"].shape[1] == 3
    assert s["image"].shape == (32, 32, 3)
    # per-shape normalization
    assert abs(s["points"].mean()) < 0.5
    ds_test = Pix3DDataset(root_dir=fake_pix3d, split="test", max_points=128,
                           image_size=32, processed=False)
    assert len(ds_test) == 1


def test_pix3d_preprocess_and_processed_load(fake_pix3d, monkeypatch):
    import sys
    monkeypatch.setattr(sys, "argv", [
        "preprocess", "--root", fake_pix3d, "--num_points", "64",
        "--image_size", "32"])
    preprocess_main()
    out_root = fake_pix3d.replace("pix3d", "pix3d_processed")
    assert os.path.exists(os.path.join(out_root, "model/chair/m1/model.obj"))
    ds = Pix3DDataset(root_dir=fake_pix3d, split="train", max_points=64,
                      image_size=32, processed=True)
    s = ds[0]
    assert s["points"].shape == (64, 3)


def test_loader_collate_and_shapes():
    ds = SyntheticDataset(num_samples=10, max_points=32, image_size=16)
    dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True)
    assert len(dl) == 2
    batches = list(dl)
    assert len(batches) == 2
    b = batches[0]
    assert b["points"].shape == (4, 32, 3)
    assert b["image"].shape == (4, 16, 16, 3)
    assert b["camera"].R.shape == (4, 3, 3)
    assert isinstance(b["sequence_name"], list)


def test_loader_infinite_and_prefetch():
    ds = SyntheticDataset(num_samples=4, max_points=8, image_size=8)
    dl = DataLoader(ds, batch_size=2, num_workers=2)
    it = dl.infinite()
    seen = [next(it) for _ in range(5)]  # crosses epoch boundary
    assert all(s["points"].shape == (2, 8, 3) for s in seen)


def test_r2n2_start_subset_are_ratios_of_the_same_list(fake_r2n2):
    """subset_ratio is the END ratio, start_ratio the START — the slice is
    [int(len*start) : int(len*subset)] (reference
    `shapenet_r2n2.py:242-248`), NOT a start+length window."""
    root, r2n2 = fake_r2n2
    full = ShapeNetR2N2Dataset(root_dir=root, r2n2_dir=r2n2, split="train",
                               max_points=64, image_size=32)
    mid = ShapeNetR2N2Dataset(root_dir=root, r2n2_dir=r2n2, split="train",
                              max_points=64, image_size=32,
                              start_ratio=1 / 3, subset_ratio=2 / 3)
    assert len(full) == 3 and len(mid) == 1
    tail = ShapeNetR2N2Dataset(root_dir=root, r2n2_dir=r2n2, split="train",
                               max_points=64, image_size=32,
                               start_ratio=1 / 3, subset_ratio=1.0)
    assert len(tail) == 2


def test_r2n2_parallel_build_matches_sequential(fake_r2n2):
    """build_workers > 0 (the reference's build_data_parallel analogue,
    `shapenet_r2n2.py:220-331`) must produce identical samples — the
    executor map preserves record order, and the seed-38383 shuffle +
    global-np.random subsample run after loading either way."""
    root, r2n2 = fake_r2n2
    np.random.seed(7)
    seq = ShapeNetR2N2Dataset(root_dir=root, r2n2_dir=r2n2, split="train",
                              max_points=64, image_size=16)
    np.random.seed(7)
    par = ShapeNetR2N2Dataset(root_dir=root, r2n2_dir=r2n2, split="train",
                              max_points=64, image_size=16,
                              build_workers=4)
    assert len(seq) == len(par)
    for i in range(len(seq)):
        a, b = seq[i], par[i]
        np.testing.assert_array_equal(a["points"], b["points"])
        np.testing.assert_array_equal(a["image"], b["image"])
        assert a["sequence_name"] == b["sequence_name"]
