"""File-based dataset reader tests over synthetic .bin/.label fixtures."""
import os

import numpy as np
import pytest

from semanticlidarunc_tpu.dataset import definitions, readers
from semanticlidarunc_tpu.dataset.synthetic import make_scan, write_kitti_scan


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    """Minimal SemanticKITTI tree: sequences 00, 03, 08 with 2 scans each."""
    root = tmp_path_factory.mktemp("kitti")
    for seq in ("00", "03", "08"):
        vel = root / seq / "velodyne"
        lab = root / seq / "labels"
        vel.mkdir(parents=True)
        lab.mkdir(parents=True)
        for i in range(2):
            write_kitti_scan(str(vel / f"{i:06d}.bin"),
                             str(lab / f"{i:06d}.label"),
                             seed=hash((seq, i)) % 1000)
    return str(root)


def test_dataset_splits_glob(kitti_root):
    cfg = {"dataset_dir": kitti_root, "dataset_name": "SemanticKitti"}
    train, test = readers.dataset_splits(cfg)
    assert len(train) == 4      # seqs 00 + 03 (08 excluded)
    assert len(test) == 2       # seq 08
    for bin_path, label_path in train + test:
        assert os.path.exists(bin_path) and os.path.exists(label_path)
        assert "velodyne" in bin_path and "labels" in label_path


def test_kitti_reader_roundtrip(kitti_root):
    cfg = {"dataset_dir": kitti_root, "dataset_name": "SemanticKitti",
           "model_settings": {"projection": [32, 128], "rotate": False,
                              "flip": False, "resize": False},
           "train_params": {}}
    _, test_pairs = readers.dataset_splits(cfg)
    ds = readers.build_dataset(cfg, test_pairs, train=False)
    s = ds[0]
    assert s["range"].shape == (32, 128, 1)
    assert s["xyz"].shape == (32, 128, 3)
    assert s["normals"].shape == (32, 128, 3)
    assert s["labels"].shape == (32, 128)
    # labels must be valid train ids produced by the id_map roundtrip
    present = set(np.unique(s["labels"]))
    assert present <= set(range(21))
    assert len(present - {0}) >= 2  # road/vegetation/car from the synthesizer
    # range image is consistent with xyz
    occ = s["labels"] > 0
    np.testing.assert_allclose(
        s["range"][..., 0][occ],
        np.linalg.norm(s["xyz"][occ], axis=-1), rtol=1e-5)


def test_kitti_reader_matches_reference_projection(kitti_root, monkeypatch):
    """Reader plumbing (LUT, concat order, no-aug path) == direct numpy
    projection of the raw files.

    Pins SLU_NATIVE=0 so both sides use the same numpy trig: the fixture has
    H == n_beams (every theta exactly on a bin edge), where the 1-ulp
    atan2 differences between the native C++ kernel and numpy's SIMD
    arctan2 scatter whole rows. Native==python equivalence is covered by
    tests/test_native.py on non-degenerate grids with a bounded-flip budget.
    """
    monkeypatch.setenv("SLU_NATIVE", "0")
    from semanticlidarunc_tpu.ops.projection import spherical_projection_np
    cfg = {"dataset_dir": kitti_root, "dataset_name": "SemanticKitti",
           "model_settings": {"projection": [32, 128], "rotate": False,
                              "flip": False, "resize": False},
           "train_params": {}}
    _, pairs = readers.dataset_splits(cfg)
    ds = readers.build_dataset(cfg, pairs, train=False)
    s = ds[0]

    xyzi, raw = readers.read_kitti_scan(*pairs[0])
    lut = definitions.id_map_lut()
    labels = lut[np.clip(raw, 0, len(lut) - 1)]
    pc = np.concatenate([xyzi, labels[:, None].astype(np.float32)], axis=-1)
    img, _, _, _ = spherical_projection_np(pc, 32, 128)
    np.testing.assert_array_equal(s["labels"], img[..., 4].astype(np.int64))
    np.testing.assert_allclose(s["xyz"], img[..., 0:3])


def test_flip_augmentation_negates_y(kitti_root):
    cfg = {"dataset_dir": kitti_root, "dataset_name": "SemanticKitti",
           "model_settings": {"projection": [32, 128], "rotate": False,
                              "flip": True, "resize": False},
           "train_params": {}}
    _, pairs = readers.dataset_splits(cfg)
    ds = readers.build_dataset(cfg, pairs, train=True)
    ds._rng = np.random.default_rng(1)  # deterministic flip decision
    base = readers.build_dataset(cfg, pairs, train=False)[0]
    flipped = None
    for _ in range(20):
        s = ds[0]
        if not np.allclose(s["xyz"], base["xyz"]):
            flipped = s
            break
    assert flipped is not None, "flip never triggered in 20 draws"
    np.testing.assert_allclose(flipped["xyz"][:, ::-1, 0], base["xyz"][..., 0])
    np.testing.assert_allclose(flipped["xyz"][:, ::-1, 1],
                               -base["xyz"][..., 1])


def test_stf_five_column_reader(tmp_path):
    """STF scans are N x 5; reflectivity/255 and 1.8 m near clip apply."""
    rng = np.random.default_rng(0)
    n = 500
    pc5 = np.zeros((n, 5), np.float32)
    pc5[:, 0:3] = rng.uniform(-10, 10, (n, 3))
    pc5[:100, 0:3] *= 0.05      # near points to be clipped
    pc5[:, 3] = rng.uniform(0, 255, n)
    vel = tmp_path / "velodyne"
    lab = tmp_path / "labels"
    vel.mkdir()
    lab.mkdir()
    pc5.tofile(str(vel / "000000.bin"))
    labels = rng.integers(0, 21, n).astype(np.uint32)
    labels.tofile(str(lab / "000000.label"))

    ds = readers.ProjectedDataset(
        [(str(vel / "000000.bin"), str(lab / "000000.label"))],
        projection=(16, 64), bin_columns=5, reflectivity_scale=255.0,
        near_clip=1.8, id_map=None)
    s = ds[0]
    assert s["reflectivity"].max() <= 1.0 + 1e-6
    # all projected ranges are >= the near clip
    occ = np.linalg.norm(s["xyz"], axis=-1) > 0
    assert (np.linalg.norm(s["xyz"][occ], axis=-1) >= 1.8 - 1e-5).all()


def test_wads_snow_ids_and_adverse_remap(tmp_path):
    rng = np.random.default_rng(0)
    n = 300
    xyzi = rng.uniform(2, 30, (n, 4)).astype(np.float32)
    vel = tmp_path / "velodyne"
    lab = tmp_path / "labels"
    vel.mkdir()
    lab.mkdir()
    xyzi.tofile(str(vel / "0.bin"))
    raw = np.full(n, 110, np.uint32)   # falling snow
    raw[:50] = 40                      # road
    raw.tofile(str(lab / "0.label"))
    pair = [(str(vel / "0.bin"), str(lab / "0.label"))]

    ds = readers.ProjectedDataset(pair, projection=(16, 64),
                                  id_map=readers.WADS_ID_MAP)
    labels = ds[0]["labels"]
    assert 20 in np.unique(labels)     # snow class present

    ds2 = readers.ProjectedDataset(pair, projection=(16, 64),
                                   id_map=readers.WADS_ID_MAP,
                                   remap_adverse_label=True)
    assert 20 not in np.unique(ds2[0]["labels"])


def test_organized_reader(tmp_path):
    h, w = 8, 16
    rng = np.random.default_rng(0)
    xyzi = rng.uniform(1, 5, (h * w, 4)).astype(np.float32)
    raw = np.full(h * w, 40, np.uint32)
    vel = tmp_path / "velodyne"
    lab = tmp_path / "labels"
    vel.mkdir()
    lab.mkdir()
    xyzi.tofile(str(vel / "0.bin"))
    raw.tofile(str(lab / "0.label"))
    ds = readers.OrganizedDataset(
        [(str(vel / "0.bin"), str(lab / "0.label"))], shape=(h, w))
    s = ds[0]
    assert s["labels"].shape == (h, w)
    assert (s["labels"] == 9).all()    # 40 -> road
    np.testing.assert_allclose(s["xyz"], xyzi[:, 0:3].reshape(h, w, 3))
