"""Dataset readers for SemanticKITTI / STF / THAB / WADS / Panoptic-CUDAL.

Behavioral ports of /root/reference/src/dataset/dataloader_semantic_*.py.
Each reader yields a dict of HWC float32 numpy arrays
{"range", "reflectivity", "xyz", "normals", "labels"} — the NHWC analog of the
reference's 5 CHW tensors. Host preprocessing (projection, normals, resize,
augmentations) matches the reference numerically; the on-device projection in
ops.projection exists for the inference path where scans should go straight
to HBM.
"""
from __future__ import annotations

import glob
import os
from dataclasses import dataclass
from typing import Callable

import numpy as np

from ..ops.normals import build_normal_xyz_np
from ..ops.projection import rotate_z_np, spherical_projection_np
from . import definitions


def _resize_nearest(img: np.ndarray, out_wh: tuple[int, int]) -> np.ndarray:
    """cv2.resize(..., INTER_NEAREST) with a numpy fallback."""
    try:
        import cv2
        return cv2.resize(img, out_wh, interpolation=cv2.INTER_NEAREST)
    except ImportError:
        w, h = out_wh
        ys = (np.arange(h) * img.shape[0] / h).astype(np.int64)
        xs = (np.arange(w) * img.shape[1] / w).astype(np.int64)
        return img[ys][:, xs]


def _build_normals(xyz: np.ndarray) -> np.ndarray:
    """Scharr normals: native C++ kernel when buildable (GIL-releasing, the
    thread-pool loader's hot path — semanticlidarunc_tpu/native), else cv2
    (bit-matches reference), else the numpy golden twin."""
    from .. import native
    if native.available():
        return native.scharr_normals(xyz)
    try:
        import cv2
        nf = 0.25

        def sch(c, dx, dy):
            return cv2.Scharr(xyz[..., c].astype(np.float32), cv2.CV_32FC1,
                              dx, dy, scale=1.0 / nf)
        sxx, sxy = sch(0, 1, 0), sch(0, 0, 1)
        syx, syy = sch(1, 1, 0), sch(1, 0, 1)
        szx, szy = sch(2, 1, 0), sch(2, 0, 1)
        normal = -np.dstack((syx * szy - szx * syy,
                             szx * sxy - szy * sxx,
                             sxx * syy - syx * sxy))
        n = np.linalg.norm(normal, axis=2) + 1e-10
        return normal / n[..., None]
    except ImportError:
        return build_normal_xyz_np(xyz)


def read_kitti_scan(frame_path: str, label_path: str | None,
                    columns: int = 4):
    """(xyzi [N,4], raw_labels [N] or None) from SemanticKITTI-format files.

    .label packs semantic id in the low 16 bits (reference
    dataloader_semantic_KITTI.py:41-44)."""
    xyzi = np.fromfile(frame_path, dtype=np.float32).reshape(-1, columns)[:, :4]
    if label_path is None:
        return xyzi, None
    raw = np.fromfile(label_path, dtype=np.uint32).reshape(-1)
    return xyzi, (raw & 0xFFFF).astype(np.int64)


def _finalize(xyzi_img: np.ndarray, flip: bool, rng: np.random.Generator):
    if flip and rng.random() < 0.5:
        xyzi_img = xyzi_img[:, ::-1, :].copy()
        xyzi_img[..., 1] *= -1
    labels = xyzi_img[..., 4].astype(np.int64)
    reflectivity = xyzi_img[..., 3:4].astype(np.float32)
    xyz = xyzi_img[..., 0:3].astype(np.float32)
    rng_img = np.linalg.norm(xyz, axis=-1, keepdims=True).astype(np.float32)
    normals = _build_normals(xyz).astype(np.float32)
    return {"range": rng_img, "reflectivity": reflectivity, "xyz": xyz,
            "normals": normals, "labels": labels}


@dataclass
class ProjectedDataset:
    """Projection-based reader (KITTI / STF / WADS / CUDAL variants)."""
    data_path: list[tuple[str, str]]
    projection: tuple[int, int] = (64, 2048)
    rotate: bool = False
    flip: bool = False
    resize: bool = False
    resize_to: tuple[int, int] = (2048, 128)       # (W, H), cv2 convention
    theta_range: tuple[float, float] | None = None
    id_map: dict | None = None                     # raw-id lut; None = identity
    bin_columns: int = 4
    reflectivity_scale: float = 1.0
    near_clip: float | None = None
    remap_adverse_label: bool = False
    drop_empty_rows: bool = False
    seed: int = 0

    def __post_init__(self):
        self._lut = None if self.id_map is None else \
            definitions.id_map_lut(self.id_map)
        self._rng = np.random.default_rng(self.seed)

    def __len__(self):
        return len(self.data_path)

    def __getitem__(self, idx: int):
        frame_path, label_path = self.data_path[idx]
        xyzi, raw = read_kitti_scan(frame_path, label_path, self.bin_columns)
        if self.reflectivity_scale != 1.0:
            xyzi[:, 3] = xyzi[:, 3] / self.reflectivity_scale
        labels = raw if self._lut is None else self._lut[np.clip(raw, 0, len(self._lut) - 1)]
        if self.near_clip is not None:
            keep = np.linalg.norm(xyzi[:, 0:3], axis=-1) >= self.near_clip
            xyzi, labels = xyzi[keep], labels[keep]
        if self.remap_adverse_label:
            labels = np.where(labels == 20, 0, labels)

        xyzil = np.concatenate([xyzi, labels[:, None].astype(np.float32)],
                               axis=-1)
        if self.rotate:
            angle = float(self._rng.integers(-180, 180))
            xyzil[:, 0:3] = rotate_z_np(xyzil[:, 0:3], angle)
        from .. import native
        if native.available():
            img = native.spherical_projection(
                xyzil, self.projection[0], self.projection[1],
                theta_range=self.theta_range)
        else:
            img, _, _, _ = spherical_projection_np(
                xyzil, self.projection[0], self.projection[1],
                theta_range=self.theta_range)
        if self.drop_empty_rows:
            img = img[~np.all(np.linalg.norm(img, axis=-1) == 0, axis=1)]
        if self.resize:
            img = _resize_nearest(img, self.resize_to)
        return _finalize(img, self.flip, self._rng)


@dataclass
class OrganizedDataset:
    """Sensor-organized reader (THAB): scan rows ARE the projection — just
    reshape to (H, W) (reference dataloader_semantic_THAB.py:49-51)."""
    data_path: list[tuple[str, str]]
    shape: tuple[int, int] = (128, 2048)
    rotate: bool = False
    flip: bool = False
    id_map: dict | None = None
    seed: int = 0

    def __post_init__(self):
        self._lut = definitions.id_map_lut(self.id_map)
        self._rng = np.random.default_rng(self.seed)

    def __len__(self):
        return len(self.data_path)

    def __getitem__(self, idx: int):
        frame_path, label_path = self.data_path[idx]
        xyzi, raw = read_kitti_scan(frame_path, label_path)
        labels = self._lut[np.clip(raw, 0, len(self._lut) - 1)]
        h, w = self.shape
        img = np.concatenate([xyzi.reshape(h, w, 4),
                              labels.reshape(h, w, 1).astype(np.float32)],
                             axis=-1)
        if self.flip and self._rng.random() < 0.5:
            img = img[:, ::-1, :].copy()
            img[..., 1] *= -1
        if self.rotate:
            angle = float(self._rng.integers(-180, 180))
            shift = int(round((angle / 360.0) * img.shape[1]))
            img = np.roll(img, shift, axis=1)
            img[..., 0:3] = rotate_z_np(
                img[..., 0:3].reshape(-1, 3), angle).reshape(img[..., 0:3].shape)
        return _finalize(img, flip=False, rng=self._rng)


# ---------------------------------------------------------------------------
# dataset factory + split globs (reference train_semantics.py:66-93)
# ---------------------------------------------------------------------------

WADS_ID_MAP = {**definitions.ID_MAP, 110: 20, 111: 20}
CUDAL_ID_MAP = {**definitions.ID_MAP, 2: 12}

_KITTI_TRAIN_SEQS = [f"{i:02}" for i in range(11) if i != 8]


def _pairs(pattern: str) -> list[tuple[str, str]]:
    return [(p, p.replace("velodyne", "labels").replace("bin", "label"))
            for p in sorted(glob.glob(pattern))]


def dataset_splits(cfg: dict) -> tuple[list, list]:
    """(train_pairs, test_pairs) per the reference's per-dataset globs."""
    root = cfg["dataset_dir"]
    name = cfg["dataset_name"]
    if name == "SemanticSTF":
        return (_pairs(f"{root}/train/velodyne/*.bin"),
                _pairs(f"{root}/val/velodyne/*.bin"))
    if name == "Panoptic-CUDAL":
        train = [p for s in ["30", "31", "32", "36", "40", "41"]
                 for p in _pairs(f"{root}/{s}/velodyne/*.bin")]
        return train, _pairs(f"{root}/34/velodyne/*.bin")
    if name == "SemanticTHAB":
        train = [p for s in [f"{i:04}" for i in range(9) if i != 6]
                 for p in _pairs(f"{root}/{s}/velodyne/*.bin")]
        return train, _pairs(f"{root}/0006/velodyne/*.bin")
    if name == "SemanticWADS":
        seqs = [11, 12, 13, 14, 15, 16, 17, 18, 20, 22, 23, 24, 26, 28,
                34, 35, 36, 37, 76]
        train = [p for s in [f"{i:02}" for i in seqs]
                 for p in _pairs(f"{root}/{s}/velodyne/*.bin")]
        return train, _pairs(f"{root}/30/velodyne/*.bin")
    # default: SemanticKitti layout
    train = [p for s in _KITTI_TRAIN_SEQS
             for p in _pairs(f"{root}/{s}/velodyne/*.bin")]
    return train, _pairs(f"{root}/08/velodyne/*.bin")


def build_dataset(cfg: dict, pairs: list, train: bool):
    """Reader matching the dataset_name's reference semantics."""
    ms = cfg["model_settings"]
    name = cfg["dataset_name"]
    rotate = bool(ms.get("rotate", False)) and train
    flip = bool(ms.get("flip", False)) and train
    projection = tuple(ms.get("projection", (64, 512)))
    resize = bool(ms.get("resize", False))

    if name == "SemanticTHAB":
        return OrganizedDataset(pairs, shape=(128, 2048), rotate=rotate,
                                flip=flip)
    if name == "SemanticSTF":
        return ProjectedDataset(
            pairs, projection=projection, rotate=rotate, flip=flip,
            resize=resize, bin_columns=5, reflectivity_scale=255.0,
            near_clip=1.8, id_map=None,
            remap_adverse_label=bool(cfg.get("remap_adverse_label", 0)))
    if name == "SemanticWADS":
        return ProjectedDataset(
            pairs, projection=projection, rotate=rotate, flip=flip,
            resize=resize, resize_to=(1024, 64), id_map=WADS_ID_MAP,
            theta_range=(-np.pi / 2, np.pi / 2), drop_empty_rows=True)
    if name == "Panoptic-CUDAL":
        return ProjectedDataset(
            pairs, projection=projection, rotate=rotate, flip=flip,
            resize=resize, id_map=CUDAL_ID_MAP,
            theta_range=(-np.pi / 8, np.pi / 8))
    return ProjectedDataset(pairs, projection=projection, rotate=rotate,
                            flip=flip, resize=resize,
                            id_map=definitions.ID_MAP)
