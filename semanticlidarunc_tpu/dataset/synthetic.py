"""Synthetic LiDAR scans for tests and offline benchmarks.

Generates a plausible rotating-scanner point cloud (ground plane + a few boxes
+ noise) with per-point semantic labels, so the full pipeline (projection,
normals, training, metrics) can run without SemanticKITTI on disk. The layout
matches the KITTI reader output: (N, 5) float32 [x, y, z, intensity, label].
"""
from __future__ import annotations

import numpy as np


def make_scan(seed: int = 0, n_beams: int = 32, n_azimuth: int = 512,
              max_range: float = 60.0) -> np.ndarray:
    """Return an (N, 5) array [x, y, z, intensity, train_label]."""
    rng = np.random.default_rng(seed)
    az = np.linspace(-np.pi, np.pi, n_azimuth, endpoint=False)
    elev = np.radians(np.linspace(-24.8, 2.0, n_beams))
    az_g, el_g = np.meshgrid(az, elev)
    az_g = az_g.ravel()
    el_g = el_g.ravel()

    # ground plane at z = -1.8 (sensor height)
    with np.errstate(divide="ignore"):
        r_ground = np.where(el_g < -1e-3, -1.8 / np.sin(el_g), max_range)
    r = np.clip(r_ground, 0.5, max_range)
    label = np.where(el_g < -1e-3, 9, 15).astype(np.float32)  # road / vegetation

    # a few box "cars" at fixed azimuths
    for i in range(4):
        center = -np.pi + (i + 0.5) * np.pi / 2 + 0.2 * rng.standard_normal()
        dist = 8.0 + 10.0 * rng.random()
        hit = (np.abs(np.angle(np.exp(1j * (az_g - center)))) < 0.12) & (r > dist)
        r = np.where(hit, dist, r)
        label = np.where(hit, 1.0, label)  # car

    r = r * (1.0 + 0.002 * rng.standard_normal(r.shape))
    x = r * np.cos(el_g) * np.cos(az_g)
    y = r * np.cos(el_g) * np.sin(az_g)
    z = r * np.sin(el_g)
    intensity = np.clip(0.3 + 0.2 * rng.standard_normal(r.shape), 0.0, 1.0)

    pc = np.stack([x, y, z, intensity, label], axis=-1).astype(np.float32)
    # random dropout of ~5% of points, as real scans have missing returns
    keep = rng.random(pc.shape[0]) > 0.05
    return pc[keep]


def write_kitti_scan(path_bin: str, path_label: str, seed: int = 0) -> None:
    """Write a synthetic scan in SemanticKITTI .bin/.label format.

    .bin: float32 (N, 4) xyzi; .label: uint32 with semantic id in the low 16
    bits (reference: src/dataset/dataloader_semantic_KITTI.py:35-44). Labels
    are written as *raw* SemanticKITTI ids so the id_map roundtrips.
    """
    from . import definitions

    pc = make_scan(seed)
    pc[:, 0:4].astype(np.float32).tofile(path_bin)
    # invert the train-id -> pick a representative raw id per train id
    inv = {}
    for raw, train in definitions.ID_MAP.items():
        inv.setdefault(train, raw)
    raw_ids = np.array([inv[int(t)] for t in pc[:, 4]], dtype=np.uint32)
    raw_ids.tofile(path_label)
