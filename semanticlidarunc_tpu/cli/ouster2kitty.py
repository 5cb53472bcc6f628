"""Ouster OSF -> SemanticKITTI-format converter.

Port of /root/reference/src/ouster2kitty.py: stream an OSF recording,
destagger xyz + reflectivity, write float32 N x 4 `velodyne/<timestamp>.bin`
files plus a KITTI-style `poses.txt` from the per-scan SLAM poses.
Requires the ouster-sdk (optional dependency).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def convert(osf_path: str, config_path: str, save_path: str, col: int = 1023,
            skip_first: int = 2):
    from contextlib import closing

    from ouster.sdk import client, osf  # type: ignore

    point_dir = os.path.join(save_path, "velodyne")
    os.makedirs(point_dir, exist_ok=True)
    with open(config_path, "r") as f:
        metadata = client.SensorInfo(f.read())

    all_poses = []
    with closing(osf.Scans(osf_path)) as stream:
        xyzlut = client.XYZLut(metadata)
        for i, scan in enumerate(stream):
            if i < skip_first:
                continue
            xyz = client.destagger(stream.metadata, xyzlut(scan))
            refl = client.destagger(
                stream.metadata, scan.field(client.ChanField.REFLECTIVITY))
            ts = scan.timestamp[col]
            name = str(np.uint64(ts))
            pc = np.concatenate([xyz, refl[..., None]],
                                axis=-1).reshape(-1, 4).astype(np.float32)
            pc.tofile(os.path.join(point_dir, name + ".bin"))
            T = scan.pose[col, ...]
            all_poses.append([T[0, 0], T[0, 1], T[0, 2], T[0, 3],
                              T[1, 0], T[1, 1], T[1, 2], T[1, 3],
                              T[2, 0], T[2, 1], T[2, 2], T[2, 3]])
    np.savetxt(os.path.join(save_path, "poses.txt"), np.array(all_poses))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Ouster OSF -> KITTI converter")
    p.add_argument("--save_path", type=str, required=True,
                   help="Output dir for KITTI-format scans")
    p.add_argument("--osf_path", type=str, required=True,
                   help="Input OSF recording")
    p.add_argument("--config_path", type=str, required=True,
                   help="Ouster sensor config json")
    return p.parse_args(argv)


if __name__ == "__main__":
    args = parse_args()
    convert(args.osf_path, args.config_path, args.save_path)
