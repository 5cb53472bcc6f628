"""Per-baseline SemanticTHAB training entry (leave-one-scene-out CV).

Reference-compatible analog of the standalone baseline scripts
`/root/reference/src/baselines/{CENet,FIDNet}/train_semantic_THAB.py:103-129`:
same argparse surface (`--model_type --test_id --learning_rate --num_epochs
--test_every_nth_epoch --batch_size --num_workers --rotate --normals --flip
--visualization`), same leave-one-scene-out split over the numbered THAB
scene folders (``test_id == -1`` trains on all scenes and tests on scene
0002, matching the reference's ``i == 2`` pick), and the same scene-6 test
mask (`train_semantic_THAB.py:57-60`).

Instead of the reference's duplicated per-baseline Trainer/Tester loops
(which bit-rotted against `models/losses.py` — see docs/baselines.md), this
entry routes the baseline through the unified compiled Trainer with the
reference baseline loss: CE + Tversky(alpha=0.9, beta=0.1), plus CENet's
unit-weight aux-head terms which the Trainer adds automatically
(`/root/reference/src/baselines/CENet/trainer.py:100-110`).

Additions over the reference: `--dataset_dir` (the reference hardcodes
`/home/appuser/data/SemanticTHAB`; pass ``synthetic`` for an in-memory
smoke run), `--baseline {CENet,FIDNet}` (the reference ships one copy of
this script per baseline), `--log_dir`, and `--mode test`.
"""
from __future__ import annotations

import argparse
import glob
import os

from . import train_semantics as ts


def build_thab_split(root: str, test_id: int):
    """(train_pairs, test_pairs) over numbered scene folders under `root`
    (reference `train_semantic_THAB.py:46-53`: scan `sequences/`, train on
    every scene but the test one; -1 -> train on all, test on scene 2)."""
    seq_root = os.path.join(root, "sequences")
    if not os.path.isdir(seq_root):
        seq_root = root
    scenes = sorted(d for d in os.listdir(seq_root)
                    if os.path.isdir(os.path.join(seq_root, d))
                    and d.isdigit())

    def pairs(scene):
        bins = sorted(
            glob.glob(os.path.join(seq_root, scene, "velodyne", "*.bin")))
        return [(b, b.replace("velodyne", "labels").replace(".bin",
                                                            ".label"))
                for b in bins]

    test_scene = test_id if test_id != -1 else 2
    train_scenes = (scenes if test_id == -1
                    else [s for s in scenes if int(s) != test_scene])
    train = [p for s in train_scenes for p in pairs(s)]
    test = [p for s in scenes if int(s) == test_scene for p in pairs(s)]
    return train, test


# scene-6 recordings lack some classes; the reference masks them out of
# mIoU (`train_semantic_THAB.py:57-58`)
_TEST_MASK_SCENE6 = [0, 1, 0, 0, 1, 0, 1, 0, 0, 1,
                     1, 1, 0, 1, 1, 1, 1, 1, 1, 1]


def build_cfg(args):
    from ..utils import config as cfg_util

    cfg = {
        "dataset_dir": args.dataset_dir,
        "dataset_name": "SemanticTHAB",
        "model_settings": {
            "baseline": args.baseline,
            "model_type": args.model_type,
            "loss_function": "Tversky",        # CE + Tversky, ref baseline
            "attention": False,
            "multi_scale_meta": False,
            "normals": bool(args.normals),
            "reflectivity": True,
            "rotate": bool(args.rotate),
            "flip": bool(args.flip),
            "use_mc_sampling": False,
            "projection": list(args.projection),
            "resize": False,
            "pretrained": args.pretrained,
        },
        "train_params": {
            "learning_rate": args.learning_rate,
            "learning_rate_min": args.learning_rate * 0.01,
            "batch_size": args.batch_size,
            "num_workers": args.num_workers,
            "num_epochs": args.num_epochs,
            "weight_decay": 0.0,
            "num_warmup_epochs": 0,
        },
        "logging_settings": {
            "test_id": args.test_id,
            "test_every_nth_epoch": args.test_every_nth_epoch,
            "save_every_nth_epoch": args.test_every_nth_epoch,
            "log_dir": args.log_dir,
        },
    }
    cfg = cfg_util.with_extras(cfg)
    if args.test_id == 6:
        n = cfg["extras"]["num_classes"]
        cfg["extras"]["test_mask"] = (_TEST_MASK_SCENE6 + [1] * n)[:n]
    if str(args.dataset_dir).lower() != "synthetic":
        cfg["extras"]["split_pairs"] = build_thab_split(
            args.dataset_dir, args.test_id)
    return cfg


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Train script for SemanticTHAB (leave-one-scene-out)")
    p.add_argument("--model_type", type=str, default="HarDNet")
    p.add_argument("--baseline", type=str, default="CENet",
                   choices=["CENet", "FIDNet"])
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--num_epochs", type=int, default=10)
    p.add_argument("--test_every_nth_epoch", type=int, default=1)
    p.add_argument("--test_id", type=int, default=6,
                   help="test scene for leave-one-out CV; -1 = train on all")
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--num_workers", type=int, default=0)
    p.add_argument("--rotate", action="store_true")
    p.add_argument("--normals", action="store_true")
    p.add_argument("--flip", action="store_true")
    p.add_argument("--visualization", action="store_true")
    p.add_argument("--projection", type=int, nargs=2, default=[128, 2048],
                   help="organized THAB image shape (OS2-128: 128x2048)")
    p.add_argument("--dataset_dir", type=str,
                   default="/home/appuser/data/SemanticTHAB")
    p.add_argument("--log_dir", type=str, default="runs/thab")
    p.add_argument("--pretrained", type=str, default=None)
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "test"])
    p.add_argument("--with_logging", type=ts._str2bool, default=True)
    p.add_argument("--mc_samples", type=int, default=30)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--mesh", type=str, default=None)
    p.add_argument("--platform", type=str, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = build_cfg(args)
    return ts.run_with_cfg(cfg, args)


if __name__ == "__main__":
    main()
