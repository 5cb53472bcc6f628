"""CLI entry: train / test with a reference-compatible argument surface.

Mirrors /root/reference/src/train_semantics.py: `--cfg_path --mode
{train,test} --visualization --with_logging`, same YAML schema, same run-dir
naming, same split globbing. Additions: `dataset_dir: synthetic` runs on the
in-memory synthetic dataset (smoke tests / machines without data), and
checkpoints are orbax directories with true resume.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build_loaders(cfg, args_mode: str):
    from ..dataset import pipeline, readers

    tp = cfg["train_params"]
    pairs_override = cfg.get("extras", {}).get("split_pairs")
    if pairs_override is not None:
        # explicit (train_pairs, test_pairs) — the leave-one-scene-out
        # entry (train_semantic_thab.py) builds its own split
        train_pairs, test_pairs = pairs_override
        train_ds = readers.build_dataset(cfg, train_pairs, train=True)
        test_ds = readers.build_dataset(cfg, test_pairs, train=False)
    elif str(cfg.get("dataset_dir", "")).lower() == "synthetic":
        proj = tuple(cfg["model_settings"].get("projection", [32, 128]))
        train_ds = pipeline.SyntheticDataset(n_scans=8, projection=proj)
        test_ds = pipeline.SyntheticDataset(n_scans=4, projection=proj,
                                            seed=100)
    else:
        train_pairs, test_pairs = readers.dataset_splits(cfg)
        if not train_pairs and args_mode == "train":
            print(f"ERROR: no scans found under {cfg['dataset_dir']}",
                  file=sys.stderr)
            sys.exit(1)
        train_ds = readers.build_dataset(cfg, train_pairs, train=True)
        test_ds = readers.build_dataset(cfg, test_pairs, train=False)

    train_loader = pipeline.DataLoader(
        train_ds, batch_size=int(tp.get("batch_size", 4)), shuffle=True,
        num_workers=int(tp.get("num_workers", 0)), drop_last=True)
    test_loader = pipeline.DataLoader(
        test_ds, batch_size=1, shuffle=False,
        num_workers=int(tp.get("num_workers", 0)))
    return train_loader, test_loader


def calibrate(cfg, model, test_loader, checkpoint: str | None):
    """Fit a post-hoc temperature on the calibration stream and save it next
    to the checkpoint (reference temp_scaling.py cache-then-fit flow)."""
    import jax
    import jax.numpy as jnp

    from ..losses import segmentation as seg
    from ..models import registry
    from ..prob import temp_scaling
    from ..train.trainer import Trainer

    trainer = Trainer(model, cfg)
    batch0 = next(iter(test_loader))
    state = trainer.create_state(batch0, num_epochs=1, steps_per_epoch=1,
                                 pretrained=checkpoint)

    @jax.jit
    def forward_probs_fn(params, batch_stats, batch):
        out, _ = trainer._forward(params, batch_stats, batch, train=False)
        out = trainer.predictions_from_outputs(out)
        return seg.to_probs(out, trainer.model_act)

    def stream():
        for batch in test_loader:
            yield batch

    def forward_probs(batch):
        p = forward_probs_fn(state.params, state.batch_stats, batch)
        return p, batch["labels"]

    logits, labels = temp_scaling.cache_calib_outputs(
        forward_probs, stream(), ignore_index=trainer.ignore_index)
    out_path = os.path.join(os.path.dirname(checkpoint or "."),
                            "temperature.json")
    T = temp_scaling.calibrate_temperature(logits, labels,
                                           save_path=out_path)
    print(f"Calibrated temperature T={T:.4f} -> {out_path}")
    return T


def main(args):
    assert args.mode in {"train", "test", "calibrate"}, \
        "Set --mode to one of 'train', 'test' or 'calibrate'"
    if getattr(args, "platform", None):
        # must land before any jax op; some accelerator plugins ignore the
        # JAX_PLATFORMS env var, the config knob is always honored
        import jax
        if args.platform == "cpu":
            from ..utils import compile_cache
            compile_cache.pin_cpu_isa()
        jax.config.update("jax_platforms", args.platform)
    from ..utils import config as cfg_util

    cfg = cfg_util.load_config(args.cfg_path)
    cfg = cfg_util.with_extras(cfg)
    return run_with_cfg(cfg, args)


def run_with_cfg(cfg, args):
    """Run train/test/calibrate from an already-built cfg (extras filled).
    Shared by the reference-compatible YAML entry (`main`) and the
    per-baseline THAB entry (`train_semantic_thab.py`)."""
    from ..models import registry
    from ..train.tester import Tester
    from ..train.trainer import Trainer
    from ..utils import compile_cache
    from ..utils import config as cfg_util

    compile_cache.enable()
    train_loader, test_loader = build_loaders(cfg, args.mode)

    model = registry.build_model(cfg)

    # optional multi-chip execution: --mesh auto | D | DxM (model axis = SP)
    mesh, spatial = None, False
    spec = getattr(args, "mesh", None)
    if spec:
        from ..parallel import mesh as pm
        parsed = pm.parse_mesh_spec(spec)
        if parsed is not None and parsed[0] * parsed[1] > 1:
            mesh = pm.make_mesh(parsed[0] * parsed[1], data=parsed[0],
                                model=parsed[1])
            spatial = parsed[1] > 1
            print(f"[mesh] {dict(mesh.shape)} spatial={spatial}")

    save_path = ""
    if args.with_logging:
        ts = time.strftime("%y-%m-%d_%H-%M-%S", time.gmtime())
        save_path = cfg_util.run_dir_name(cfg, ts)
        if args.mode != "test":
            os.makedirs(save_path, exist_ok=True)
            cfg["extras"]["save_path"] = save_path
            cfg_util.save_config(
                {k: v for k, v in cfg.items() if k != "extras"},
                os.path.join(save_path, "config.yaml"))

    tp = cfg["train_params"]
    num_epochs = int(tp.get("num_epochs", 50)) + \
        int(tp.get("num_warmup_epochs", 0))
    ls = cfg.get("logging_settings", {})

    if args.mode == "train":
        trainer = Trainer(model, cfg, logging=args.with_logging,
                          save_path=save_path, mesh=mesh, spatial=spatial)
        batch0 = next(iter(train_loader))
        state = trainer.create_state(
            batch0, num_epochs=num_epochs,
            steps_per_epoch=len(train_loader),
            pretrained=cfg["model_settings"].get("pretrained"),
            resume=args.resume)
        print("num_params:",
              registry.count_parameters(state.params) / 1e6, "M")
        state, history = trainer.fit(
            state, train_loader, test_loader, num_epochs=num_epochs,
            test_every=int(ls.get("test_every_nth_epoch", 2)),
            save_every=int(ls.get("save_every_nth_epoch", 2)))
        for h in history[-3:]:
            print(h)
    elif args.mode == "calibrate":
        calibrate(cfg, model, test_loader,
                  cfg["model_settings"].get("pretrained"))
    else:
        tester = Tester(model, cfg, logging=args.with_logging,
                        out_dir=save_path or ".",
                        visualize=bool(args.visualization),
                        checkpoint=cfg["model_settings"].get("pretrained"),
                        mesh=mesh, spatial=spatial)
        result = tester.run(test_loader, mc_samples=args.mc_samples)
        print("mIoU:", result.get("mIoU"))


def _str2bool(v) -> bool:
    """argparse bool that accepts `--flag False` (the reference used
    `type=bool`, under which the string "False" evaluates truthy)."""
    if isinstance(v, bool):
        return v
    return str(v).strip().lower() in ("1", "true", "t", "yes", "y")


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Train/test script (TPU-native SemanticLiDARUnc)")
    parser.add_argument("--visualization", type=_str2bool, nargs="?",
                        const=True, default=False,
                        help="Toggle visualization during training")
    parser.add_argument("--with_logging", type=_str2bool, nargs="?",
                        const=True, default=True,
                        help="Toggle logging (weights + tensorboard)")
    parser.add_argument("--mesh", type=str, default=None,
                        help="Multi-chip mesh: 'auto' (all devices, pure DP),"
                             " 'D' (D-way DP) or 'DxM' (DP x spatial/azimuth"
                             " sharding). Default: single device.")
    parser.add_argument("--cfg_path", type=str,
                        default="configs/SemanticKitti_default.yaml",
                        help="Path to the config file")
    parser.add_argument("--mode", type=str, default="train",
                        help="'train' or 'test'")
    parser.add_argument("--mc_samples", type=int, default=30,
                        help="MC samples for --mode test")
    parser.add_argument("--resume", type=str, default=None,
                        help="Checkpoint dir to resume training from "
                             "(restores params, optimizer state, and step)")
    parser.add_argument("--platform", type=str, default=None,
                        help="Force a jax backend (e.g. 'cpu') — useful for "
                             "smoke runs on accelerator hosts")
    return parser.parse_args(argv)


if __name__ == "__main__":
    main(parse_args())
