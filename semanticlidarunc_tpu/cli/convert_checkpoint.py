"""Convert a reference PyTorch checkpoint into an orbax checkpoint.

Usage:
  python -m semanticlidarunc_tpu.cli.convert_checkpoint \
      --torch_ckpt model_final.pt --backbone resnet50 --num_classes 21 \
      --out converted_ckpt [--input_channels 2 --meta_channels 6]

Covers every model family the reference can train: Reichert FPN (all 15
backbones, default), and via --baseline: SalsaNext, CENet (--model_type
HarDNet | ResNet_34) and FIDNet.

The output directory loads via `model_settings.pretrained` / the Tester.
Forward parity of converted models is covered by tests/test_torch_parity.py.
"""
from __future__ import annotations

import argparse


def main(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..train import checkpoint as ckpt
    from ..utils.torch_convert import apply_converted

    import torch

    sd = torch.load(args.torch_ckpt, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.removeprefix("module."):
          v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}

    key = jax.random.PRNGKey(0)
    if args.baseline == "Reichert":
        from ..models.fpn import SemanticFPN
        from ..utils.torch_convert import convert_reichert_state_dict
        # the reference Reichert checkpoints are bare state_dicts; strip a
        # "model." wrapper if one is present (utils/weights.py:57 analog)
        sd = {k.removeprefix("model."): v for k, v in sd.items()}
        model = SemanticFPN(num_classes=args.num_classes,
                            backbone=args.backbone,
                            input_channels=args.input_channels,
                            meta_channels=args.meta_channels)
        x = jnp.zeros((1, 64, 128, args.input_channels))
        meta = jnp.zeros((1, 64, 128, args.meta_channels))
        variables = model.init({"params": key, "dropout": key}, x, meta,
                               train=False)
        converted = convert_reichert_state_dict(sd, args.backbone,
                                                args.num_classes)
    else:
        x = jnp.zeros((1, 64, 128, 5))
        if args.baseline == "SalsaNext":
            from ..models.salsanext import SalsaNext
            from ..utils.salsanext_convert import (
                convert_salsanext_state_dict)
            sd = {k.removeprefix("model."): v for k, v in sd.items()}
            model = SalsaNext(num_classes=args.num_classes)
            converted = convert_salsanext_state_dict(sd)
        elif args.baseline == "CENet":
            from ..models.cenet import CENet
            from ..utils.baseline_convert import (
                convert_cenet_hardnet_state_dict,
                convert_cenet_resnet34_state_dict)
            trunk = args.model_type
            model = CENet(num_classes=args.num_classes, aux=True,
                          model=trunk)
            converted = (convert_cenet_hardnet_state_dict(sd)
                         if trunk == "HarDNet"
                         else convert_cenet_resnet34_state_dict(sd))
        else:  # FIDNet
            from ..models.fidnet import FIDNet
            from ..utils.baseline_convert import convert_fidnet_state_dict
            model = FIDNet(num_classes=args.num_classes)
            converted = convert_fidnet_state_dict(sd)
        variables = model.init({"params": key, "dropout": key}, x,
                               train=False)
    variables, missing = apply_converted(variables, converted)
    if missing:
        print(f"WARNING: {len(missing)} leaves kept from fresh init:")
        for k in missing[:10]:
            print("  ", k)
    ckpt.save_checkpoint(args.out, {"variables": jax.device_get(variables),
                                    "step": 0})
    print(f"Saved converted checkpoint to {args.out}")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="torch -> orbax converter")
    p.add_argument("--torch_ckpt", required=True)
    p.add_argument("--baseline", default="Reichert",
                   choices=["Reichert", "SalsaNext", "CENet", "FIDNet"])
    p.add_argument("--model_type", default="HarDNet",
                   choices=["HarDNet", "ResNet_34"],
                   help="CENet trunk")
    p.add_argument("--backbone", default="resnet50",
                   choices=["resnet18", "resnet34", "resnet50",
                            "shufflenet_v2_x0_5", "shufflenet_v2_x1_0",
                            "shufflenet_v2_x1_5", "shufflenet_v2_x2_0",
                            "regnet_y_400mf", "regnet_y_800mf",
                            "regnet_y_1_6gf", "regnet_y_3_2gf",
                            "efficientnet_v2_s", "efficientnet_v2_m",
                            "efficientnet_v2_l", "squeezenet1_0"])
    p.add_argument("--num_classes", type=int, required=True)
    p.add_argument("--input_channels", type=int, default=2)
    p.add_argument("--meta_channels", type=int, default=6)
    p.add_argument("--out", required=True)
    return p.parse_args(argv)


if __name__ == "__main__":
    main(parse_args())
