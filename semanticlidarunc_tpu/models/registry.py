"""Model construction from config + input assembly.

Mirrors the channel arithmetic of /root/reference/src/train_semantics.py:131-164
and the input routing of /root/reference/src/utils/inputs.py:4-34, but in NHWC.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..utils import config as cfg_util
from .fpn import SemanticFPN
from .salsanext import SalsaNext


def build_model(cfg: dict, num_classes: int | None = None, dtype=jnp.float32):
    ms = cfg["model_settings"]
    n = num_classes if num_classes is not None else cfg["extras"]["num_classes"]
    baseline = ms.get("baseline", "Reichert")
    if baseline == "Reichert":
        in_ch, meta_ch = cfg_util.input_channel_dims(cfg)
        return SemanticFPN(
            num_classes=n,
            backbone=ms.get("model_type", "resnet34"),
            input_channels=in_ch,
            meta_channels=meta_ch,
            attention=bool(ms.get("attention", True)),
            multi_scale_meta=bool(ms.get("multi_scale_meta", True)),
            head_activation=str(ms.get("head_activation", "none")),
            attention_type=str(ms.get("attention_type", "spatial")),
            dtype=dtype,
        )
    if baseline in ("SalsaNext", "SalsaNextAdf"):
        return SalsaNext(num_classes=n, dtype=dtype)
    if baseline == "CENet":
        from .cenet import CENet
        trunk = ms.get("model_type", "HarDNet")
        if trunk not in ("HarDNet", "ResNet_34"):
            trunk = "HarDNet"
        return CENet(num_classes=n, aux=bool(ms.get("aux", True)),
                     model=trunk, dtype=dtype)
    if baseline == "FIDNet":
        from .fidnet import FIDNet
        return FIDNet(num_classes=n, dtype=dtype)
    raise ValueError(f"Unknown baseline: {baseline}")


def model_output_kind(cfg: dict) -> str:
    """'probs' for CENet (softmax in-model, reference CENet_ResNet34.py:174),
    'logits' for everything else."""
    return "probs" if cfg["model_settings"].get("baseline") == "CENet" \
        else "logits"


def set_model_inputs(range_img, reflectivity, xyz, normals, cfg):
    """Assemble the per-baseline input list (NHWC channel concat).

    SalsaNext gets one tensor cat[range, (refl), xyz, (normals)];
    the FPN family gets [cat[range, (refl)], cat[xyz, (normals)]].
    """
    ms = cfg["model_settings"]
    baseline = str(ms.get("baseline", "Reichert")).lower()
    main = [range_img]
    if ms.get("reflectivity", 0):
        main.append(reflectivity)
    if baseline in ("salsanext", "salsanextadf"):
        main.append(xyz)
        if ms.get("normals", 0):
            main.append(normals)
        return [jnp.concatenate(main, axis=-1)]
    if baseline == "reichert":
        meta = jnp.concatenate([xyz, normals], axis=-1) if ms.get("normals", 0) else xyz
        return [jnp.concatenate(main, axis=-1), meta]
    if baseline in ("cenet", "fidnet"):
        # reference baseline trainers feed cat[range, reflectivity, xyz]
        # (CENet trainer.py:91); normals optional
        main.append(xyz)
        if ms.get("normals", 0):
            main.append(normals)
        return [jnp.concatenate(main, axis=-1)]
    raise ValueError(f"Unknown baseline: {ms.get('baseline')}")


def count_parameters(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
