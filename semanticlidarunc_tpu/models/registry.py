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
            dtype=dtype,
        )
    if baseline in ("SalsaNext", "SalsaNextAdf"):
        return SalsaNext(num_classes=n, dtype=dtype)
    raise ValueError(f"Unknown baseline: {baseline}")


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
    raise ValueError(f"Unknown baseline: {ms.get('baseline')}")


def count_parameters(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
