"""YAML config loading + derived "extras", schema-compatible with the reference.

The reference drives everything off a raw YAML dict mutated at startup
(/root/reference/src/train_semantics.py:29-59, 273-317). We keep the exact YAML
surface (`dataset_dir`, `dataset_name`, `model_settings`, `model_weights`,
`train_params`, `logging_settings`) so reference configs work verbatim, but
centralize the derivation logic here instead of scattering it through the CLI.
"""
from __future__ import annotations

import copy
import os
import sys
from typing import Any

import yaml

from ..dataset import definitions


REQUIRED_TOP_KEYS = ("dataset_name", "model_settings", "train_params")

KNOWN_DATASETS = (
    "SemanticKitti", "SemanticSTF", "SemanticTHAB", "Panoptic-CUDAL", "SemanticWADS",
)


def load_config(path: str) -> dict:
    """Load a YAML config file; raises with a clear message on error."""
    try:
        with open(path, "r") as f:
            cfg = yaml.safe_load(f)
    except FileNotFoundError:
        raise FileNotFoundError(f"config file not found: {path}")
    if not isinstance(cfg, dict):
        raise ValueError(f"invalid config format in {path}: expected dict, "
                         f"got {type(cfg).__name__}")
    for k in REQUIRED_TOP_KEYS:
        if k not in cfg:
            raise KeyError(f"config {path} missing required key: {k}")
    return cfg


def num_classes_for(cfg: dict) -> int:
    """Class-count rule (reference: src/train_semantics.py:54-57).

    20 classes by default; +1 ("snow"/adverse) for STF/WADS unless remapped;
    +1 extra Dirichlet "unknown" class when the Dirichlet loss is active.
    """
    name = cfg["dataset_name"]
    n = 21 if name in ("SemanticSTF", "SemanticWADS") and not cfg.get("remap_adverse_label", 0) else 20
    if cfg["model_settings"].get("loss_function") == "Dirichlet":
        n += 1
    return n


def test_mask_for(cfg: dict, num_classes: int) -> list[bool]:
    """Per-dataset mIoU averaging mask (reference: src/train_semantics.py:273-317)."""
    mask = [False] + [True] * (num_classes - 1)
    name = cfg["dataset_name"]
    if name == "SemanticTHAB":
        for c in (7, 8):  # bicyclist / motorcyclist absent in THAB test split
            mask[c] = False
    elif name == "SemanticWADS":
        for c in (2, 3, 5, 6, 7, 8, 11, 12, 14, 17):
            if c < num_classes:
                mask[c] = False
        if num_classes > 20:
            mask[20] = True  # snow
    # The Dirichlet "unknown" class never appears in GT; exclude from average.
    if cfg["model_settings"].get("loss_function") == "Dirichlet":
        mask[num_classes - 1] = False
    return mask


def with_extras(cfg: dict) -> dict:
    """Return a deep-copied cfg with the derived "extras" section filled in."""
    cfg = copy.deepcopy(cfg)
    ms = cfg["model_settings"]
    ms.setdefault("baseline", "Reichert")
    ms.setdefault("projection", [64, 512])
    ms.setdefault("resize", False)

    n = num_classes_for(cfg)
    extras: dict[str, Any] = {
        "use_reflectivity": True,
        "num_classes": n,
        "class_names": dict(definitions.CLASS_NAMES),
        "class_colors": dict(definitions.COLOR_MAP),
        "test_mask": test_mask_for(cfg, n),
    }
    cfg["extras"] = extras
    return cfg


def input_channel_dims(cfg: dict) -> tuple[int, int]:
    """(input_channels, meta_channel_dim) for the FPN model family.

    Range is always present (1ch main); xyz always present (3ch meta);
    reflectivity adds +1 main, normals +3 meta
    (reference: src/train_semantics.py:136-141).
    """
    ms = cfg["model_settings"]
    input_channels = 1 + (1 if ms.get("reflectivity", 0) else 0)
    meta_channels = 3 + (3 if ms.get("normals", 0) else 0)
    return input_channels, meta_channels


def salsanext_channels(cfg: dict) -> int:
    """Single-tensor input width for SalsaNext-style nets
    (reference: src/train_semantics.py:156-161)."""
    ms = cfg["model_settings"]
    n = 4
    if ms.get("normals", 0):
        n += 3
    if ms.get("reflectivity", 0):
        n += 1
    return n


def loss_weights(cfg: dict, loss_name: str, defaults: dict[str, float]) -> dict[str, float]:
    """Resolve loss weights: defaults -> model_weights.default -> model_weights[loss]
    (reference: src/models/trainer.py:283-299)."""
    w = dict(defaults)
    mw = cfg.get("model_weights") or {}

    def apply(section):
        if not isinstance(section, dict):
            return
        for k, v in section.items():
            if k in w:
                try:
                    w[k] = max(0.0, float(v))
                except (TypeError, ValueError):
                    pass

    apply(mw.get("default"))
    apply(mw.get(loss_name))
    return w


def run_dir_name(cfg: dict, timestamp: str) -> str:
    """Run directory naming `{log_dir}/{baseline}/{loss}{n}{r}{a}{m}{p}/{ts}`
    (reference: src/train_semantics.py:216-233)."""
    ms = cfg["model_settings"]
    log_dir = cfg.get("logging_settings", {}).get("log_dir", "runs")
    is_fpn = ms.get("baseline") == "Reichert"
    tag = "{}_{}{}{}{}{}".format(
        ms.get("loss_function", "CE"),
        "n" if ms.get("normals") else "",
        "r" if ms.get("reflectivity") else "",
        "a" if (ms.get("attention") and is_fpn) else "",
        "m" if (ms.get("multi_scale_meta") and is_fpn) else "",
        "p" if ms.get("pretrained") else "",
    )
    return os.path.join(log_dir, str(ms.get("baseline", "Reichert")), tag, timestamp)


def save_config(cfg: dict, path: str) -> None:
    cfg = {k: v for k, v in cfg.items()}
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, default_flow_style=False, sort_keys=False)
