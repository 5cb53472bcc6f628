"""Confusion-matrix mIoU evaluator with on-device accumulation.

Semantics match /root/reference/src/models/evaluator.py:29-105 (rows = GT,
cols = pred; ignored GT rows zeroed at compute time; NaN-masked averaging),
but the per-batch update is a jitted scatter-add that can be `psum`-reduced
across a device mesh before ever reaching the host.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrix(preds: jnp.ndarray, targets: jnp.ndarray,
                     num_classes: int) -> jnp.ndarray:
    """[C, C] int32 confusion matrix over all in-range pixels."""
    c = num_classes
    preds = preds.reshape(-1)
    targets = targets.reshape(-1)
    ok = (targets >= 0) & (targets < c) & (preds >= 0) & (preds < c)
    idx = jnp.where(ok, targets * c + preds, c * c)
    cm = jnp.zeros((c * c + 1,), jnp.int32).at[idx].add(1)
    return cm[:c * c].reshape(c, c)


def iou_from_confmat(cm: np.ndarray, test_mask=None, ignore_gt=None,
                     reduce: str = "mean", ignore_th: float | None = None):
    """Per-class IoU + masked mIoU from a confusion matrix (host-side)."""
    cm = np.asarray(cm, np.float64).copy()
    c = cm.shape[0]
    if ignore_gt:
        rows = [g for g in ignore_gt if 0 <= g < c]
        cm[rows, :] = 0.0
    tp = np.diag(cm)
    fp = cm.sum(0) - tp
    fn = cm.sum(1) - tp
    denom = tp + fp + fn
    iou = np.full(c, np.nan)
    iou[denom > 0] = tp[denom > 0] / denom[denom > 0]

    mask = np.ones(c, bool) if test_mask is None else np.asarray(test_mask, bool)
    avg = mask & np.isfinite(iou)
    if ignore_th is not None:
        avg &= iou >= ignore_th
    if avg.any():
        vals = iou[avg]
        miou = float(np.mean(vals) if reduce == "mean" else np.median(vals))
    else:
        miou = float("nan")
    return miou, iou


class IoUEvaluator:
    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.reset()

    def reset(self):
        self.confmat = np.zeros((self.num_classes, self.num_classes), np.int64)

    def update(self, preds, targets):
        self.confmat += np.asarray(
            confusion_matrix(preds, targets, self.num_classes), np.int64)

    def update_confmat(self, cm):
        """Merge a precomputed (possibly psum-reduced) device confmat."""
        self.confmat += np.asarray(cm, np.int64)

    def compute(self, class_names=None, test_mask=None, ignore_gt=None,
                reduce: str = "mean", ignore_th: float | None = None):
        miou, iou = iou_from_confmat(self.confmat, test_mask, ignore_gt,
                                     reduce, ignore_th)
        out = {}
        if class_names is not None:
            for k in range(self.num_classes):
                name = class_names[k] if k in class_names or isinstance(
                    class_names, (list, tuple)) else class_names[str(k)]
                out[name] = float(iou[k]) if np.isfinite(iou[k]) else float("nan")
        out["mIoU"] = miou
        return miou, out
