"""End-to-end metric parity: our Tester pipeline vs the reference math.

The driver target is mIoU/ECE parity +-0.5 pt (BASELINE.json). Round-1 tests
proved FORWARD parity (<5e-3 logits) of converted checkpoints; this harness
closes the loop at the METRIC level:

  torch oracle model (reference topology, reference-named state_dict)
    -> logits over a fixed set of synthetic scans
    -> reference metric math, re-implemented exactly (no reservoir cap):
         IoUEvaluator confmat semantics  (/root/reference/src/models/evaluator.py:29-105)
         ECE uniform 15-bin              (/root/reference/src/metrics/ece.py:55-170)
         AUROC exact sort+trapz ROC      (/root/reference/src/metrics/auroc.py:65-78)

  same scans + converted weights -> our Trainer.test_one_epoch
    (jitted eval step, on-device histogram sufficient statistics)

and asserts mIoU / ECE / AUROC agreement well inside +-0.5 pt.
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_torch_parity import TorchReichertOracle  # noqa: E402

N_CLASSES = 20
H, W = 32, 64
N_SCANS = 4
IGNORE = 0


def _scan_batches(seed=0):
    r = np.random.default_rng(seed)
    batches = []
    for _ in range(N_SCANS):
        batches.append({
            "range": r.random((1, H, W, 1), np.float32) * 50,
            "reflectivity": r.random((1, H, W, 1), np.float32),
            "xyz": r.standard_normal((1, H, W, 3)).astype(np.float32) * 10,
            "normals": r.standard_normal((1, H, W, 3)).astype(np.float32),
            "labels": r.integers(0, N_CLASSES, (1, H, W)),
        })
    return batches


# ---------------- reference metric math (exact oracle) ----------------

def _ref_miou(preds, labels, test_mask):
    """evaluator.py:29-105 — bincount confmat, zero ignore-GT row, masked
    mean of finite per-class IoUs."""
    c = N_CLASSES
    idx = labels.reshape(-1) * c + preds.reshape(-1)
    cm = np.bincount(idx, minlength=c * c).reshape(c, c).astype(np.float64)
    cm[IGNORE, :] = 0.0
    tp = np.diag(cm)
    fp = cm.sum(0) - tp
    fn = cm.sum(1) - tp
    denom = tp + fp + fn
    iou = np.full(c, np.nan)
    iou[denom > 0] = tp[denom > 0] / denom[denom > 0]
    avg = np.asarray(test_mask, bool) & np.isfinite(iou)
    return float(np.mean(iou[avg]))


def _ref_ece(probs, labels, n_bins=15):
    """ece.py:55-170 — top-label conf/correct over valid pixels, uniform
    bins, weighted |acc - conf|."""
    conf = probs.max(axis=-1).reshape(-1)
    pred = probs.argmax(axis=-1).reshape(-1)
    lab = labels.reshape(-1)
    valid = lab != IGNORE
    conf, corr = conf[valid], (pred[valid] == lab[valid]).astype(np.float64)
    edges = np.linspace(0.0, 1.0, n_bins + 1)
    n = np.histogram(conf, bins=edges)[0].astype(np.float64)
    acc_s = np.histogram(conf, bins=edges, weights=corr)[0]
    conf_s = np.histogram(conf, bins=edges, weights=conf)[0]
    acc = np.divide(acc_s, n, out=np.zeros_like(acc_s), where=n > 0)
    avg_c = np.divide(conf_s, n, out=np.zeros_like(conf_s), where=n > 0)
    gap = np.abs(acc - avg_c)
    return float(np.sum(n / max(1, n.sum()) * gap))


def _ref_auroc(probs, labels):
    """auroc.py:30-110 — entropy_norm score, error = (pred != label), exact
    descending-score ROC via cumsum + trapz."""
    eps = 1e-12
    p = np.clip(probs, eps, None)
    h = -(p * np.log(p)).sum(axis=-1) / math.log(N_CLASSES)
    pred = probs.argmax(axis=-1)
    lab = labels
    valid = lab != IGNORE
    scores = h[valid].reshape(-1)
    is_err = (pred[valid] != lab[valid]).reshape(-1).astype(np.float64)
    order = np.argsort(-scores)
    y = is_err[order]
    pos, neg = y.sum(), y.size - y.sum()
    tpr = np.concatenate(([0.0], np.cumsum(y) / pos, [1.0]))
    fpr = np.concatenate(([0.0], np.cumsum(1.0 - y) / neg, [1.0]))
    return float(np.trapezoid(tpr, fpr))


# ---------------- the parity test ----------------

def test_metric_parity_vs_reference_math():
    import jax
    import jax.numpy as jnp

    from semanticlidarunc_tpu.models.fpn import SemanticFPN
    from semanticlidarunc_tpu.train.trainer import Trainer
    from semanticlidarunc_tpu.utils import config as cfg_util
    from semanticlidarunc_tpu.utils.torch_convert import (
        apply_converted, convert_reichert_state_dict)

    torch.manual_seed(0)
    oracle = TorchReichertOracle(num_classes=N_CLASSES)
    oracle.eval()
    for mod in oracle.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.5)
            mod.running_var.uniform_(0.5, 2.0)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    batches = _scan_batches()
    test_mask = [0] + [1] * (N_CLASSES - 1)

    # ---- reference side: torch forward + exact reference metric math ----
    all_probs, all_labels = [], []
    with torch.no_grad():
        for b in batches:
            x = np.concatenate([b["range"], b["reflectivity"]], -1)
            meta = np.concatenate([b["xyz"], b["normals"]], -1)
            logits = oracle(
                torch.from_numpy(x.transpose(0, 3, 1, 2)),
                torch.from_numpy(meta.transpose(0, 3, 1, 2)),
            ).permute(0, 2, 3, 1).numpy()
            all_probs.append(torch.softmax(
                torch.from_numpy(logits), dim=-1).numpy())
            all_labels.append(np.asarray(b["labels"]))
    probs = np.concatenate(all_probs)
    labels = np.concatenate(all_labels)
    ref = {
        "mIoU": _ref_miou(probs.argmax(-1), labels, test_mask),
        "ECE": _ref_ece(probs, labels),
        "AUROC": _ref_auroc(probs, labels),
    }

    # ---- our side: converted weights through the production eval loop ----
    cfg = cfg_util.with_extras({
        "dataset_name": "SemanticKitti",
        "model_settings": {"baseline": "Reichert", "model_type": "resnet18",
                           "loss_function": "CE", "attention": True,
                           "multi_scale_meta": True, "normals": True,
                           "reflectivity": True, "projection": [H, W]},
        "train_params": {"learning_rate": 1e-3, "batch_size": 1,
                         "num_epochs": 1, "num_warmup_epochs": 0},
    })
    cfg["extras"]["test_mask"] = test_mask
    model = SemanticFPN(num_classes=N_CLASSES, backbone="resnet18",
                        input_channels=2, meta_channels=6)
    tr = Trainer(model, cfg)
    state = tr.create_state(batches[0], num_epochs=1, steps_per_epoch=1)
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    converted = convert_reichert_state_dict(sd, "resnet18", N_CLASSES)
    variables, missing = apply_converted(variables, converted)
    assert not missing
    state = state.replace(params=variables["params"],
                          batch_stats=variables.get("batch_stats"))

    stats = tr.test_one_epoch(state, batches)

    # driver target is +-0.5 pt; assert well inside it
    assert abs(stats["mIoU"] - ref["mIoU"]) < 0.005, (stats["mIoU"], ref)
    assert abs(stats["ECE"] - ref["ECE"]) < 0.005, (stats["ECE"], ref)
    assert abs(stats["AUROC"] - ref["AUROC"]) < 0.005, (stats["AUROC"], ref)
