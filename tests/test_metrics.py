"""Metric parity: binned on-device stats vs exact host computations."""
import numpy as np

import jax.numpy as jnp

from semanticlidarunc_tpu.metrics import aurc as aurc_m
from semanticlidarunc_tpu.metrics import auroc as auroc_m
from semanticlidarunc_tpu.metrics import ece as ece_m
from semanticlidarunc_tpu.metrics import iou as iou_m


def _preds_labels(rng, n=5000, c=8):
    logits = rng.standard_normal((n, c)).astype(np.float32) * 2
    labels = rng.integers(0, c, size=(n,))
    labels[rng.random(n) < 0.1] = 0
    return logits, labels


def test_confusion_matrix_matches_bincount(rng):
    c = 6
    preds = rng.integers(0, c, 1000)
    targets = rng.integers(-1, c + 1, 1000)  # includes out-of-range
    cm = np.asarray(iou_m.confusion_matrix(jnp.asarray(preds),
                                           jnp.asarray(targets), c))
    ok = (targets >= 0) & (targets < c)
    want = np.bincount(targets[ok] * c + preds[ok],
                       minlength=c * c).reshape(c, c)
    np.testing.assert_array_equal(cm, want)


def test_iou_evaluator_semantics(rng):
    ev = iou_m.IoUEvaluator(4)
    preds = np.array([0, 1, 1, 2, 2, 3])
    targets = np.array([0, 1, 2, 2, 2, 3])
    ev.update(jnp.asarray(preds), jnp.asarray(targets))
    miou, out = ev.compute(test_mask=[0, 1, 1, 1], ignore_gt=[0])
    # class1: TP=1 FP=1 FN=0 -> 0.5; class2: TP=2 FP=0 FN=1 -> 2/3; class3: 1.0
    assert abs(miou - np.mean([0.5, 2 / 3, 1.0])) < 1e-9


def test_ece_binned_equals_exact():
    # own RNG: the shared session fixture makes the data (and the marginal
    # fp tolerance on MCE) depend on test execution order
    logits, labels = _preds_labels(np.random.default_rng(42))
    n_bins = 15
    agg = ece_m.ECEAggregator(n_bins=n_bins, mode="logits", ignore_index=0)
    agg.update(jnp.asarray(logits), jnp.asarray(labels))
    (ece, mce), _ = agg.compute()

    # exact host reference: histogram over all pixels, reference weighting
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    conf = probs.max(-1)
    pred = probs.argmax(-1)
    valid = labels != 0
    conf, corr = conf[valid], (pred == labels)[valid].astype(np.float64)
    edges = np.linspace(0, 1, n_bins + 1)
    n = np.histogram(conf, bins=edges)[0].astype(float)
    acc_s = np.histogram(conf, bins=edges, weights=corr)[0]
    conf_s = np.histogram(conf, bins=edges, weights=conf)[0]
    acc = np.divide(acc_s, n, out=np.zeros_like(acc_s), where=n > 0)
    avg_conf = np.divide(conf_s, n, out=np.zeros_like(conf_s), where=n > 0)
    gap = np.abs(acc - avg_conf)
    want_ece = float(np.sum((n / max(1, n.sum())) * gap))
    want_mce = float(gap[n > 0].max())
    assert abs(ece - want_ece) < 1e-5
    assert abs(mce - want_mce) < 1e-5


def test_auroc_binned_close_to_exact(rng):
    logits, labels = _preds_labels(rng)
    agg = auroc_m.AUROCAggregator(mode="logits", score="entropy_norm",
                                  ignore_index=0)
    agg.update(jnp.asarray(logits), jnp.asarray(labels))
    auroc, _ = agg.compute()

    # exact: sort + trapezoid (reference auroc.py:65-78)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    ent = -(probs * np.log(probs + 1e-12)).sum(-1) / np.log(logits.shape[-1])
    pred = probs.argmax(-1)
    valid = labels != 0
    scores = ent[valid]
    is_err = (pred != labels)[valid].astype(np.float64)
    order = np.argsort(-scores)
    y = is_err[order]
    p, n = y.sum(), y.size - y.sum()
    tpr = np.concatenate([[0.0], np.cumsum(y) / p, [1.0]])
    fpr = np.concatenate([[0.0], np.cumsum(1 - y) / n, [1.0]])
    want = float(np.trapezoid(tpr, fpr))
    assert abs(auroc - want) < 2e-3


def test_aurc_binned_close_to_exact(rng):
    logits, labels = _preds_labels(rng)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    conf = probs.max(-1)
    pred = probs.argmax(-1)

    agg = aurc_m.AURCAggregator(ignore_index=0)
    agg.update(jnp.asarray(conf), jnp.asarray(pred), jnp.asarray(labels))
    out = agg.compute()

    # exact reference computation (aurc.py:7-45)
    valid = labels != 0
    risks = (pred != labels)[valid].astype(np.float64)
    confids = conf[valid].astype(np.float64)
    nn = risks.size
    idx = np.argsort(confids)
    coverage, err_sum = nn, risks[idx].sum()
    coverages, sel_risks, weights = [coverage / nn], [err_sum / nn], []
    tmp_w = 0
    for i in range(nn - 1):
        coverage -= 1
        err_sum -= risks[idx[i]]
        tmp_w += 1
        if i == 0 or confids[idx[i]] != confids[idx[i - 1]]:
            coverages.append(coverage / nn)
            sel_risks.append(err_sum / (nn - 1 - i))
            weights.append(tmp_w / nn)
            tmp_w = 0
    if tmp_w > 0:
        coverages.append(0.0)
        sel_risks.append(sel_risks[-1])
        weights.append(tmp_w / nn)
    sel_risks = np.array(sel_risks)
    weights = np.array(weights)
    want_aurc = float(np.sum((sel_risks[:-1] + sel_risks[1:]) * 0.5 * weights))
    opt = np.cumsum(np.sort(risks)) / np.arange(1, nn + 1)
    want_eaurc = want_aurc - float(opt.sum() / nn)

    assert abs(out["AURC"] - want_aurc) < 2e-3
    assert abs(out["EAURC"] - want_eaurc) < 2e-3
    assert out["num_pixels"] == int(valid.sum())


def test_auroc_mi_score_runs(rng):
    alpha = np.abs(rng.standard_normal((100, 6))).astype(np.float32) + 1.0
    labels = rng.integers(0, 6, 100)
    agg = auroc_m.AUROCAggregator(mode="alpha", score="mi_norm", ignore_index=0)
    agg.update(jnp.asarray(alpha), jnp.asarray(labels))
    auroc, _ = agg.compute()
    assert np.isfinite(auroc)


def test_rc_and_entropy_plots(tmp_path, rng):
    from semanticlidarunc_tpu.metrics.aurc import plot_rc_curves
    from semanticlidarunc_tpu.prob.dirichlet import (entropy_error_iou,
                                                     plot_entropy_error_iou)
    import os

    logits, labels = _preds_labels(rng)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    agg = aurc_m.AURCAggregator(ignore_index=0)
    agg.update(jnp.asarray(probs.max(-1)), jnp.asarray(probs.argmax(-1)),
               jnp.asarray(labels))
    stats = agg.compute()
    p1 = str(tmp_path / "rc.png")
    plot_rc_curves(stats, save_path=p1)
    assert os.path.exists(p1)

    ent = -(probs * np.log(probs + 1e-12)).sum(-1) / np.log(logits.shape[-1])
    err = (probs.argmax(-1) != labels).astype(np.float32)
    taus = np.linspace(0, 1, 11)
    ious = entropy_error_iou(jnp.asarray(ent), jnp.asarray(err),
                             jnp.asarray(taus))
    p2 = str(tmp_path / "ee.png")
    plot_entropy_error_iou(np.asarray(ious), taus, save_path=p2)
    assert os.path.exists(p2)
