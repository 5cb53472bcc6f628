"""Loss parity tests against literal numpy/torch oracles of the reference."""
import numpy as np
import pytest

import jax.numpy as jnp

from semanticlidarunc_tpu.losses import lovasz as lv
from semanticlidarunc_tpu.losses import segmentation as seg


def _rand_problem(rng, b=2, h=8, w=12, c=5, ignore_frac=0.2):
    logits = rng.standard_normal((b, h, w, c)).astype(np.float32)
    labels = rng.integers(0, c, size=(b, h, w))
    labels[rng.random((b, h, w)) < ignore_frac] = 0  # ignore_index=0
    return logits, labels


def _lovasz_oracle(probs, labels, ignore=0):
    """Literal numpy port of the reference algorithm
    (/root/reference/src/losses/lovasz.py:25-88)."""
    c = probs.shape[-1]
    probs = probs.reshape(-1, c)
    labels = labels.reshape(-1)
    valid = labels != ignore
    probs, labels = probs[valid], labels[valid]
    losses = []
    for cl in range(c):
        fg = (labels == cl).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - probs[:, cl])
        perm = np.argsort(-errors, kind="stable")
        errors_sorted = errors[perm]
        fg_sorted = fg[perm]
        gts = fg_sorted.sum()
        inter = gts - np.cumsum(fg_sorted)
        union = gts + np.cumsum(1 - fg_sorted)
        jacc = 1.0 - inter / union
        jacc[1:] = jacc[1:] - jacc[:-1]
        losses.append(float(np.dot(errors_sorted, jacc)))
    return float(np.mean(losses)) if losses else 0.0


def test_lovasz_matches_oracle(rng):
    logits, labels = _rand_problem(rng)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    got = float(lv.lovasz_softmax(jnp.asarray(logits), jnp.asarray(labels),
                                  ignore_index=0, model_act="logits"))
    want = _lovasz_oracle(probs.astype(np.float64), labels)
    assert abs(got - want) < 1e-4


def test_lovasz_absent_class_excluded(rng):
    # only classes {1, 2} present -> mean over those two
    logits = rng.standard_normal((1, 4, 4, 6)).astype(np.float32)
    labels = np.ones((1, 4, 4), np.int64)
    labels[0, :2] = 2
    got = float(lv.lovasz_softmax(jnp.asarray(logits), jnp.asarray(labels),
                                  ignore_index=0))
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    want = _lovasz_oracle(probs.astype(np.float64), labels)
    assert abs(got - want) < 1e-4


def test_lovasz_gradient_finite(rng):
    import jax
    logits, labels = _rand_problem(rng, b=1, h=6, w=6, c=4)
    g = jax.grad(lambda lo: lv.lovasz_softmax(lo, jnp.asarray(labels),
                                              ignore_index=0))(jnp.asarray(logits))
    assert np.isfinite(np.asarray(g)).all()
    # ignored pixels receive zero gradient
    ig = np.asarray(g)[np.asarray(labels) == 0]
    np.testing.assert_allclose(ig, 0.0, atol=1e-7)


def test_cross_entropy_matches_torch(rng):
    torch = pytest.importorskip("torch")
    logits, labels = _rand_problem(rng)
    got = float(seg.cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                  ignore_index=0))
    t = torch.nn.CrossEntropyLoss(ignore_index=0)(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels))
    assert abs(got - float(t)) < 1e-5


def test_tversky_matches_reference_formula(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    logits, labels = _rand_problem(rng)
    got = float(seg.tversky(jnp.asarray(logits), jnp.asarray(labels),
                            ignore_index=0))

    # literal reference computation (src/models/losses.py:85-128)
    probs = torch.softmax(torch.from_numpy(logits).permute(0, 3, 1, 2), dim=1)
    lab = torch.from_numpy(labels).long()
    c = logits.shape[-1]
    valid = (lab >= 0) & (lab < c) & (lab != 0)
    safe = torch.where(valid, lab, torch.zeros_like(lab))
    one_hot = F.one_hot(safe, c).permute(0, 3, 1, 2).float()
    vm = valid.unsqueeze(1).float()
    probs = probs * vm
    one_hot = one_hot * vm
    dims = (0, 2, 3)
    tp = (probs * one_hot).sum(dims)
    fp = ((1 - one_hot) * probs).sum(dims)
    fn = (one_hot * (1 - probs)).sum(dims)
    tv = (tp + 1.0) / (tp + 0.9 * fp + 0.1 * fn + 1.0)
    want = float((1 - tv).mean())
    assert abs(got - want) < 1e-5


def test_classify_output_kind(rng):
    logits = rng.standard_normal((2, 4, 4, 5)).astype(np.float32) * 5
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    assert seg.classify_output_kind(logits) == "logits"
    assert seg.classify_output_kind(probs) == "probs"
    assert seg.classify_output_kind(np.log(probs + 1e-12)) == "log_probs"


def test_effective_number_class_weights():
    w = seg.effective_number_class_weights([0, 10, 1000, 100000], beta=0.999)
    assert w[0] == 0.0
    # rarer classes get larger weights
    assert w[1] > w[2] > w[3] > 0


def test_weighted_cross_entropy(rng):
    logits, labels = _rand_problem(rng)
    cw = np.ones(logits.shape[-1], np.float32)
    got = float(seg.weighted_cross_entropy(jnp.asarray(logits),
                                           jnp.asarray(labels),
                                           jnp.asarray(cw), ignore_index=0))
    want = float(seg.cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                   ignore_index=0))
    assert abs(got - want) < 1e-5
