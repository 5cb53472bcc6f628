"""Standard segmentation losses (CE, Tversky) and output-kind handling.

Functional ports of /root/reference/src/models/losses.py:50-128, taking NHWC
logits/probs and integer label maps. All losses are pure functions suitable
for `jax.grad` and return scalars averaged over valid pixels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def to_probs(outputs: jnp.ndarray, model_act: str = "logits") -> jnp.ndarray:
    """Convert model outputs to probabilities along the last axis."""
    if model_act == "logits":
        return jax.nn.softmax(outputs, axis=-1)
    if model_act == "probs":
        return outputs
    if model_act == "log_probs":
        return jnp.exp(outputs)
    raise ValueError(f"Unknown model_act: {model_act}")


def to_log_probs(outputs: jnp.ndarray, model_act: str = "logits",
                 eps: float = 1e-8) -> jnp.ndarray:
    if model_act == "logits":
        return jax.nn.log_softmax(outputs, axis=-1)
    if model_act == "probs":
        return jnp.log(jnp.clip(outputs, eps))
    if model_act == "log_probs":
        return outputs
    raise ValueError(f"Unknown model_act: {model_act}")


def valid_mask(labels: jnp.ndarray, ignore_index: int | None,
               num_classes: int | None = None) -> jnp.ndarray:
    """Boolean mask of pixels that contribute to a loss.

    Out-of-range labels are treated as ignored, matching the reference's
    remap-to-ignore_index behavior (src/models/losses.py:59-62).
    """
    ok = jnp.ones(labels.shape, bool)
    if num_classes is not None:
        ok &= (labels >= 0) & (labels < num_classes)
    if ignore_index is not None:
        ok &= labels != ignore_index
    return ok


def _masked_mean(per_pixel: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    w = mask.astype(per_pixel.dtype)
    return jnp.sum(per_pixel * w) / jnp.clip(jnp.sum(w), 1.0)


def cross_entropy(outputs: jnp.ndarray, labels: jnp.ndarray,
                  ignore_index: int | None = 0,
                  model_act: str = "logits") -> jnp.ndarray:
    """Masked softmax cross-entropy. outputs [..., C], labels [...] int."""
    c = outputs.shape[-1]
    mask = valid_mask(labels, ignore_index, num_classes=c)
    logp = to_log_probs(outputs, model_act)
    safe = jnp.where(mask, labels, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return _masked_mean(nll, mask)


def tversky(outputs: jnp.ndarray, labels: jnp.ndarray, *,
            alpha: float = 0.9, beta: float = 0.1, smooth: float = 1.0,
            ignore_index: int | None = 0,
            model_act: str = "logits") -> jnp.ndarray:
    """Tversky loss with the reference's alpha=0.9/beta=0.1/smooth=1 defaults
    (src/models/losses.py:76-128): per-class TP/FP/FN over all valid pixels."""
    c = outputs.shape[-1]
    probs = to_probs(outputs, model_act)
    mask = valid_mask(labels, ignore_index, num_classes=c)
    safe = jnp.where(mask, labels, 0)
    one_hot = jax.nn.one_hot(safe, c, dtype=probs.dtype) * mask[..., None]
    probs = probs * mask[..., None]
    axes = tuple(range(probs.ndim - 1))
    tp = jnp.sum(probs * one_hot, axis=axes)
    fp = jnp.sum((1.0 - one_hot) * probs, axis=axes)
    fn = jnp.sum(one_hot * (1.0 - probs), axis=axes)
    t = (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)
    return jnp.mean(1.0 - t)


def effective_number_class_weights(class_counts, beta: float = 0.999,
                                   normalize: bool = True):
    """Class-balanced weights via the effective number of samples
    (Cui et al. 2019; the reference's class-weight builder inside the legacy
    DirichletCriterion, src/models/losses.py:605-681):
        w_c = (1 - beta) / (1 - beta^n_c), zero-count classes get weight 0.
    """
    import numpy as np

    counts = np.asarray(class_counts, np.float64)
    eff = 1.0 - np.power(beta, counts)
    w = np.where(counts > 0, (1.0 - beta) / np.maximum(eff, 1e-12), 0.0)
    if normalize and w.sum() > 0:
        w = w * (np.count_nonzero(counts) / w.sum())
    return w


def weighted_cross_entropy(outputs: jnp.ndarray, labels: jnp.ndarray,
                           class_weights: jnp.ndarray,
                           ignore_index: int | None = 0,
                           model_act: str = "logits") -> jnp.ndarray:
    """CE with per-class weights (weighted mean over valid pixels)."""
    c = outputs.shape[-1]
    mask = valid_mask(labels, ignore_index, num_classes=c)
    logp = to_log_probs(outputs, model_act)
    safe = jnp.where(mask, labels, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    w = jnp.asarray(class_weights)[safe] * mask.astype(nll.dtype)
    return jnp.sum(nll * w) / jnp.clip(jnp.sum(w), 1e-8)


def classify_output_kind(outputs, sample_fraction: float = 0.1,
                         rng=None) -> str:
    """Heuristic 'logits' | 'probs' | 'log_probs' detection on host
    (reference: src/models/losses.py:8-47). Host-side helper — call on
    concrete arrays, outside jit."""
    import numpy as np

    x = np.asarray(outputs)
    x = x.reshape(-1, x.shape[-1])
    if sample_fraction and sample_fraction < 1.0 and x.shape[0] > 16:
        k = max(1, int(x.shape[0] * sample_fraction))
        gen = np.random.default_rng(0) if rng is None else rng
        x = x[gen.choice(x.shape[0], size=k, replace=False)]
    sums = x.sum(axis=-1)
    in_range = (x.min() >= -1e-6) and (x.max() <= 1 + 1e-6)
    if in_range and np.allclose(sums, 1.0, atol=1e-3, rtol=1e-3):
        return "probs"
    if x.max() <= 1e-6 and np.allclose(np.exp(x).sum(axis=-1), 1.0,
                                       atol=1e-3, rtol=1e-3):
        return "log_probs"
    return "logits"
