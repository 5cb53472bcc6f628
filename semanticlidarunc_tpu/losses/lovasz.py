"""Lovász-Softmax loss as a fixed-shape masked XLA computation.

The reference (canonical) implementation gathers valid pixels with boolean
indexing and loops over *present* classes with a per-class dynamic sort
(/root/reference/src/losses/lovasz.py:55-88) — dynamic shapes that XLA cannot
compile. This version keeps static shapes:

- invalid pixels get error 0 and fg 0; since sorted zero-error entries
  multiply the Jaccard-gradient tail by zero and prefix cumsums are unaffected,
  the loss value and gradients are EXACT, not approximate (verified against a
  literal port of the reference in tests/test_losses.py);
- all C classes are sorted in one batched descending sort ([C, P] on the MXU-
  friendly layout), and absent classes are masked out of the final mean,
  reproducing `classes='present'` semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .segmentation import to_probs, valid_mask


def lovasz_softmax(outputs: jnp.ndarray, labels: jnp.ndarray,
                   ignore_index: int | None = 0,
                   model_act: str = "logits") -> jnp.ndarray:
    """outputs [..., C] (kind per model_act), labels [...] int -> scalar."""
    c = outputs.shape[-1]
    probs = to_probs(outputs, model_act)
    probs = probs.reshape(-1, c).astype(jnp.float32)          # [P, C]
    labels = labels.reshape(-1)
    mask = valid_mask(labels, ignore_index)                   # [P]

    fg = (labels[:, None] == jnp.arange(c)[None, :]) & mask[:, None]  # [P, C]
    fg_f = fg.astype(jnp.float32)
    errors = jnp.abs(fg_f - probs) * mask[:, None].astype(jnp.float32)

    errors_t = errors.T                                       # [C, P]
    fg_t = fg_f.T
    perm = jnp.argsort(-errors_t, axis=1)
    errors_sorted = jnp.take_along_axis(errors_t, perm, axis=1)
    fg_sorted = jnp.take_along_axis(fg_t, perm, axis=1)

    gts = jnp.sum(fg_sorted, axis=1, keepdims=True)           # [C, 1]
    intersection = gts - jnp.cumsum(fg_sorted, axis=1)
    union = gts + jnp.cumsum(1.0 - fg_sorted, axis=1)
    jaccard = 1.0 - intersection / union
    grad = jnp.concatenate(
        [jaccard[:, :1], jaccard[:, 1:] - jaccard[:, :-1]], axis=1)
    per_class = jnp.sum(errors_sorted * jax.lax.stop_gradient(grad), axis=1)

    present = gts[:, 0] > 0
    n_present = jnp.clip(jnp.sum(present.astype(jnp.float32)), 1.0)
    return jnp.sum(jnp.where(present, per_class, 0.0)) / n_present
