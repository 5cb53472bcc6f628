"""Pixel-level error-detection AUROC via on-device score histograms.

The reference sorts a host-side reservoir of (score, is_error) pairs exactly
(/root/reference/src/metrics/auroc.py:65-78). AUROC is invariant under
monotone score transforms, so we normalize every score family to [0, 1],
accumulate two fixed-size histograms (scores on errors / on correct pixels)
on device, and integrate the ROC from cumulative counts. With the default
4096 bins the quantization error is < 1e-3 AUROC (tested against exact
sorting in tests/test_metrics.py) while memory stays O(bins) regardless of
dataset size, and the histograms psum-reduce across a mesh.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .ece import probs_from


def uncertainty_score(preds: jnp.ndarray, mode: str, score: str,
                      eps: float = 1e-12) -> jnp.ndarray:
    """[..., C] preds -> [...] uncertainty score.

    score in {'entropy','entropy_norm','mi','mi_norm','1-maxprob'}; 'mi' is
    the Dirichlet mutual information (digamma form, reference auroc.py:54-63)
    and requires mode='alpha'.
    """
    c = preds.shape[-1]
    if score in ("entropy", "entropy_norm", "1-maxprob") or mode != "alpha":
        p = probs_from(preds, mode, eps)
        if score == "1-maxprob":
            return 1.0 - jnp.max(p, axis=-1)
        h = -jnp.sum(jnp.clip(p, eps) * jnp.log(jnp.clip(p, eps)), axis=-1)
        return h / math.log(c) if score == "entropy_norm" else h
    alpha = preds
    a0 = alpha.sum(axis=-1, keepdims=True) + eps
    p = alpha / a0
    h = -jnp.sum(jnp.clip(p, eps) * jnp.log(jnp.clip(p, eps)), axis=-1)
    term = jax.scipy.special.digamma(alpha + 1.0) - \
        jax.scipy.special.digamma(a0 + 1.0)
    eh = -jnp.sum(p * term, axis=-1)
    mi = h - eh
    return mi / math.log(c) if score == "mi_norm" else mi


def _normalizer(score: str, num_classes: int) -> float:
    """Monotone rescale so scores land in [0, 1] for histogram binning."""
    if score in ("entropy", "mi"):
        return 1.0 / math.log(num_classes)
    return 1.0


@functools.partial(jax.jit, static_argnames=("n_bins", "ignore_index"))
def roc_histograms(score: jnp.ndarray, pred: jnp.ndarray, labels: jnp.ndarray,
                   *, n_bins: int = 4096, ignore_index: int | None = 0):
    """(hist_on_errors, hist_on_correct) of scores in [0,1] over valid pixels."""
    valid = jnp.ones(labels.shape, bool) if ignore_index is None \
        else labels != ignore_index
    is_err = (pred != labels) & valid
    b = jnp.clip((jnp.clip(score, 0.0, 1.0) * n_bins).astype(jnp.int32),
                 0, n_bins - 1)
    b_err = jnp.where(is_err, b, n_bins).reshape(-1)
    b_ok = jnp.where(valid & ~is_err, b, n_bins).reshape(-1)
    h_err = jnp.zeros((n_bins + 1,), jnp.float32).at[b_err].add(1.0)[:n_bins]
    h_ok = jnp.zeros((n_bins + 1,), jnp.float32).at[b_ok].add(1.0)[:n_bins]
    return h_err, h_ok


def auroc_from_histograms(h_err: np.ndarray, h_ok: np.ndarray):
    """Exact AUROC of the binned score distributions (trapezoid over bins,
    which equals exact sorting up to within-bin ties handled by trapezoids)."""
    h_err = np.asarray(h_err, np.float64)
    h_ok = np.asarray(h_ok, np.float64)
    p, n = h_err.sum(), h_ok.sum()
    if p == 0 or n == 0:
        return float("nan"), None, None
    # sweep thresholds from high score to low: cumulate from the top bin
    tp = np.cumsum(h_err[::-1])[::-1]      # errors with score >= bin
    fp = np.cumsum(h_ok[::-1])[::-1]
    tpr = np.concatenate([[0.0], tp[::-1] / p])
    fpr = np.concatenate([[0.0], fp[::-1] / n])
    auroc = float(np.trapezoid(tpr, fpr))
    return auroc, fpr, tpr


class AUROCAggregator:
    """Streaming AUROC for error detection. Reference-compatible subset API."""

    def __init__(self, mode: str = "alpha", score: str = "entropy_norm",
                 ignore_index: int | None = None, n_bins: int = 4096,
                 **_ignored):
        assert score in {"entropy", "entropy_norm", "mi", "mi_norm", "1-maxprob"}
        self.mode, self.score = mode, score
        self.ignore_index = ignore_index
        self.n_bins = n_bins
        self.reset()

    def reset(self):
        self.h_err = np.zeros(self.n_bins, np.float64)
        self.h_ok = np.zeros(self.n_bins, np.float64)

    def update(self, preds, labels, score_override=None):
        p = probs_from(jnp.asarray(preds), self.mode)
        pred = jnp.argmax(p, axis=-1)
        if score_override is None:
            s = uncertainty_score(jnp.asarray(preds), self.mode, self.score)
            s = s * _normalizer(self.score, preds.shape[-1])
        else:
            s = jnp.asarray(score_override)
        he, ho = roc_histograms(s, pred, jnp.asarray(labels),
                                n_bins=self.n_bins,
                                ignore_index=self.ignore_index)
        self.update_stats(he, ho)

    def update_stats(self, h_err, h_ok):
        self.h_err += np.asarray(h_err, np.float64)
        self.h_ok += np.asarray(h_ok, np.float64)

    def compute(self, save_plot_path: str | None = None,
                title: str = "ROC: error detection", dpi: int = 200):
        auroc, fpr, tpr = auroc_from_histograms(self.h_err, self.h_ok)
        if fpr is None:
            return auroc, {}
        if save_plot_path is not None:
            import matplotlib.pyplot as plt
            fig = self._make_fig(auroc, fpr, tpr, title, dpi)
            fig.savefig(save_plot_path, bbox_inches="tight", dpi=dpi)
            plt.close(fig)
        return auroc, {"fpr": fpr, "tpr": tpr}

    def figure(self, title: str = "ROC: error detection", dpi: int = 200):
        """ROC figure for TensorBoard add_figure embedding; caller owns it.
        Returns None when the ROC is undefined (no errors or no hits)."""
        auroc, fpr, tpr = auroc_from_histograms(self.h_err, self.h_ok)
        if fpr is None:
            return None
        return self._make_fig(auroc, fpr, tpr, title, dpi)

    def _make_fig(self, auroc, fpr, tpr, title, dpi):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(6.0, 5.0), dpi=dpi)
        ax.plot([0, 1], [0, 1])
        ax.plot(fpr, tpr)
        ax.set_xlim(0, 1); ax.set_ylim(0, 1)
        ax.set_xlabel("FPR"); ax.set_ylabel("TPR")
        ax.set_title(f"{title}\nAUROC = {auroc:.4f}")
        ax.grid(True, alpha=0.3)
        fig.tight_layout()
        return fig
