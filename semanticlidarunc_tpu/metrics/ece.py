"""Expected Calibration Error for segmentation, with binned on-device stats.

The reference ECEAggregator keeps a host-side reservoir of per-pixel
(confidence, correct) pairs and histograms them at compute time
(/root/reference/src/metrics/ece.py:13-212). Since uniform-binned ECE is a
function of per-bin sufficient statistics only, we accumulate
(count, sum_conf, sum_correct) per bin ON DEVICE over *all* pixels — exact
(no reservoir subsampling error), fixed memory, and psum-reducible across a
mesh. Equal-mass ("adaptive") binning is approximated from a fine auxiliary
histogram of confidences.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def probs_from(preds: jnp.ndarray, mode: str, eps: float = 1e-12) -> jnp.ndarray:
    """alpha | logits | probs -> probabilities over the last axis."""
    if mode == "alpha":
        a0 = preds.sum(axis=-1, keepdims=True)
        return preds / (a0 + eps)
    if mode == "logits":
        return jax.nn.softmax(preds, axis=-1)
    if mode == "probs":
        p = jnp.clip(preds, 0.0)
        return p / jnp.clip(p.sum(axis=-1, keepdims=True), eps)
    raise ValueError(f"Unknown mode: {mode}")


@functools.partial(jax.jit, static_argnames=("n_bins", "ignore_index", "mode"))
def ece_bin_stats(preds: jnp.ndarray, labels: jnp.ndarray, *,
                  n_bins: int = 15, ignore_index: int | None = 0,
                  mode: str = "probs"):
    """Per-bin (count, sum_conf, sum_correct) over valid pixels.

    preds [..., C], labels [...]. Uniform binning on [0, 1], left-inclusive
    bins with the last bin right-inclusive (numpy.histogram semantics).
    """
    p = probs_from(preds, mode)
    conf = jnp.max(p, axis=-1)
    pred = jnp.argmax(p, axis=-1)
    valid = jnp.ones(labels.shape, bool) if ignore_index is None \
        else labels != ignore_index
    conf = jnp.clip(conf, 0.0, 1.0)
    bin_id = jnp.clip((conf * n_bins).astype(jnp.int32), 0, n_bins - 1)
    bin_id = jnp.where(valid, bin_id, n_bins)
    correct = (pred == labels).astype(jnp.float32)

    count = jnp.zeros((n_bins + 1,), jnp.float32).at[bin_id].add(1.0)
    s_conf = jnp.zeros((n_bins + 1,), jnp.float32).at[bin_id].add(conf)
    s_corr = jnp.zeros((n_bins + 1,), jnp.float32).at[bin_id].add(correct)
    return count[:n_bins], s_conf[:n_bins], s_corr[:n_bins]


def ece_from_stats(count: np.ndarray, s_conf: np.ndarray, s_corr: np.ndarray):
    """(ece, mce) from per-bin sufficient statistics
    (reference weighting: src/metrics/ece.py:160-168)."""
    count = np.asarray(count, np.float64)
    n = count.sum()
    if n == 0:
        return float("nan"), float("nan")
    acc = np.divide(s_corr, count, out=np.zeros_like(count), where=count > 0)
    conf = np.divide(s_conf, count, out=np.zeros_like(count), where=count > 0)
    gap = np.abs(acc - conf)
    ece = float(np.sum(count / max(1.0, n) * gap))
    nonempty = count > 0
    mce = float(gap[nonempty].max()) if nonempty.any() else float("nan")
    return ece, mce


class ECEAggregator:
    """Streaming top-label ECE/MCE. API-compatible subset of the reference.

    Internally accumulates FINE per-bin statistics (default 1050 bins, a
    multiple of the reporting bins) and aggregates to `n_bins` at compute
    time, either uniformly or equal-mass ("adaptive", reference
    ece.py:114-127) — equal-mass edges come from the empirical CDF of the
    fine confidence histogram.
    """

    def __init__(self, n_bins: int = 15, mode: str = "alpha",
                 ignore_index: int | None = None, binning: str = "uniform",
                 fine_bins: int | None = None, **_ignored):
        assert n_bins >= 2
        assert binning in {"uniform", "adaptive"}
        self.n_bins = int(n_bins)
        self.binning = binning
        self.mode = mode
        self.ignore_index = ignore_index
        self.fine_bins = fine_bins or self.n_bins * 70
        self.reset()

    def reset(self):
        self.count = np.zeros(self.fine_bins, np.float64)
        self.s_conf = np.zeros(self.fine_bins, np.float64)
        self.s_corr = np.zeros(self.fine_bins, np.float64)

    def update(self, preds, labels):
        c, sc, sr = ece_bin_stats(preds, labels, n_bins=self.fine_bins,
                                  ignore_index=self.ignore_index,
                                  mode=self.mode)
        self.update_stats(c, sc, sr)

    def update_stats(self, count, s_conf, s_corr):
        self.count += np.asarray(count, np.float64)
        self.s_conf += np.asarray(s_conf, np.float64)
        self.s_corr += np.asarray(s_corr, np.float64)

    def _aggregate(self):
        """(count, s_conf, s_corr, edges) at the reporting resolution."""
        if self.binning == "uniform" or self.count.sum() == 0:
            k = self.fine_bins // self.n_bins
            edges = np.linspace(0.0, 1.0, self.n_bins + 1)
            agg = lambda a: a.reshape(self.n_bins, k).sum(axis=1)  # noqa: E731
            return agg(self.count), agg(self.s_conf), agg(self.s_corr), edges
        # adaptive: equal-mass edges from the fine CDF
        cdf = np.cumsum(self.count)
        total = cdf[-1]
        targets = np.linspace(0.0, 1.0, self.n_bins + 1)[1:-1] * total
        cut = np.searchsorted(cdf, targets, side="left") + 1
        cut = np.unique(np.clip(cut, 1, self.fine_bins - 1))
        bounds = np.concatenate([[0], cut, [self.fine_bins]])
        if bounds.size < 3:  # degenerate; fall back to uniform
            self.binning = "uniform"
            return self._aggregate()
        edges = bounds / self.fine_bins

        def agg(a):
            return np.add.reduceat(a, bounds[:-1])

        return agg(self.count), agg(self.s_conf), agg(self.s_corr), edges

    def compute(self, save_plot_path: str | None = None,
                title: str = "Reliability Diagram", dpi: int = 200):
        count, s_conf, s_corr, _ = self._aggregate()
        ece, mce = ece_from_stats(count, s_conf, s_corr)
        stats = self.stats_dict()
        if save_plot_path is not None:
            self._plot(stats, ece, mce, save_plot_path, title, dpi)
        return (ece, mce), stats

    def stats_dict(self):
        count, s_conf, s_corr, edges = self._aggregate()
        acc = np.divide(s_corr, count, out=np.full_like(count, np.nan),
                        where=count > 0)
        conf = np.divide(s_conf, count, out=np.full_like(count, np.nan),
                         where=count > 0)
        return {
            "low": edges[:-1], "high": edges[1:],
            "center": 0.5 * (edges[:-1] + edges[1:]),
            "n": count, "pct": 100.0 * count / max(1.0, count.sum()),
            "acc": acc, "conf": conf,
        }

    def figure(self, title: str = "Reliability Diagram", dpi: int = 200):
        """Reliability figure for TensorBoard add_figure embedding (the
        reference embeds these via writer.add_figure, trainer.py:1240-1281).
        Caller owns the figure (close after use)."""
        count, s_conf, s_corr, _ = self._aggregate()
        ece, mce = ece_from_stats(count, s_conf, s_corr)
        return self._make_fig(self.stats_dict(), ece, mce, title, dpi)

    def _plot(self, stats, ece, mce, path, title, dpi):
        import matplotlib.pyplot as plt
        fig = self._make_fig(stats, ece, mce, title, dpi)
        fig.savefig(path, bbox_inches="tight", dpi=dpi)
        plt.close(fig)

    def _make_fig(self, stats, ece, mce, title, dpi):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6.8, 5.0), dpi=dpi)
        x = stats["center"]
        acc = np.nan_to_num(stats["acc"])
        conf = np.nan_to_num(stats["conf"])
        ax.plot([0, 1], [0, 1], label="perfect calibration", linewidth=2)
        ax.plot(x, acc, marker="o", label="accuracy")
        ax.plot(x, conf, marker="x", linestyle="--", label="avg. confidence")
        ax2 = ax.twinx()
        mass = stats["n"] / max(1.0, stats["n"].sum())
        ax2.bar(x, mass, width=(stats["high"] - stats["low"]) * 0.9,
                alpha=0.25, color="#6baed6", edgecolor="none")
        ax2.set_ylim(0, 1)
        ax.set_xlabel("Confidence (bin center)")
        ax.set_ylabel("Accuracy / Avg. Confidence")
        ax.set_xlim(0, 1)
        ax.set_ylim(0, 1)
        ax.grid(True, alpha=0.3)
        ax.set_title(f"{title}\nECE={ece:.4f}  |  MCE={mce:.4f}")
        ax.legend(loc="lower right", frameon=True)
        fig.tight_layout()
        return fig
