"""One-shot reliability diagram + ECE from probabilities.

Port of /root/reference/src/utils/reliability.py:6-59 (quick diagnostic
variant, separate from the streaming ECEAggregator) plus the MC-Dirichlet
reliability diagram of probability_helper.py:339-385.
"""
from __future__ import annotations

import numpy as np


def reliability_diagram(probs: np.ndarray, labels: np.ndarray,
                        n_bins: int = 10, ignore_index: int | None = 0,
                        save_path: str | None = None, dpi: int = 200):
    """probs [..., C], labels [...] -> (ece, bin_acc, bin_conf, counts)."""
    probs = np.asarray(probs)
    labels = np.asarray(labels)
    conf = probs.max(-1).reshape(-1)
    pred = probs.argmax(-1).reshape(-1)
    lab = labels.reshape(-1)
    if ignore_index is not None:
        ok = lab != ignore_index
        conf, pred, lab = conf[ok], pred[ok], lab[ok]
    correct = (pred == lab).astype(np.float64)
    bins = np.clip((conf * n_bins).astype(int), 0, n_bins - 1)
    counts = np.bincount(bins, minlength=n_bins).astype(np.float64)
    acc = np.bincount(bins, weights=correct, minlength=n_bins)
    csum = np.bincount(bins, weights=conf, minlength=n_bins)
    bin_acc = np.divide(acc, counts, out=np.zeros(n_bins), where=counts > 0)
    bin_conf = np.divide(csum, counts, out=np.zeros(n_bins), where=counts > 0)
    ece = float(np.sum(counts / max(1, counts.sum()) *
                       np.abs(bin_acc - bin_conf)))
    if save_path:
        plot_reliability(bin_acc, (np.arange(n_bins) + 0.5) / n_bins, counts,
                         save_path, dpi=dpi)
    return ece, bin_acc, bin_conf, counts


def plot_reliability(empirical_acc, bin_centers, tot_counts,
                     output_path: str = "reliability_diagram.png",
                     title: str = ("Reliability diagram\n(dot area ~ #pixels "
                                   "per confidence bin)"),
                     xlabel: str = "Predicted confidence",
                     ylabel: str = "Empirical accuracy", dpi: int = 300):
    """Scatter-style reliability diagram (probability_helper.py:369-385)."""
    tot_counts = np.asarray(tot_counts, np.float64)
    if tot_counts.size == 0 or tot_counts.max() == 0:
        return
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sizes = (tot_counts / tot_counts.max()) * 1000.0
    fig, ax = plt.subplots(figsize=(6, 6), constrained_layout=True)
    ax.plot([0, 1], [0, 1], "--", color="gray", lw=1,
            label="Perfect calibration")
    ax.scatter(bin_centers, empirical_acc, s=sizes, alpha=0.7,
               edgecolors="k", label="Empirical reliability")
    ax.fill_between(bin_centers, empirical_acc, 0, alpha=0.2)
    ax.set_title(title, fontsize=11, pad=12)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(loc="upper left", markerscale=0.3)
    ax.grid(True, linestyle=":", linewidth=0.5)
    fig.savefig(output_path, dpi=dpi, bbox_inches="tight")
    plt.close(fig)


def mc_dirichlet_reliability(rng, alpha, labels, n_bins: int = 10,
                             n_samples: int = 64,
                             save_path: str | None = None):
    """MC argmax-agreement confidence vs 1-shot correctness
    (probability_helper.py:339-366 + diagram)."""
    from ..prob.dirichlet import mc_reliability_bins
    import jax.numpy as jnp

    hits, totals = mc_reliability_bins(rng, jnp.asarray(alpha),
                                       jnp.asarray(labels), n_bins=n_bins,
                                       n_samples=n_samples)
    hits = np.asarray(hits)
    totals = np.asarray(totals)
    acc = np.divide(hits, totals, out=np.zeros_like(hits), where=totals > 0)
    centers = (np.arange(n_bins) + 0.5) / n_bins
    if save_path:
        plot_reliability(acc, centers, totals, save_path)
    return acc, centers, totals
