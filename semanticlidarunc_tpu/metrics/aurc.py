"""AURC / risk-coverage metrics from binned confidence statistics.

The reference computes exact RC curves from host-side sorted arrays
(/root/reference/src/metrics/aurc.py:7-45) but never wires them into the
Trainer/Tester; SURVEY.md flags the capability as worth wiring properly. Here
RC statistics come from per-bin (count, error_count) histograms of confidence,
accumulated on device, making AURC streaming and mesh-reducible. The binned
curve converges to the exact one as bins grow (4096 default; validated
against the exact host computation in tests/test_metrics.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n_bins", "ignore_index"))
def rc_histograms(conf: jnp.ndarray, pred: jnp.ndarray, labels: jnp.ndarray,
                  *, n_bins: int = 4096, ignore_index: int | None = 0):
    """(count, err_count) per confidence bin over valid pixels; conf in [0,1]."""
    valid = jnp.ones(labels.shape, bool) if ignore_index is None \
        else labels != ignore_index
    is_err = ((pred != labels) & valid).astype(jnp.float32)
    b = jnp.clip((jnp.clip(conf, 0.0, 1.0) * n_bins).astype(jnp.int32),
                 0, n_bins - 1)
    b = jnp.where(valid, b, n_bins).reshape(-1)
    cnt = jnp.zeros((n_bins + 1,), jnp.float32).at[b].add(1.0)[:n_bins]
    err = jnp.zeros((n_bins + 1,), jnp.float32).at[b].add(
        is_err.reshape(-1))[:n_bins]
    return cnt, err


def rc_curve_from_histograms(cnt: np.ndarray, err: np.ndarray):
    """(coverages, selective_risks, weights) sweeping low-confidence removal.

    Mirrors rc_curve_stats (reference aurc.py:7-35) with one point per
    non-empty confidence bin instead of per distinct confidence value.
    """
    cnt = np.asarray(cnt, np.float64)
    err = np.asarray(err, np.float64)
    n = cnt.sum()
    if n == 0:
        return np.array([1.0]), np.array([0.0]), np.array([])
    # removing ascending-confidence mass: suffix sums give what's retained
    keep_cnt = np.concatenate([[n], n - np.cumsum(cnt)])
    keep_err = np.concatenate([[err.sum()], err.sum() - np.cumsum(err)])
    nonempty = np.concatenate([[True], cnt > 0])
    keep_cnt, keep_err = keep_cnt[nonempty], keep_err[nonempty]
    coverages = keep_cnt / n
    with np.errstate(divide="ignore", invalid="ignore"):
        risks = np.where(keep_cnt > 0, keep_err / np.maximum(keep_cnt, 1), 0.0)
    # pad the zero-coverage terminal point like the reference (:30-33)
    if coverages[-1] > 0:
        coverages = np.concatenate([coverages, [0.0]])
        risks = np.concatenate([risks, [risks[-1]]])
    weights = -np.diff(coverages)
    return coverages, risks, weights


def aurc_from_histograms(cnt: np.ndarray, err: np.ndarray):
    """(aurc, eaurc, coverages, risks) — reference aurc.py:38-45 semantics."""
    coverages, risks, weights = rc_curve_from_histograms(cnt, err)
    if weights.size == 0:
        return float("nan"), float("nan"), coverages, risks
    aurc = float(np.sum((risks[:-1] + risks[1:]) * 0.5 * weights))
    # optimal AURC: errors sorted to the lowest-confidence end
    n = float(np.asarray(cnt).sum())
    e = float(np.asarray(err).sum())
    # closed form of cumsum(sort(risks))/arange average for 0/1 risks:
    # first (n-e) kept samples have risk 0, then errors accumulate.
    ks = np.arange(1, int(n) + 1, dtype=np.float64)
    cum_err = np.clip(ks - (n - e), 0.0, None)
    aurc_opt = float(np.sum(cum_err / ks) / n)
    return aurc, aurc - aurc_opt, coverages, risks


def topk_error_recall(cnt: np.ndarray, err: np.ndarray,
                      ks=(1, 2, 5, 10, 20, 30, 40, 50)):
    """Fraction of all errors captured in the k% least-confident pixels
    (reference aurc.py:100-107)."""
    cnt = np.asarray(cnt, np.float64)
    err = np.asarray(err, np.float64)
    n, e = cnt.sum(), err.sum()
    cum_cnt = np.cumsum(cnt)
    cum_err = np.cumsum(err)
    out = []
    for k in ks:
        m = max(1.0, n * k / 100.0)
        i = int(np.searchsorted(cum_cnt, m))
        out.append(float(cum_err[min(i, len(cum_err) - 1)] / max(e, 1.0)))
    return np.asarray(ks), np.asarray(out)


class AURCAggregator:
    """Streaming AURC/E-AURC + RC curve over a dataset."""

    def __init__(self, ignore_index: int | None = 0, n_bins: int = 4096):
        self.ignore_index = ignore_index
        self.n_bins = n_bins
        self.reset()

    def reset(self):
        self.cnt = np.zeros(self.n_bins, np.float64)
        self.err = np.zeros(self.n_bins, np.float64)

    def update(self, conf, pred, labels):
        c, e = rc_histograms(jnp.asarray(conf), jnp.asarray(pred),
                             jnp.asarray(labels), n_bins=self.n_bins,
                             ignore_index=self.ignore_index)
        self.cnt += np.asarray(c, np.float64)
        self.err += np.asarray(e, np.float64)

    def compute(self):
        aurc, eaurc, coverages, risks = aurc_from_histograms(self.cnt, self.err)
        ks, recalls = topk_error_recall(self.cnt, self.err)
        return {"AURC": aurc, "EAURC": eaurc, "coverages": coverages,
                "rc_risks": risks, "ks": ks, "recalls": recalls,
                "num_pixels": int(self.cnt.sum()),
                "num_errors": int(self.err.sum())}


def plot_rc_curves(stats: dict, title_prefix: str = "Dataset",
                   save_path: str | None = None, dpi: int = 150):
    """Risk-coverage + top-k% error-recall plots
    (reference aurc.py:125-160 plot_batch_rc_curves)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4.5))
    ax1.plot(stats["coverages"], stats["rc_risks"])
    ax1.set_xlabel("Coverage")
    ax1.set_ylabel("Selective risk")
    ax1.set_title(f"{title_prefix} risk-coverage  "
                  f"AURC={stats['AURC']:.4f}  E-AURC={stats['EAURC']:.4f}")
    ax1.grid(True, alpha=0.3)
    ax2.plot(stats["ks"], stats["recalls"], marker="o")
    ax2.set_xlabel("Least-confident k% of pixels")
    ax2.set_ylabel("Fraction of all errors captured")
    ax2.set_title("Top-k% error recall")
    ax2.set_ylim(0, 1)
    ax2.grid(True, alpha=0.3)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, bbox_inches="tight", dpi=dpi)
    plt.close(fig)
    return fig
