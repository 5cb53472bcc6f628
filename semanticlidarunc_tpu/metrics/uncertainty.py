"""Per-class uncertainty aggregation + accuracy-vs-uncertainty analysis.

Replaces the reference's host-side reservoirs
(/root/reference/src/models/evaluator.py:191-535, 640-866) with fixed-shape
per-class histograms accumulated on device:

- quantiles/boxplot stats come from the histogram CDF (exact to bin width,
  1/512 by default, over ALL pixels instead of a 1e6-sample reservoir);
- the ridgeline is the reference's own "fast histogram + Gaussian smoothing"
  variant (evaluator.py:413-535) — which is precisely a function of these
  histograms;
- accuracy-vs-uncertainty is a per-bin (count, correct) table, identical to
  the reference's histogram binning of its reservoir (evaluator.py:726-749).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("num_classes", "n_bins"))
def class_uncertainty_histograms(labels: jnp.ndarray, uncertainty: jnp.ndarray,
                                 num_classes: int, n_bins: int = 512):
    """[C, n_bins] histogram of uncertainty values per GT class."""
    lab = labels.reshape(-1)
    unc = jnp.clip(uncertainty.reshape(-1), 0.0, 1.0)
    b = jnp.clip((unc * n_bins).astype(jnp.int32), 0, n_bins - 1)
    ok = (lab >= 0) & (lab < num_classes)
    idx = jnp.where(ok, lab * n_bins + b, num_classes * n_bins)
    h = jnp.zeros((num_classes * n_bins + 1,), jnp.float32).at[idx].add(1.0)
    return h[:num_classes * n_bins].reshape(num_classes, n_bins)


@functools.partial(jax.jit, static_argnames=("n_bins",))
def acc_vs_uncertainty_bins(uncertainty: jnp.ndarray, correct: jnp.ndarray,
                            valid: jnp.ndarray, n_bins: int = 20):
    """(count, correct_count) per uncertainty bin over valid pixels."""
    unc = jnp.clip(uncertainty.reshape(-1), 0.0, 1.0)
    b = jnp.clip((unc * n_bins).astype(jnp.int32), 0, n_bins - 1)
    b = jnp.where(valid.reshape(-1), b, n_bins)
    cnt = jnp.zeros((n_bins + 1,), jnp.float32).at[b].add(1.0)[:n_bins]
    cor = jnp.zeros((n_bins + 1,), jnp.float32).at[b].add(
        correct.reshape(-1).astype(jnp.float32))[:n_bins]
    return cnt, cor


def _hist_quantiles(hist: np.ndarray, qs) -> np.ndarray:
    """Quantiles of a histogram over [0, 1] (bin centers)."""
    n = hist.sum()
    if n == 0:
        return np.full(len(qs), np.nan)
    cdf = np.cumsum(hist) / n
    centers = (np.arange(hist.size) + 0.5) / hist.size
    return np.interp(qs, cdf, centers)


class UncertaintyPerClassAggregator:
    def __init__(self, num_classes: int, n_bins: int = 512, **_ignored):
        self.num_classes = num_classes
        self.n_bins = n_bins
        self.reset()

    def reset(self):
        self.hist = np.zeros((self.num_classes, self.n_bins), np.float64)

    def update(self, labels, uncertainty):
        self.hist += np.asarray(class_uncertainty_histograms(
            jnp.asarray(labels), jnp.asarray(uncertainty),
            self.num_classes, self.n_bins), np.float64)

    def update_stats(self, hist):
        self.hist += np.asarray(hist, np.float64)

    def class_stats(self, ignore_ids=()) -> dict[int, dict]:
        out = {}
        for c in range(self.num_classes):
            if c in set(ignore_ids) or self.hist[c].sum() == 0:
                continue
            q = _hist_quantiles(self.hist[c], [0.05, 0.25, 0.5, 0.75, 0.95])
            mean = float(np.sum(self.hist[c] *
                                (np.arange(self.n_bins) + 0.5) / self.n_bins)
                         / self.hist[c].sum())
            out[c] = {"q05": q[0], "q25": q[1], "median": q[2], "q75": q[3],
                      "q95": q[4], "mean": mean,
                      "count": float(self.hist[c].sum())}
        return out

    def plot_boxplot(self, class_names, color_map, ignore_ids=(),
                     save_path=None, title="Per-class uncertainty (boxplot)",
                     y_label="Normalized uncertainty", dpi=200):
        stats = self.class_stats(ignore_ids)
        if not stats:
            return None
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        boxes = []
        colors = []
        labels = []
        for c, s in stats.items():
            iqr = s["q75"] - s["q25"]
            boxes.append({
                "med": s["median"], "q1": s["q25"], "q3": s["q75"],
                "whislo": max(0.0, s["q25"] - 1.5 * iqr),
                "whishi": min(1.0, s["q75"] + 1.5 * iqr), "fliers": []})
            colors.append(np.array(color_map[c])[::-1] / 255.0)  # BGR->RGB
            labels.append(class_names[c])
        fig, ax = plt.subplots(figsize=(18, 6))
        bp = ax.bxp(boxes, showfliers=False, patch_artist=True)
        for patch, col in zip(bp["boxes"], colors):
            patch.set_facecolor(col)
        ax.set_xticklabels(labels, rotation=30, ha="right")
        ax.set_title(title, fontsize=18, pad=16, weight="bold")
        ax.set_ylabel(y_label)
        fig.tight_layout()
        if save_path:
            fig.savefig(save_path, dpi=dpi, bbox_inches="tight")
        plt.close(fig)
        return stats

    def plot_ridgeline(self, class_names, color_map, ignore_ids=(),
                       save_path=None, bw_adjust: float = 0.9, dpi=200,
                       title="Normalized Uncertainty per Class (Ridgeline)",
                       x_label="Normalized uncertainty"):
        """Save-to-file wrapper around `figure_ridgeline`."""
        out = self.figure_ridgeline(class_names, color_map, ignore_ids,
                                    bw_adjust, title, x_label)
        if out is None:
            return None
        fig, ids = out
        import matplotlib.pyplot as plt
        if save_path:
            fig.savefig(save_path, dpi=dpi, bbox_inches="tight")
        plt.close(fig)
        return ids

    def figure_ridgeline(self, class_names, color_map, ignore_ids=(),
                         bw_adjust: float = 0.9,
                         title="Normalized Uncertainty per Class (Ridgeline)",
                         x_label="Normalized uncertainty"):
        """Gaussian-smoothed histogram densities, stacked (the reference's
        fast ridgeline, evaluator.py:413-535: silverman-style bandwidth on
        histogram counts with reflection padding). Returns (fig, ids) —
        the caller owns (embeds/saves/closes) the figure."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ids = [c for c in range(self.num_classes)
               if c not in set(ignore_ids) and self.hist[c].sum() > 0]
        if not ids:
            return None
        n = len(ids)
        fig, axes = plt.subplots(n, 1, figsize=(14, max(4, 0.6 * n)),
                                 sharex=True,
                                 gridspec_kw={"hspace": 0.05})
        if n == 1:
            axes = [axes]
        x = (np.arange(self.n_bins) + 0.5) / self.n_bins
        for ax, c in zip(axes, ids):
            h = self.hist[c]
            nc = h.sum()
            # silverman bandwidth from histogram moments
            mean = np.sum(h * x) / nc
            var = np.sum(h * (x - mean) ** 2) / nc
            sigma = max(np.sqrt(var), 1e-4)
            bw = bw_adjust * 1.06 * sigma * nc ** (-1 / 5)
            k_half = max(1, int(3 * bw * self.n_bins))
            kx = np.arange(-k_half, k_half + 1) / self.n_bins
            kern = np.exp(-0.5 * (kx / bw) ** 2)
            kern /= kern.sum()
            padded = np.concatenate([h[k_half:0:-1], h, h[-2:-k_half - 2:-1]])
            dens = np.convolve(padded, kern, mode="valid")[:self.n_bins]
            dens = dens / max(dens.max(), 1e-12)
            col = np.array(color_map[c])[::-1] / 255.0
            ax.fill_between(x, 0, dens, color=col, alpha=0.9)
            ax.plot(x, dens, color="k", lw=1.0)
            ax.set_yticks([])
            ax.text(-0.01, 0.0, class_names[c], ha="right", va="bottom",
                    transform=ax.get_yaxis_transform())
            for s in ("top", "right", "left"):
                ax.spines[s].set_visible(False)
        axes[0].set_title(title, fontsize=16, weight="bold")
        axes[-1].set_xlabel(x_label)
        axes[-1].set_xlim(0, 1)
        return fig, ids


class UncertaintyAccuracyAggregator:
    def __init__(self, n_bins: int = 20, **_ignored):
        self.n_bins = n_bins
        self.reset()

    def reset(self):
        self.cnt = np.zeros(self.n_bins, np.float64)
        self.cor = np.zeros(self.n_bins, np.float64)

    def update(self, uncertainty, correct, valid):
        c, k = acc_vs_uncertainty_bins(jnp.asarray(uncertainty),
                                       jnp.asarray(correct),
                                       jnp.asarray(valid), self.n_bins)
        self.cnt += np.asarray(c, np.float64)
        self.cor += np.asarray(k, np.float64)

    def update_stats(self, cnt, cor):
        self.cnt += np.asarray(cnt, np.float64)
        self.cor += np.asarray(cor, np.float64)

    def compute(self):
        acc = np.divide(self.cor, self.cnt,
                        out=np.full(self.n_bins, np.nan), where=self.cnt > 0)
        centers = (np.arange(self.n_bins) + 0.5) / self.n_bins
        overall = float(self.cor.sum() / max(1.0, self.cnt.sum()))
        return {"centers": centers, "acc": acc,
                "mass": self.cnt / max(1.0, self.cnt.sum()),
                "overall_acc": overall}

    def plot(self, save_path=None, dpi=200,
             title="Accuracy vs. uncertainty"):
        """Save-to-file wrapper around `figure`."""
        stats, fig = self.figure(title)
        import matplotlib.pyplot as plt
        if save_path:
            fig.savefig(save_path, dpi=dpi, bbox_inches="tight")
        plt.close(fig)
        return stats

    def figure(self, title="Accuracy vs. uncertainty"):
        """(stats, fig) for the binned accuracy-vs-uncertainty bar chart
        (reference evaluator.py:726-749); the caller owns the figure."""
        stats = self.compute()
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(8, 5))
        cm = plt.get_cmap("viridis")
        mass = stats["mass"]
        colors = cm(mass / max(mass.max(), 1e-12))
        ax.bar(stats["centers"], np.nan_to_num(stats["acc"]),
               width=0.9 / self.n_bins, color=colors)
        ax.axhline(stats["overall_acc"], color="tab:red", ls="--",
                   label=f"overall acc {stats['overall_acc']:.3f}")
        ax.set_xlabel("Normalized uncertainty")
        ax.set_ylabel("Accuracy")
        ax.set_xlim(0, 1)
        ax.set_ylim(0, 1)
        ax.legend()
        ax.set_title(title)
        fig.tight_layout()
        return stats, fig


def plot_iou_sorted_by_uncertainty(per_class_iou: dict, class_stats: dict,
                                   class_names, color_map, save_path=None,
                                   dpi=200):
    """Sorted bar chart: per-class IoU ordered by mean uncertainty
    (reference evaluator.py:546-626)."""
    rows = []
    for c, s in class_stats.items():
        name = class_names[c]
        if name in per_class_iou and per_class_iou[name] == per_class_iou[name]:
            rows.append((c, name, s["mean"], per_class_iou[name]))
    if not rows:
        return None
    rows.sort(key=lambda r: r[2])
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(14, 6))
    xs = np.arange(len(rows))
    ax.bar(xs, [r[3] for r in rows],
           color=[np.array(color_map[r[0]])[::-1] / 255.0 for r in rows])
    ax.set_xticks(xs)
    ax.set_xticklabels([r[1] for r in rows], rotation=30, ha="right")
    ax.set_ylabel("IoU")
    ax.set_title("Per-class IoU sorted by mean uncertainty")
    for i, r in enumerate(rows):
        ax.text(i, r[3] + 0.01, f"u={r[2]:.2f}", ha="center", fontsize=8)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=dpi, bbox_inches="tight")
    plt.close(fig)
    return rows
