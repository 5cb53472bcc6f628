"""Dataset class-distribution statistics and bar plot.

Port of the per-dataloader `main()` drivers + `plot_pointCounts_per_class`
(/root/reference/src/dataset/utils.py:115-199,
dataloader_semantic_KITTI.py:102-153): sweep a split, accumulate per-class
point counts, render a log-scale colored bar chart.
"""
from __future__ import annotations

import numpy as np


def class_counts(dataset, num_classes: int, max_scans: int | None = None):
    """Accumulate per-class label counts over a reader dataset."""
    total = np.zeros(num_classes, np.int64)
    n = len(dataset) if max_scans is None else min(len(dataset), max_scans)
    for i in range(n):
        labels = np.asarray(dataset[i]["labels"]).reshape(-1)
        total += np.bincount(np.clip(labels, 0, num_classes - 1),
                             minlength=num_classes)
    return {i: int(total[i]) for i in range(num_classes)}


def plot_class_counts(counts: dict, class_names, num_classes: int,
                      color_map: dict, ignore_ids=(0,), log_scale: bool = True,
                      sort_by_count: bool = False,
                      title: str = "Dataset Class Distribution",
                      save_path: str | None = None, dpi: int = 200):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ids = [i for i in range(num_classes) if i not in set(ignore_ids)]
    if sort_by_count:
        ids.sort(key=lambda i: -counts.get(i, 0))
    vals = [counts.get(i, 0) for i in ids]
    names = [class_names[i] for i in ids]
    colors = [np.array(color_map[i])[::-1] / 255.0 for i in ids]

    fig, ax = plt.subplots(figsize=(20, 7))
    bars = ax.bar(range(len(ids)), vals, color=colors)
    ax.set_xticks(range(len(ids)))
    ax.set_xticklabels(names, rotation=30, ha="right", fontsize=12)
    ax.set_title(title, fontsize=22, pad=24, weight="bold")
    ax.set_xlabel("Class", fontsize=14)
    ax.set_ylabel("Number of points" + (" (log scale)" if log_scale else ""),
                  fontsize=14)
    if log_scale:
        ax.set_yscale("log")
        ax.set_ylim(bottom=1)
    for b, v in zip(bars, vals):
        if v > 0:
            ax.annotate(f"{v:,}", (b.get_x() + b.get_width() / 2, v),
                        xytext=(0, 5), textcoords="offset points",
                        ha="center", va="bottom", fontsize=10,
                        fontweight="bold")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=dpi, bbox_inches="tight")
    plt.close(fig)
    return vals
