"""Latency-vs-mIoU scatter: reference GPU vs this framework on TPU v5e.

The analog of the reference's published-results figure
(/root/reference/Images/plot_inference_time.py:1-51): dot area ~ params,
color = backbone family, with BOTH the reference's GPU latencies and the
measured TPU v5e forward latencies (docs/baselines.md, round-3 sweep,
same bs=1 128x2048 deterministic-forward protocol) so the speedups are
visible as horizontal shifts at equal mIoU.

Run: python tools/plot_inference_time.py [out.png]   (CPU, matplotlib only)
"""
from __future__ import annotations

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# (model, family, ref GPU ms, TPU v5e ms, mIoU, params M) — reference rows
# from Images/plot_inference_time.py:5-9; TPU rows from docs/baselines.md
ROWS = [
    ("resnet50", "resnet", 43.7, 9.1, 60.07, 128.8),
    ("regnet_y_1_6gf", "regnet", 21.7, 9.3, 55.78, 22.25),
    ("regnet_y_3_2gf", "regnet", 25.1, 14.6, 55.69, 52.0),
    ("shufflenet_v2_x1_5", "shufflenet", 23.6, 10.6, 59.38, 25.1),
    ("resnet34", "resnet", 13.6, 5.3, 57.3, 28.3),
    ("regnet_y_800mf", "regnet", 14.4, 9.3, 55.64, 16.7),
    ("shufflenet_v2_x1_0", "shufflenet", 15.1, 7.5, 58.0, 13.2),
    ("resnet18", "resnet", 9.8, 4.6, 55.6, 18.5),
    ("regnet_y_400mf", "regnet", 14.2, 6.0, 55.0, 8.6),
    ("shufflenet_v2_x0_5", "shufflenet", 10.24, 5.3, 53.6, 4.3),
]
COLORS = {"shufflenet": "tab:blue", "regnet": "tab:red",
          "resnet": "tab:green"}


def main(out_path: str = "inference_time_tpu.png"):
    fig, ax = plt.subplots(figsize=(9, 6))
    for name, fam, gpu_ms, tpu_ms, miou, params in ROWS:
        c = COLORS[fam]
        s = params * 10
        ax.scatter([gpu_ms], [miou], s=s, c=c, alpha=0.25, edgecolors="w",
                   linewidth=0.5)
        ax.scatter([tpu_ms], [miou], s=s, c=c, alpha=0.85, edgecolors="k",
                   linewidth=0.5)
        ax.annotate("", xy=(tpu_ms, miou), xytext=(gpu_ms, miou),
                    arrowprops=dict(arrowstyle="->", color=c, alpha=0.5,
                                    lw=1.0))
        ax.annotate(f"{name}\n({params}M)", (tpu_ms, miou + 0.12),
                    fontsize=7, ha="center")
    # realtime bands as in the reference figure (:42-51)
    ax.axvspan(0, 25, color="green", alpha=0.05)
    ax.axvspan(25, 50, color="orange", alpha=0.05)
    ax.set_xlabel("Inference time (ms, bs=1, 128x2048)")
    ax.set_ylabel("mIoU @ SemanticKITTI val (seq 08)")
    ax.set_title("Reference GPU (faded) -> TPU v5e (solid), "
                 "dot area ~ params")
    ax.set_xlim(0, 50)
    ax.set_ylim(52.5, 61)
    ax.grid(alpha=0.2)
    fig.tight_layout()
    fig.savefig(out_path, dpi=140)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
