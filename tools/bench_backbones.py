"""Backbone-zoo latency sweep, mirroring the reference's bench protocol.

The reference benches each FPN backbone at bs=1, 128x2048 input (CUDA
events, median; /root/reference/src/baselines/Reichert/semanticFCN_opt.py:
477-496) and publishes the latency table in Images/plot_inference_time.py.
This sweep measures the same forward (deterministic, bf16) on the TPU with
the chained-slope method (see bench.py for why plain timers lie through the
RPC tunnel) and prints a markdown table with the reference GPU latency for
comparison.

Run: PYTHONPATH=. python tools/bench_backbones.py [backbone ...]
"""
from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

H, W = 128, 2048
N_ITERS = 30

# reference GPU numbers (Images/plot_inference_time.py:5-9): name ->
# (latency_ms, published mIoU)
REFERENCE = {
    "resnet50": (43.7, 60.07), "shufflenet_v2_x1_5": (23.6, 59.38),
    "shufflenet_v2_x1_0": (15.1, 58.0), "resnet34": (13.6, 57.3),
    "regnet_y_1_6gf": (21.7, 55.78), "regnet_y_3_2gf": (25.1, 55.69),
    "regnet_y_800mf": (14.4, 55.64), "resnet18": (9.8, 55.6),
    "regnet_y_400mf": (14.2, 55.0), "shufflenet_v2_x0_5": (10.24, 53.6),
}


def bench_one(model_type: str) -> float:
    import os

    from semanticlidarunc_tpu.models import layers, registry
    from semanticlidarunc_tpu.utils import config as cfg_util

    # A/B knobs for the UpsampleBlock auto policy (see layers.py)
    if os.environ.get("SLU_FUSED_MIN_GRID_PX"):
        layers._FUSED_MIN_GRID_PX = int(
            os.environ["SLU_FUSED_MIN_GRID_PX"])
    if os.environ.get("SLU_FUSED_MAX_FOLDED_BYTES"):
        layers._FUSED_MAX_FOLDED_BYTES = int(
            os.environ["SLU_FUSED_MAX_FOLDED_BYTES"])

    cfg = cfg_util.with_extras({
        "dataset_name": "SemanticKitti",
        "model_settings": {
            "baseline": "Reichert", "model_type": model_type,
            "loss_function": "CE", "attention": True,
            "multi_scale_meta": True, "normals": True, "reflectivity": True,
            "projection": [H, W],
        },
        "train_params": {},
    })
    model = registry.build_model(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.random((1, H, W, 2)), jnp.float32)
    meta = jnp.asarray(rng.standard_normal((1, H, W, 6)), jnp.float32)
    variables = model.init({"params": key, "dropout": key}, x, meta,
                           train=False)

    @jax.jit
    def chained(n):
        def body(i, c):
            out = model.apply(variables, c, meta, train=False,
                              stochastic=False)
            return c + (out.sum() * 1e-12).astype(c.dtype)
        return jax.lax.fori_loop(0, n, body, x).sum().astype(jnp.float32)

    def timed(n):
        t0 = time.perf_counter()
        float(chained(jnp.asarray(n)))
        return time.perf_counter() - t0

    timed(1)
    t1 = min(timed(1) for _ in range(3))
    tn = min(timed(N_ITERS + 1) for _ in range(3))
    return (tn - t1) / N_ITERS


def main():
    names = sys.argv[1:] or list(REFERENCE)
    print(f"| backbone | TPU v5e fwd (ms, {H}x{W} bs1 bf16) | "
          "reference GPU (ms) | speedup | ref mIoU |")
    print("|---|---|---|---|---|")
    for name in names:
        ms = bench_one(name) * 1e3
        ref_ms, miou = REFERENCE.get(name, (float("nan"), float("nan")))
        print(f"| {name} | {ms:.2f} | {ref_ms} | {ref_ms / ms:.1f}x "
              f"| {miou} |", flush=True)


if __name__ == "__main__":
    main()
