"""Headline benchmark: SemanticKITTI scans/sec for 20-sample MC-dropout.

Runs on whatever accelerator JAX exposes (the driver runs it on one real TPU
chip). Measures the full per-scan inference: flagship FPN (resnet50 backbone,
the reference's headline-mIoU model) on a 64x2048 KITTI-shaped scan, 20
MC-dropout samples with the fused p_bar / entropy / mutual-information
reductions — everything in one jit, bf16 compute.

Timing methodology: this environment reaches the TPU through an RPC tunnel
where `block_until_ready` does NOT wait for device execution and a host fetch
costs ~30 ms. We therefore chain N dependent iterations inside one compiled
fori_loop (each iteration's input depends on the previous output, so nothing
can be elided or overlapped) and fetch a single scalar at the end; per-scan
time is the slope between a 1-iteration and an N+1-iteration run, which
cancels the constant RPC cost.

Baseline derivation (see BASELINE.md): the reference's resnet50 forward is
43.7 ms at bs=1 on 128x2048 input (Images/plot_inference_time.py:7); KITTI
scans are 64x2048 (half the rows), and reference MC-dropout is T sequential
full forwards (src/utils/mc_dropout.py:114-119), so the reference-GPU
20-sample rate is ~ 1000 / (43.7 / 2 * 20) = 2.29 scans/s. The driver target
is >= 5x an H100 running the same PyTorch code.

Prints exactly one JSON line.
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

MC_SAMPLES = 20
H, W = 64, 2048
BASELINE_SCANS_PER_SEC = 2.29
N_ITERS = 50


def main():
    from semanticlidarunc_tpu.models import registry
    from semanticlidarunc_tpu.prob import mc_dropout as mc
    from semanticlidarunc_tpu.utils import config as cfg_util

    cfg = cfg_util.with_extras({
        "dataset_name": "SemanticKitti",
        "model_settings": {
            "baseline": "Reichert", "model_type": "resnet50",
            "loss_function": "CE", "attention": True,
            "multi_scale_meta": True, "normals": True, "reflectivity": True,
            "projection": [H, W],
        },
        "train_params": {},
    })
    model = registry.build_model(cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    x = jnp.asarray(np.concatenate([
        rng.random((1, H, W, 1), np.float32) * 50,
        rng.random((1, H, W, 1), np.float32)], axis=-1))
    meta = jnp.asarray(np.concatenate([
        rng.standard_normal((1, H, W, 3)).astype(np.float32) * 20,
        rng.standard_normal((1, H, W, 3)).astype(np.float32)], axis=-1))

    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x, meta,
                           train=False)

    def mc_infer(variables, x, meta, key):
        p_bar, h_norm, mi_norm = mc.mc_fused_summaries(
            model, variables, (x, meta), key, MC_SAMPLES)
        return jnp.argmax(p_bar, -1), h_norm, mi_norm

    @jax.jit
    def chained(variables, x, meta, n):
        def body(i, carry):
            xx, acc = carry
            preds, h_norm, mi_norm = mc_infer(variables, xx, meta,
                                              jax.random.fold_in(key, i))
            # feed the result back into the input: strict serial dependency
            dep = (h_norm[..., None] + mi_norm[..., None]) * 1e-9
            return xx + dep.astype(xx.dtype), acc + preds.sum()
        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.int32(0)))
        return acc

    def timed(n: int) -> float:
        t0 = time.perf_counter()
        int(chained(variables, x, meta, jnp.asarray(n)))  # fetch -> sync
        return time.perf_counter() - t0

    timed(1)  # compile + warm caches
    t1 = min(timed(1) for _ in range(3))
    tn = min(timed(N_ITERS + 1) for _ in range(3))
    per_scan = (tn - t1) / N_ITERS

    scans_per_sec = 1.0 / per_scan
    print(json.dumps({
        "metric": "kitti_mc20_scans_per_sec",
        "value": round(scans_per_sec, 3),
        "unit": "scans/s/chip",
        "vs_baseline": round(scans_per_sec / BASELINE_SCANS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
