"""Sweep mc_fused_summaries(samples_per_step) on the model-only MC-20 path.

The tail processes k samples per lax.scan step; k=1 and k=20 were measured
in round 2 (12.3 vs 14.5 ms tail) but the middle was not. One process, one
TPU job, results appended to stdout line by line (never pipe TPU jobs).

Run: python tools/bench_mc_chunk.py [k ...]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

MC_SAMPLES = 20
H, W = 64, 2048
N_ITERS = 30


def main():
    from semanticlidarunc_tpu import inference
    from semanticlidarunc_tpu.dataset.synthetic import make_scan
    from semanticlidarunc_tpu.models import registry
    from semanticlidarunc_tpu.ops.projection import pad_points
    from semanticlidarunc_tpu.prob import mc_dropout as mc
    from semanticlidarunc_tpu.utils import config as cfg_util

    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 5]

    cfg = cfg_util.with_extras({
        "dataset_name": "SemanticKitti",
        "model_settings": {
            "baseline": "Reichert", "model_type": "resnet50",
            "loss_function": "CE", "attention": True,
            "multi_scale_meta": True, "normals": True, "reflectivity": True,
            "projection": [H, W]},
        "train_params": {},
    })
    model = registry.build_model(cfg, dtype=jnp.bfloat16)
    pc = make_scan(seed=0, n_beams=64, n_azimuth=2048)
    pts_np, valid_np = pad_points(pc, 1 << 17)
    points, valid = jnp.asarray(pts_np[:, :4]), jnp.asarray(valid_np)
    key = jax.random.PRNGKey(0)
    inputs0, _ = inference.preprocess_scan(points, valid, H, W, cfg)
    variables = model.init({"params": key, "dropout": key}, *inputs0,
                           train=False)
    x0, meta0 = inputs0

    def timed_slope(fn):
        def timed(n):
            t0 = time.perf_counter()
            float(fn(jnp.asarray(n)))
            return time.perf_counter() - t0
        timed(1)
        t1 = min(timed(1) for _ in range(3))
        tn = min(timed(N_ITERS + 1) for _ in range(3))
        return (tn - t1) / N_ITERS

    for k in ks:
        @jax.jit
        def chained(n, k=k):
            def body(i, carry):
                xx, acc = carry
                p_bar, h_norm, mi_norm = mc.mc_fused_summaries(
                    model, variables, (xx, meta0), jax.random.fold_in(key, i),
                    MC_SAMPLES, samples_per_step=k)
                dep = (h_norm[..., None] + mi_norm[..., None]) * 1e-9
                return xx + dep.astype(xx.dtype), acc + p_bar.sum()
            _, acc = jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0)))
            return acc
        dt = timed_slope(chained)
        print(f"RESULT samples_per_step={k} per_scan_ms="
              f"{dt * 1e3:.2f} scans_per_sec={1.0 / dt:.2f}", flush=True)


if __name__ == "__main__":
    main()
