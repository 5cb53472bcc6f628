"""Batched MC-20 serving throughput sweep (full scan path, per batch size).

Same chained-slope methodology as bench.py; each batch size is measured in
this one process sequentially (one TPU job at a time, output to stdout line
by line — never pipe TPU jobs).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_serving.py [B ...]
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from semanticlidarunc_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

MC_SAMPLES = 20
H, W = 64, 2048
N_POINTS = 1 << 17
N_ITERS = 30


def main():
    from semanticlidarunc_tpu import serve
    from semanticlidarunc_tpu.dataset.synthetic import make_scan
    from semanticlidarunc_tpu.models import registry
    from semanticlidarunc_tpu.ops.projection import pad_points
    from semanticlidarunc_tpu.utils import config as cfg_util

    sizes = [int(a) for a in sys.argv[1:]] or [2, 4, 8]
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
    key = jax.random.PRNGKey(0)

    import numpy as np
    for b in sizes:
        pts = np.zeros((b, N_POINTS, 4), np.float32)
        vld = np.zeros((b, N_POINTS), bool)
        for i in range(b):
            p, v = pad_points(make_scan(seed=i, n_beams=64, n_azimuth=2048),
                              N_POINTS)
            pts[i], vld[i] = p[:, :4], v
        points = jnp.asarray(pts)
        valid = jnp.asarray(vld)
        if b == sizes[0]:
            from semanticlidarunc_tpu import inference
            inputs0, _ = inference.preprocess_scan(points[0], valid[0], H, W,
                                                   cfg)
            variables = model.init({"params": key, "dropout": key}, *inputs0,
                                   train=False)
        run = serve.make_batched_mc_segmenter(model, variables, cfg, H, W,
                                              MC_SAMPLES)

        # Python-level serial chain: `run` may be the SPLIT two-executable
        # pipeline (serve.make_batched_mc_segmenter docstring) — wrapping
        # it in an outer jit would inline the stages back into one program
        # and hit the Mosaic-custom-call stall. The dependency chain stays
        # strict (next batch's points depend on this batch's outputs).
        @jax.jit
        def _absorb(p, acc, labels, h, mi):
            dep = (h.sum() + mi.sum()) * 1e-12
            return p + dep.astype(p.dtype), acc + labels.sum()

        def chained(n):
            p, acc = points, jnp.int32(0)
            for i in range(int(n)):
                labels, seg, h, mi = run(p, valid,
                                         jax.random.fold_in(key, i))
                p, acc = _absorb(p, acc, labels, h, mi)
            return acc

        def timed(n):
            t0 = time.perf_counter()
            int(chained(n))
            return time.perf_counter() - t0

        timed(1)
        t1 = min(timed(1) for _ in range(3))
        tn = min(timed(N_ITERS + 1) for _ in range(3))
        per_batch = (tn - t1) / N_ITERS
        print(json.dumps({"batch": b,
                          "ms_per_batch": round(per_batch * 1e3, 3),
                          "scans_per_sec": round(b / per_batch, 3)}),
              flush=True)


def knee():
    """Sweep ScanServer max_in_flight at a fixed batch size and print the
    per-stream self-reports — shows where extra pipeline depth stops paying
    (the knee). Run: ... tools/bench_serving.py --knee [batch_size]"""
    import numpy as np

    from semanticlidarunc_tpu import inference, serve
    from semanticlidarunc_tpu.dataset.synthetic import make_scan
    from semanticlidarunc_tpu.models import registry
    from semanticlidarunc_tpu.ops.projection import pad_points
    from semanticlidarunc_tpu.utils import config as cfg_util

    args = [a for a in sys.argv[1:] if a != "--knee"]
    b = int(args[0]) if args else 4
    n_scans = 48
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
    key = jax.random.PRNGKey(0)
    scans = [make_scan(seed=i, n_beams=64, n_azimuth=2048)[:, :4]
             for i in range(n_scans)]
    pts0, vld0 = pad_points(scans[0], N_POINTS)
    inputs0, _ = inference.preprocess_scan(jnp.asarray(pts0[:, :4]),
                                           jnp.asarray(vld0), H, W, cfg)
    variables = model.init({"params": key, "dropout": key}, *inputs0,
                           train=False)

    for depth in (1, 2, 3, 4):
        server = serve.ScanServer(model, variables, cfg, H, W,
                                  n_samples=MC_SAMPLES, batch_size=b,
                                  n_points=N_POINTS, use_mc=True,
                                  max_in_flight=depth)
        stream = zip(scans, (np.ones((len(s),), bool) for s in scans))
        n = sum(1 for _ in server.stream(stream))   # warm compile
        stream = zip(scans, (np.ones((len(s),), bool) for s in scans))
        n = sum(1 for _ in server.stream(stream))
        rep = server.last_report()
        assert n == n_scans
        print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                          for k, v in rep.items()}), flush=True)


if __name__ == "__main__":
    if "--knee" in sys.argv:
        knee()
    else:
        main()
