"""Per-component timing breakdown of the headline MC-20 scan path.

Uses the same chained-slope methodology as bench.py (serial dependency
inside one jit; slope between 1 and N+1 iterations cancels the RPC cost of
the tunneled TPU). Reports per-scan milliseconds for:

  - projection+assembly (preprocess_scan)
  - trunk (features)
  - head_mc_pre (weight-folded wide dec1 conv)
  - per-sample tail x T (head_post + softmax/entropy accumulation)
  - back-projection
  - full path (cross-check vs sum of parts)

Run: python tools/profile_breakdown.py [model_type]
"""
from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

MC_SAMPLES = 20
H, W = 64, 2048
N_POINTS = 1 << 17
N_ITERS = 30


def timed_slope(fn, n_iters=N_ITERS):
    def timed(n):
        t0 = time.perf_counter()
        int(fn(jnp.asarray(n)))
        return time.perf_counter() - t0
    timed(1)
    t1 = min(timed(1) for _ in range(3))
    tn = min(timed(n_iters + 1) for _ in range(3))
    return (tn - t1) / n_iters


def main():
    from semanticlidarunc_tpu import inference
    from semanticlidarunc_tpu.dataset.synthetic import make_scan
    from semanticlidarunc_tpu.models import registry
    from semanticlidarunc_tpu.ops.projection import pad_points
    from semanticlidarunc_tpu.prob import mc_dropout as mc
    from semanticlidarunc_tpu.utils import config as cfg_util

    model_type = sys.argv[1] if len(sys.argv) > 1 else "resnet50"
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

    pc = make_scan(seed=0, n_beams=64, n_azimuth=2048)
    pts_np, valid_np = pad_points(pc, N_POINTS)
    points = jnp.asarray(pts_np[:, :4])
    valid = jnp.asarray(valid_np)
    key = jax.random.PRNGKey(0)
    inputs0, flat0 = inference.preprocess_scan(points, valid, H, W, cfg)
    variables = model.init({"params": key, "dropout": key}, *inputs0,
                           train=False)
    x0, meta0 = inputs0
    fused0 = model.apply(variables, x0, meta0, train=False,
                         method=model.features)
    y10 = model.apply(variables, fused0, key, MC_SAMPLES,
                      method=model.head_mc_pre)
    seg0 = jnp.zeros((H, W), jnp.int32)

    def chain(body, init):
        @jax.jit
        def fn(n):
            out = jax.lax.fori_loop(0, n, body, init)
            return jax.tree_util.tree_reduce(
                lambda a, l: a + (l.sum() if l.dtype != jnp.bool_ else 0),
                out, jnp.float32(0)).astype(jnp.int32)
        return fn

    results = {}

    # 1. preprocess (projection + normals assembly)
    def body_pre(i, pts):
        (x, meta), flat = inference.preprocess_scan(pts, valid, H, W, cfg)
        dep = (x.sum() + meta.sum()).astype(pts.dtype) * 1e-12
        return pts + dep
    results["preprocess"] = timed_slope(chain(body_pre, points))

    # 1b. projection indices + scatter only (no normals/assembly)
    from semanticlidarunc_tpu.ops.projection import spherical_projection

    def body_proj(i, pts):
        img = spherical_projection(pts, valid, H, W)
        return pts + img.sum() * 1e-12
    results["projection_only"] = timed_slope(chain(body_proj, points))

    # 2. trunk
    def body_trunk(i, carry):
        x, meta = carry
        fused = model.apply(variables, x, meta, train=False,
                            method=model.features)
        return (x + fused.sum().astype(x.dtype) * 1e-12, meta)
    results["trunk"] = timed_slope(chain(body_trunk, (x0, meta0)))

    # 3. head_mc_pre (wide dec1 conv)
    def body_pre2(i, fused):
        y1 = model.apply(variables, fused, jax.random.fold_in(key, i),
                         MC_SAMPLES, method=model.head_mc_pre)
        return fused + y1.sum().astype(fused.dtype) * 1e-12
    results["head_mc_pre"] = timed_slope(chain(body_pre2, fused0))

    # 4. per-sample tail x T (scan over head_post + reductions)
    def body_tail(i, y1):
        def sbody(carry, y):
            p_sum, h_sum = carry
            logits = model.apply(variables, y, method=model.head_post)
            logp = jax.nn.log_softmax(logits, axis=-1)
            p = jnp.exp(logp)
            h = -jnp.sum(p * logp, axis=-1)
            return (p_sum + p, h_sum + h), None
        probe = jax.eval_shape(
            lambda v, y: model.apply(v, y[0], method=model.head_post),
            variables, y1)
        init = (jnp.zeros(probe.shape, jnp.float32),
                jnp.zeros(probe.shape[:-1], jnp.float32))
        (p_sum, h_sum), _ = jax.lax.scan(sbody, init, y1)
        return y1 + (p_sum.sum() + h_sum.sum()).astype(y1.dtype) * 1e-12
    results["tail_x%d" % MC_SAMPLES] = timed_slope(chain(body_tail, y10))

    # 4b. tail as one batched call (t*b fold) for comparison
    def body_tailb(i, y1):
        t, b = y1.shape[0], y1.shape[1]
        logits = model.apply(
            variables, y1.reshape((t * b,) + y1.shape[2:]),
            method=model.head_post)
        logp = jax.nn.log_softmax(logits, axis=-1)
        p = jnp.exp(logp)
        p_bar = p.reshape((t, b) + p.shape[1:]).mean(0)
        return y1 + p_bar.sum().astype(y1.dtype) * 1e-12
    results["tail_batched"] = timed_slope(chain(body_tailb, y10))

    # 5. back-projection
    def body_back(i, seg):
        lbl = inference.back_project(seg, flat0)
        return seg + (lbl.sum() * 0).astype(seg.dtype)
    results["back_project"] = timed_slope(chain(body_back, seg0))

    # 6. full path
    def body_full(i, carry):
        pts, acc = carry
        inputs, flat = inference.preprocess_scan(pts, valid, H, W, cfg)
        p_bar, h_norm, mi_norm = mc.mc_predictive_summaries(
            model, variables, tuple(inputs), jax.random.fold_in(key, i),
            MC_SAMPLES)
        seg = jnp.argmax(p_bar[0], axis=-1).astype(jnp.int32)
        pt_labels = inference.back_project(seg, flat)
        dep = (h_norm.sum() + mi_norm.sum()) * 1e-12
        return pts + dep.astype(pts.dtype), acc + pt_labels.sum()
    results["full"] = timed_slope(chain(body_full, (points, jnp.int32(0))))

    print(f"model={model_type} T={MC_SAMPLES} {H}x{W} "
          f"dev={jax.devices()[0].platform}")
    for k, v in results.items():
        print(f"  {k:>18}: {v * 1e3:8.3f} ms/scan")
    parts = (results["preprocess"] + results["trunk"] +
             results["head_mc_pre"] + results["tail_x%d" % MC_SAMPLES] +
             results["back_project"])
    print(f"  {'sum-of-parts':>18}: {parts * 1e3:8.3f} ms/scan")


if __name__ == "__main__":
    main()
