"""Experiment: isolate the Pallas-in-big-jit composition anomaly.

Round-2 finding: ops/pallas_mc_tail.mc_tail_reduce runs all 20 MC samples in
1.6 ms standalone, but composing it into the full scan jit measured ~25 ms
PER ITERATION slower than the pure-XLA phase tail. This script measures one
variant per process (one TPU job at a time; append results to a file):

  full_xla            full scan path, XLA phase tail (production baseline)
  full_pallas         full scan path, Pallas tail composed in the one jit
  full_pallas_barrier same, with optimization_barrier between convs & kernel
  kernel_alone        chained kernel-only fori_loop (act resident)
  convs_alone         chained conv-scan (head_mc_tail_raw x T) fori_loop
  tailfull_xla        convs + XLA reduction only (no trunk) chained
  tailfull_pallas     convs + Pallas kernel only (no trunk) chained
  split_host          two jits (path-to-act | kernel+epilogue), host-chained
  kernel_host         kernel in its OWN jit, host-chained (round-2 baseline)
  full_xla_host       whole path in ONE jit, host-chained (no fori_loop)
  full_pallas_host    same with the Pallas tail — the decisive variant: if
                      the anomaly is fori_loop-specific this will be fast

Host-chaining is timing-valid through the tunnel: each call's input depends
on the previous call's output, so the device must execute the N dispatches
serially; one final scalar fetch syncs, and the (1, N+1) slope cancels the
constant RPC cost exactly as the fori_loop variant does.

Usage: python tools/exp_pallas_compose.py <variant>
Appends one JSON line to /tmp/pallas_exp.results.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

MC_SAMPLES = 20
H, W = 64, 2048
N_POINTS = 1 << 17
N_ITERS = 30
OUT = "/tmp/pallas_exp.results"


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
    variant = sys.argv[1]
    from semanticlidarunc_tpu import inference
    from semanticlidarunc_tpu.dataset.synthetic import make_scan
    from semanticlidarunc_tpu.models import registry
    from semanticlidarunc_tpu.ops import pallas_mc_tail as pmt
    from semanticlidarunc_tpu.ops.projection import pad_points
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
    pc = make_scan(seed=0, n_beams=64, n_azimuth=2048)
    pts_np, valid_np = pad_points(pc, N_POINTS)
    points = jnp.asarray(pts_np[:, :4])
    valid = jnp.asarray(valid_np)
    key = jax.random.PRNGKey(0)
    inputs0, flat0 = inference.preprocess_scan(points, valid, H, W, cfg)
    variables = model.init({"params": key, "dropout": key}, *inputs0,
                           train=False)

    def pallas_tail_parts(y1, barrier=False):
        """scan convs -> (act, ga, gb, wl, bl) exactly as mc_fused_summaries."""
        t, b = y1.shape[0], y1.shape[1]

        def conv_body(_, y_t):
            raw_t, a_t, b_t = model.apply(variables, y_t,
                                          method=model.head_mc_tail_raw)
            return None, (raw_t, a_t, b_t)

        _, (raw, ga, gb) = jax.lax.scan(conv_body, None, y1)
        h, w, s, s2, cp = raw.shape[2:]
        phases = s * s2
        act = raw.reshape(t, b, h * w, phases * cp)
        ga = jnp.tile(ga.reshape(t * b, cp), (1, phases)).reshape(
            t, b, phases * cp)
        gb = jnp.tile(gb.reshape(t * b, cp), (1, phases)).reshape(
            t, b, phases * cp)
        wl = variables["params"]["logits_conv"]["kernel"][0, 0]
        bl = variables["params"]["logits_conv"]["bias"]
        if barrier:
            act, ga, gb = jax.lax.optimization_barrier((act, ga, gb))
        return act, ga, gb, wl, bl, (b, h, w, s, s2)

    def pallas_epilogue(p_sum, h_sum, dims, ncls):
        b, h, w, s, s2 = dims
        p_sum = p_sum.reshape(b, h, w, s, s2, ncls)
        h_sum = h_sum.reshape(b, h, w, s, s2)
        return mc._mc_epilogue(p_sum, h_sum, MC_SAMPLES, 1e-12)

    def full_body(i, carry, tail):
        pts, acc = carry
        inputs, flat = inference.preprocess_scan(pts, valid, H, W, cfg)
        p_bar, h_norm, mi_norm = tail(tuple(inputs),
                                      jax.random.fold_in(key, i))
        seg = jnp.argmax(p_bar[0], axis=-1).astype(jnp.int32)
        pt_labels = inference.back_project(seg, flat)
        dep = (h_norm.sum() + mi_norm.sum()) * 1e-12
        return pts + dep.astype(pts.dtype), acc + pt_labels.sum()

    def chain_full(tail):
        @jax.jit
        def fn(n):
            _, acc = jax.lax.fori_loop(
                0, n, lambda i, c: full_body(i, c, tail),
                (points, jnp.int32(0)))
            return acc
        return fn

    def xla_tail(inputs, rng):
        return mc.mc_predictive_summaries(model, variables, inputs, rng,
                                          MC_SAMPLES)

    def make_pallas_tail(barrier):
        def tail(inputs, rng):
            fused = model.apply(variables, *inputs, train=False,
                                method=model.features)
            y1 = model.apply(variables, fused, rng, MC_SAMPLES,
                             method=model.head_mc_pre)
            act, ga, gb, wl, bl, dims = pallas_tail_parts(y1, barrier)
            p_sum, h_sum = pmt.mc_tail_reduce(act, ga, gb, wl, bl)
            return pallas_epilogue(p_sum, h_sum, dims, wl.shape[1])
        return tail

    # precomputed intermediates for the isolated variants
    x0, meta0 = inputs0
    fused0 = model.apply(variables, x0, meta0, train=False,
                         method=model.features)
    y10 = model.apply(variables, fused0, key, MC_SAMPLES,
                      method=model.head_mc_pre)
    act0, ga0, gb0, wl0, bl0, dims0 = jax.jit(
        lambda y: pallas_tail_parts(y))(y10)

    if variant == "full_xla":
        ms = timed_slope(chain_full(xla_tail)) * 1e3
    elif variant == "full_pallas":
        ms = timed_slope(chain_full(make_pallas_tail(False))) * 1e3
    elif variant == "full_pallas_barrier":
        ms = timed_slope(chain_full(make_pallas_tail(True))) * 1e3
    elif variant == "kernel_alone":
        @jax.jit
        def fn(n):
            def body(i, carry):
                a, acc = carry
                p_sum, h_sum = pmt.mc_tail_reduce(a, ga0, gb0, wl0, bl0)
                dep = (p_sum.sum() + h_sum.sum()) * 1e-12
                return a + dep.astype(a.dtype), acc + p_sum[0, 0, 0]
            _, acc = jax.lax.fori_loop(0, n, body, (act0, jnp.float32(0)))
            return acc.astype(jnp.int32)
        ms = timed_slope(fn) * 1e3
    elif variant == "convs_alone":
        @jax.jit
        def fn(n):
            def body(i, carry):
                y1, acc = carry
                act, ga, gb, wl, bl, dims = pallas_tail_parts(y1)
                dep = act.sum() * 1e-12
                return y1 + dep.astype(y1.dtype), acc + act[0, 0, 0, 0]
            _, acc = jax.lax.fori_loop(0, n, body, (y10, jnp.float32(0)))
            return acc.astype(jnp.int32)
        ms = timed_slope(fn) * 1e3
    elif variant in ("tailfull_xla", "tailfull_pallas"):
        use_pallas = variant.endswith("pallas")

        @jax.jit
        def fn(n):
            def body(i, carry):
                y1, acc = carry
                if use_pallas:
                    act, ga, gb, wl, bl, dims = pallas_tail_parts(y1)
                    p_sum, h_sum = pmt.mc_tail_reduce(act, ga, gb, wl, bl)
                    p_bar, h_norm, mi = pallas_epilogue(p_sum, h_sum, dims,
                                                        wl.shape[1])
                else:
                    t, b = y1.shape[0], y1.shape[1]

                    def sbody(carry, y_t):
                        p_sum, h_sum = carry
                        logits = model.apply(variables, y_t,
                                             method=model.head_post_phase)
                        logp = jax.nn.log_softmax(logits, axis=-1)
                        p = jnp.exp(logp)
                        hh = -jnp.sum(p * logp, axis=-1)
                        return (p_sum + p, h_sum + hh), None
                    probe = jax.eval_shape(
                        lambda v, y: model.apply(
                            v, y[0], method=model.head_post_phase),
                        variables, y1)
                    init = (jnp.zeros(probe.shape, jnp.float32),
                            jnp.zeros(probe.shape[:-1], jnp.float32))
                    (p_sum, h_sum), _ = jax.lax.scan(sbody, init, y1)
                    p_bar, h_norm, mi = mc._mc_epilogue(p_sum, h_sum,
                                                        MC_SAMPLES, 1e-12)
                dep = (h_norm.sum() + mi.sum()) * 1e-12
                return y1 + dep.astype(y1.dtype), acc + h_norm[0, 0, 0]
            _, acc = jax.lax.fori_loop(0, n, body, (y10, jnp.float32(0)))
            return acc.astype(jnp.int32)
        ms = timed_slope(fn) * 1e3
    elif variant == "kernel_host":
        @jax.jit
        def k1(a):
            p_sum, h_sum = pmt.mc_tail_reduce(a, ga0, gb0, wl0, bl0)
            dep = (p_sum.sum() + h_sum.sum()) * 1e-12
            return a + dep.astype(a.dtype), p_sum[0, 0, 0]

        def host_chain(n):
            a, out = act0, jnp.float32(0)
            for _ in range(int(n)):
                a, out = k1(a)
            return out.astype(jnp.int32)
        ms = timed_slope(host_chain) * 1e3
    elif variant in ("full_xla_host", "full_pallas_host"):
        tail = xla_tail if variant == "full_xla_host" \
            else make_pallas_tail(False)

        @jax.jit
        def one(pts, i):
            inputs, flat = inference.preprocess_scan(pts, valid, H, W, cfg)
            p_bar, h_norm, mi_norm = tail(tuple(inputs),
                                          jax.random.fold_in(key, i))
            seg = jnp.argmax(p_bar[0], axis=-1).astype(jnp.int32)
            pt_labels = inference.back_project(seg, flat)
            dep = (h_norm.sum() + mi_norm.sum()) * 1e-12
            return pts + dep.astype(pts.dtype), pt_labels.sum()

        def host_chain(n):
            pts, out = points, jnp.int32(0)
            for i in range(int(n)):
                pts, out = one(pts, jnp.int32(i))
            return out
        ms = timed_slope(host_chain) * 1e3
    elif variant == "split_host":
        @jax.jit
        def jit1(pts, dep):
            inputs, flat = inference.preprocess_scan(pts + dep, valid, H, W,
                                                     cfg)
            fused = model.apply(variables, *inputs, train=False,
                                method=model.features)
            y1 = model.apply(variables, fused, key, MC_SAMPLES,
                             method=model.head_mc_pre)
            act, ga, gb, wl, bl, dims = pallas_tail_parts(y1)
            return act, ga, gb, flat

        @jax.jit
        def jit2(act, ga, gb, flat):
            p_sum, h_sum = pmt.mc_tail_reduce(act, ga0, gb0, wl0, bl0)
            p_bar, h_norm, mi = pallas_epilogue(p_sum, h_sum, dims0,
                                                wl0.shape[1])
            seg = jnp.argmax(p_bar[0], axis=-1).astype(jnp.int32)
            from semanticlidarunc_tpu import inference as inf
            pt_labels = inf.back_project(seg, flat)
            return ((h_norm.sum() + mi.sum()) * 1e-12).astype(jnp.float32), \
                pt_labels.sum()

        def host_chain(n):
            dep = jnp.float32(0.0)
            acc = None
            for _ in range(int(n)):
                act, ga, gb, flat = jit1(points, dep)
                dep, acc = jit2(act, ga, gb, flat)
            return acc
        ms = timed_slope(host_chain) * 1e3
    else:
        raise SystemExit(f"unknown variant {variant}")

    line = json.dumps({"variant": variant, "ms_per_scan": round(ms, 3),
                       "platform": jax.devices()[0].platform})
    with open(OUT, "a") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
