"""Ablation timings for the sub-2x regnet_y backbones (800mf, 3_2gf).

Measures the reference-protocol forward (bs=1, 128x2048, bf16, chained
slope — see bench.py for the tunnel methodology) under targeted ablations
to locate where the remaining milliseconds live:

  full        the production forward
  features    trunk+FPN+attention+upsample only (no decoder head)
  no_se       SqueezeExcite patched to identity (upper bound on SE cost)
  no_attn     attention disabled in the config
  merge64 /   grouped-conv merge targets 64 / 256 lanes instead of 128
  merge256

Run: PYTHONPATH=.:/root/.axon_site python tools/bench_regnet_ablation.py \
        regnet_y_800mf [variant ...]
Each variant costs a few minutes of XLA compile through the tunnel; output
is appended per-variant so a timeout loses nothing.
"""
from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

H, W = 128, 2048
N_ITERS = 30


def build(model_type, attention=True):
    from semanticlidarunc_tpu.models import registry
    from semanticlidarunc_tpu.utils import config as cfg_util

    cfg = cfg_util.with_extras({
        "dataset_name": "SemanticKitti",
        "model_settings": {
            "baseline": "Reichert", "model_type": model_type,
            "loss_function": "CE", "attention": attention,
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
    return model, variables, x, meta


def slope_ms(step):
    @jax.jit
    def chained(n):
        def body(i, carry):
            out = step(carry)
            return carry + out * 1e-12
        x = jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return x

    def timed(n):
        t0 = time.perf_counter()
        float(chained(jnp.asarray(n)))
        return time.perf_counter() - t0

    timed(1)
    t1 = min(timed(1) for _ in range(3))
    tn = min(timed(N_ITERS + 1) for _ in range(3))
    return (tn - t1) / N_ITERS * 1000.0


def measure(model_type, variant):
    from semanticlidarunc_tpu.models import backbones

    attention = variant != "no_attn"
    saved_call = backbones.SqueezeExcite.__call__
    saved_merge = backbones._merged_group_count
    try:
        if variant == "no_se":
            # identity: creates no params; init runs under the same patch
            backbones.SqueezeExcite.__call__ = lambda self, x: x
        elif variant in ("merge64", "merge256"):
            target = 64 if variant == "merge64" else 256
            backbones._merged_group_count = (
                lambda w, g, t=target: saved_merge(w, g, t))

        model, variables, x, meta = build(model_type, attention)

        if variant == "features":
            def step(eps):
                out = model.apply(variables, x + eps, meta, train=False,
                                  method=model.features)
                return out.astype(jnp.float32).mean()
        elif variant == "trunk":
            from semanticlidarunc_tpu.models.fpn import resize_nearest

            def trunk_only(m, xx, mm):
                if m.multi_scale_meta:
                    metas = [resize_nearest(mm, 0.5),
                             resize_nearest(mm, 0.25),
                             resize_nearest(mm, 0.125)]
                else:
                    metas = None
                x_in = jnp.concatenate([xx, mm], axis=-1).astype(m.dtype)
                feats = m.trunk(x_in, metas, train=False)
                return sum(f.astype(jnp.float32).mean() for f in feats)

            def step(eps):
                return model.apply(variables, x + eps, meta,
                                   method=trunk_only)
        else:
            def step(eps):
                out = model.apply(variables, x + eps, meta, train=False,
                                  stochastic=False)
                if isinstance(out, (list, tuple)):
                    out = out[0]
                return out.astype(jnp.float32).mean()

        ms = slope_ms(step)
        print(f"{model_type} {variant}: {ms:.2f} ms", flush=True)
        return ms
    finally:
        backbones.SqueezeExcite.__call__ = saved_call
        backbones._merged_group_count = saved_merge


def main():
    model_type = sys.argv[1] if len(sys.argv) > 1 else "regnet_y_800mf"
    variants = sys.argv[2:] or ["full", "no_se", "no_attn"]
    for v in variants:
        measure(model_type, v)


if __name__ == "__main__":
    main()
