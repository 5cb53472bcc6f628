"""Headline benchmark: SemanticKITTI scans/sec for 20-sample MC-dropout.

Runs on whatever accelerator JAX exposes (the driver runs it on one real TPU
chip). Measures the FULL north-star per-scan path, all inside one jit, bf16
compute (BASELINE.json "projection + forward"):

  padded raw points (131072, KITTI-scale)
    -> on-device spherical projection (sort + nearest-wins scatter)
    -> range/reflectivity/normals assembly (Scharr convs)
    -> flagship FPN forward (resnet50 backbone, the reference's
       headline-mIoU model) at 64x2048
    -> 20 MC-dropout samples through the weight-folded fused head with
       fused p_bar / entropy / mutual-information reductions
    -> argmax + back-projection to per-point labels

The MC path used here is the production inference surface: on TPU with a
qualifying model this is `inference.make_mc_scan_segmenter`'s SPLIT
pipeline (trunk executable + fused Pallas-tail executable, dispatched back
to back — see that function's docstring for why the split exists); other
configurations run `mc_predictive_summaries`, the same dispatcher the
Trainer/Tester eval step uses. A secondary model-only number
(pre-projected tensors in, no projection/back-projection) is reported for
comparison with the reference's forward-only protocol.

Timing methodology: this environment reaches the TPU through an RPC tunnel
where `block_until_ready` does NOT wait for device execution and a host fetch
costs ~30 ms. We therefore chain N dependent iterations — inside one compiled
fori_loop for single-executable paths, or as a Python loop of back-to-back
dispatches for the split pipeline (each iteration's input depends on the
previous output either way, so nothing can be elided or overlapped, and the
split's per-dispatch overhead is included) — and fetch a single scalar at
the end; per-scan time is the slope between a 1-iteration and an
N+1-iteration run, which cancels the constant RPC cost.

Baseline derivation (see BASELINE.md): the reference's resnet50 forward is
43.7 ms at bs=1 on 128x2048 input (Images/plot_inference_time.py:7) on an
UNSPECIFIED GPU (docker targets RTX/A-series); KITTI scans are 64x2048 (half
the rows), and reference MC-dropout is T sequential full forwards
(src/utils/mc_dropout.py:114-119), so that GPU's 20-sample rate is
~ 1000 / (43.7 / 2 * 20) = 2.29 scans/s — and it still excludes the CPU-side
projection the full path pays. The driver target is >= 5x an *H100* running
the same PyTorch code; an H100 is plausibly ~2.5x the reference GPU, so
`vs_baseline` is computed against the H100-adjusted 2.29 * 2.5 = 5.72
scans/s (the raw reference-GPU ratio is also reported).

Prints exactly one JSON line.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# Persistent compilation cache: fresh XLA compiles through this
# environment's remote-compile tunnel cost minutes; caching makes repeat
# bench runs (and the driver's end-of-round run) near-instant to warm up.
# On TPU the cache lives in the COMMITTED bench_cache/ directory so it
# rides the repo into the driver's clean checkout (round 4 lesson: the
# gitignored .jax_cache/ left the driver's bench run fully cold, ~21 min
# of compile against its budget). Sharing this dir across hosts is safe
# because it only ever holds TPU executables — the host-fingerprint
# keying in compile_cache exists for the CPU AOT SIGILL hazard, which a
# TPU-only cache cannot hit.
from semanticlidarunc_tpu.utils import compile_cache  # noqa: E402

if jax.default_backend() == "tpu":
    compile_cache.enable(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_cache"))
else:
    compile_cache.enable()

_T0 = time.monotonic()


def _mark(msg: str) -> None:
    """Phase timestamps on STDERR (stdout stays the one-JSON-line contract):
    lets a driver log show where the wall budget went when a metric is null."""
    print(f"[bench +{time.monotonic() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


MC_SAMPLES = 20
H, W = 64, 2048
N_POINTS = 1 << 17                      # 131072 = KITTI-scale point count
TRAIN_BS = 8                            # reference KITTI 64x2048 batch size
REFERENCE_GPU_SCANS_PER_SEC = 2.29
H100_FACTOR = 2.5                       # assumed H100 speedup over that GPU
BASELINE_SCANS_PER_SEC = REFERENCE_GPU_SCANS_PER_SEC * H100_FACTOR
# 20 chained iterations: at ~65 scans/s the measurement itself is <0.5 s —
# compile time is the entire cost, so more repeats buy no precision
N_ITERS = 20
# total wall budget (s) before we skip the optional metrics so the primary
# metric always prints inside the driver's timeout. Round-4 driver evidence:
# its run was still being recorded after ~1580 s of compile, so the old 520 s
# self-limit skipped the optional metrics far too early.
BUDGET_S = float(os.environ.get("SLU_BENCH_BUDGET_S", "1500"))


def _timed_slope(chained_fn, n_iters: int) -> float:
    """Per-iteration seconds via the (1, N+1)-run slope (cancels RPC cost)."""
    def timed(n: int) -> float:
        t0 = time.perf_counter()
        int(chained_fn(jnp.asarray(n)))  # single scalar fetch -> full sync
        return time.perf_counter() - t0

    timed(1)  # compile + warm caches
    t1 = min(timed(1) for _ in range(3))
    tn = min(timed(n_iters + 1) for _ in range(3))
    return (tn - t1) / n_iters


def main():
    from semanticlidarunc_tpu import inference
    from semanticlidarunc_tpu.dataset.synthetic import make_scan
    from semanticlidarunc_tpu.models import fastinit, registry
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

    # KITTI-scale synthetic scan: 64 beams x 2048 azimuth = 131072 points
    pc = make_scan(seed=0, n_beams=64, n_azimuth=2048)
    pts_np, valid_np = pad_points(pc, N_POINTS)
    points = jnp.asarray(pts_np[:, :4])
    valid = jnp.asarray(valid_np)

    key = jax.random.PRNGKey(0)
    inputs0, _ = inference.preprocess_scan(points, valid, H, W, cfg)
    _mark("preprocess done, materializing params")
    # eval_shape + host-side materialization instead of a compiled init run
    # (the traced init alone cost 334 s in the round-4 driver run); random
    # He-scaled weights are equivalent for throughput measurement
    variables = fastinit.random_variables(model, inputs0, key)
    _mark("params materialized")

    # NOTE: every jitted function below takes `variables` (and any other
    # large array) as an ARGUMENT, never as a Python closure. A closed-over
    # array is embedded into the lowered module as a constant: with resnet50
    # weights that means a ~430 MB module, 2-8 MINUTES of trace+lower per
    # process (measured on this 1-core host), a ~430 MB persistent-cache
    # entry, and a cache key that changes with unrelated line edits.
    # Weights-as-args keeps modules small and trace+lower in seconds.

    # -- primary: full scan path (projection -> MC-20 -> back-projection) --
    @jax.jit
    def chained_full_impl(n, variables):
        def body(i, carry):
            pts, acc = carry
            inputs, flat = inference.preprocess_scan(pts, valid, H, W, cfg)
            p_bar, h_norm, mi_norm = mc.mc_predictive_summaries(
                model, variables, tuple(inputs), jax.random.fold_in(key, i),
                MC_SAMPLES)
            seg = jnp.argmax(p_bar[0], axis=-1).astype(jnp.int32)
            pt_labels = inference.back_project(seg, flat)
            # feed the result back into the input: strict serial dependency
            dep = (h_norm.sum() + mi_norm.sum()) * 1e-12
            return pts + dep.astype(pts.dtype), acc + pt_labels.sum()
        _, acc = jax.lax.fori_loop(0, n, body, (points, jnp.int32(0)))
        return acc

    def chained_full(n):
        return chained_full_impl(n, variables)

    # -- secondary: model-only (pre-projected tensors, reference protocol) --
    x0, meta0 = inputs0

    @jax.jit
    def chained_model_impl(n, variables):
        def body(i, carry):
            xx, acc = carry
            p_bar, h_norm, mi_norm = mc.mc_predictive_summaries(
                model, variables, (xx, meta0), jax.random.fold_in(key, i),
                MC_SAMPLES)
            preds = jnp.argmax(p_bar, -1)
            dep = (h_norm[..., None] + mi_norm[..., None]) * 1e-9
            return xx + dep.astype(xx.dtype), acc + preds.sum()
        _, acc = jax.lax.fori_loop(0, n, body, (x0, jnp.int32(0)))
        return acc

    def chained_model(n):
        return chained_model_impl(n, variables)

    # -- split Pallas-tail pipeline (the production inference path on TPU:
    # inference.make_mc_scan_segmenter) — two executables dispatched back
    # to back per scan. Chained at the Python level with a strict serial
    # dependency (next scan's points depend on this scan's uncertainty
    # outputs), so per-iteration dispatch overhead is INCLUDED and nothing
    # overlaps; the final scalar fetch syncs everything.
    use_split = (jax.default_backend() == "tpu"
                 and mc.can_pallas_tail(model, H, W))
    if use_split:
        # same two stages make_mc_scan_segmenter builds (verified identical
        # by tests), with the serial-dependency absorption folded into
        # stage 1 so each scan costs exactly the product's two dispatches
        mega_f = mc.can_megatail(model, H, W)

        @jax.jit
        def full_stage1(variables, pts, valid, rng, h_prev, mi_prev):
            dep = (h_prev.sum() + mi_prev.sum()) * 1e-12
            pts = pts + dep.astype(pts.dtype)
            inputs, flat = inference.preprocess_scan(pts, valid, H, W, cfg)
            fused = model.apply(variables, *inputs, train=False,
                                method=model.features)
            if mega_f:
                # dec1 runs inside the mega-kernel (fused-dec1 mode): the
                # stage boundary carries the 33 MB pyramid, not the 168 MB
                # T*C1 activations — measured 14.2 -> 12.4 ms model-only
                return fused, flat
            return model.apply(variables, fused, rng, MC_SAMPLES,
                               method=model.head_mc_pre), flat

        @jax.jit
        def full_stage2(variables, y1, flat, rng):
            if mega_f:
                p_bar, h_norm, mi_norm = mc.mc_megatail_fused_summaries(
                    model, variables, y1, rng, MC_SAMPLES)
            else:
                p_bar, h_norm, mi_norm = mc.mc_pallas_tail_summaries(
                    model, variables, y1, MC_SAMPLES)
            seg = jnp.argmax(p_bar[0], axis=-1).astype(jnp.int32)
            labels = inference.back_project(seg, flat)
            return labels.sum(), h_norm[0], mi_norm[0]

        def chained_full(n):
            acc = jnp.int32(0)
            h_prev = jnp.zeros((H, W), jnp.float32)
            mi_prev = jnp.zeros((H, W), jnp.float32)
            for i in range(int(n)):
                rng_i = jax.random.fold_in(key, i)
                y1, flat = full_stage1(variables, points, valid, rng_i,
                                       h_prev, mi_prev)
                s, h_prev, mi_prev = full_stage2(variables, y1, flat, rng_i)
                acc = acc + s
            return acc

        mega = mc.can_megatail(model, H, W)

        @jax.jit
        def stage_model_trunk(variables, xx, i):
            fused = model.apply(variables, xx, meta0, train=False,
                                method=model.features)
            if mega:
                return fused
            return model.apply(
                variables, fused, jax.random.fold_in(key, i), MC_SAMPLES,
                method=model.head_mc_pre)

        @jax.jit
        def stage_model_tail(variables, xx, y1, i):
            if mega:
                p_bar, h_norm, mi_norm = mc.mc_megatail_fused_summaries(
                    model, variables, y1, jax.random.fold_in(key, i),
                    MC_SAMPLES)
            else:
                p_bar, h_norm, mi_norm = mc.mc_pallas_tail_summaries(
                    model, variables, y1, MC_SAMPLES)
            preds = jnp.argmax(p_bar, -1)
            dep = (h_norm[..., None] + mi_norm[..., None]) * 1e-9
            return xx + dep.astype(xx.dtype), preds.sum()

        def chained_model(n):
            xx, acc = x0, jnp.int32(0)
            for i in range(int(n)):
                y1 = stage_model_trunk(variables, xx, i)
                xx, s = stage_model_tail(variables, xx, y1, i)
                acc = acc + s
            return acc

    # metric priority under the wall budget: (1) primary e2e, (2) train-step
    # throughput (VERDICT r2 #6 — train-path regressions must be externally
    # visible), (3) the secondary model-only number if time remains
    _mark("measuring primary e2e")
    per_scan_full = _timed_slope(chained_full, N_ITERS)
    _mark(f"primary e2e done: {1.0 / per_scan_full:.1f} scans/s")

    # bs8 train-step throughput in a subprocess with the remaining budget
    # (minus a reserve for the model-only metric) so a slow compile can
    # never cost us the primary metric
    train_scans = None
    remaining = BUDGET_S - (time.monotonic() - _T0) - 20.0
    _mark(f"train-step subprocess: remaining budget {remaining:.0f}s")
    if remaining > 60.0:
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--train-step"],
                capture_output=True, text=True, timeout=remaining,
                env=os.environ)
            for line in out.stdout.splitlines():
                if line.startswith("{"):
                    train_scans = json.loads(line).get("train_scans_per_sec")
        except (subprocess.TimeoutExpired, Exception):
            train_scans = None

    per_scan_model = None
    _mark(f"model-only: remaining budget "
          f"{BUDGET_S - (time.monotonic() - _T0):.0f}s")
    if BUDGET_S - (time.monotonic() - _T0) > 30.0:
        per_scan_model = _timed_slope(chained_model, N_ITERS)
        _mark("model-only done")

    scans_per_sec = 1.0 / per_scan_full
    print(json.dumps({
        "metric": "kitti_mc20_e2e_scans_per_sec",
        "value": round(scans_per_sec, 3),
        "unit": "scans/s/chip",
        "vs_baseline": round(scans_per_sec / BASELINE_SCANS_PER_SEC, 3),
        "model_only_scans_per_sec": (None if per_scan_model is None
                                     else round(1.0 / per_scan_model, 3)),
        "train_bs8_scans_per_sec": train_scans,
        "vs_reference_gpu": round(
            scans_per_sec / REFERENCE_GPU_SCANS_PER_SEC, 3),
        "baseline_note": ("baseline = reference-GPU 2.29 scans/s (forward "
                          "only) x assumed H100 factor 2.5; e2e value also "
                          "includes on-device projection+back-projection "
                          "the baseline excludes"),
    }))


def train_step_bench():
    """bs8 resnet50 bf16 CE+Lovász train-step scans/s (chained-slope inside
    one jit, same methodology as the inference metrics). Run as a
    subprocess of main() so its compile time can never eat the primary
    metric's budget. Reference train protocol: trainer.py:455-787."""
    from semanticlidarunc_tpu.dataset.pipeline import (DataLoader,
                                                       SyntheticDataset)
    from semanticlidarunc_tpu.models import fastinit, registry
    from semanticlidarunc_tpu.train.trainer import Trainer
    from semanticlidarunc_tpu.utils import config as cfg_util

    cfg = cfg_util.with_extras({
        "dataset_name": "SemanticKitti",
        "model_settings": {
            "baseline": "Reichert", "model_type": "resnet50",
            "loss_function": "CE", "attention": True,
            "multi_scale_meta": True, "normals": True, "reflectivity": True,
            "projection": [H, W],
        },
        "train_params": {"learning_rate": 1e-3, "learning_rate_min": 1e-5,
                         "batch_size": TRAIN_BS, "num_epochs": 1,
                         "weight_decay": 1e-4, "num_warmup_epochs": 0},
    })
    model = registry.build_model(cfg, dtype=jnp.bfloat16)
    ds = SyntheticDataset(n_scans=TRAIN_BS, projection=(H, W), n_beams=64,
                          n_azimuth=2048)
    loader = DataLoader(ds, batch_size=TRAIN_BS, shuffle=False)
    tr = Trainer(model, cfg)
    batch = tr.place_batch(next(iter(loader)))
    inputs = registry.set_model_inputs(
        jnp.asarray(batch["range"]), jnp.asarray(batch["reflectivity"]),
        jnp.asarray(batch["xyz"]), jnp.asarray(batch["normals"]), cfg)
    variables = fastinit.random_variables(model, inputs, jax.random.PRNGKey(0))
    state = tr.create_state(batch, num_epochs=1, steps_per_epoch=1,
                            variables=variables)
    wv = tr._weights_vec()
    key = jax.random.PRNGKey(0)

    # state AND batch enter as jit ARGUMENTS (not closures) — see the
    # weights-as-args note in main(): closed-over they become ~900 MB of
    # module constants (params + 2 Adam moments) and minutes of lowering
    @jax.jit
    def chained(n, state, batch):
        def body(i, st):
            st2, _ = tr._train_step(st, batch, wv,
                                    jax.random.fold_in(key, i))
            return st2
        st = jax.lax.fori_loop(0, n, body, state)
        # reduce over params so NOTHING in the chain is dead code
        return jax.tree_util.tree_reduce(
            lambda a, l: a + l.sum().astype(jnp.float32), st.params,
            jnp.float32(0.0))

    def timed(n):
        t0 = time.perf_counter()
        float(chained(jnp.asarray(n), state, batch))
        return time.perf_counter() - t0

    timed(1)
    t1 = min(timed(1) for _ in range(2))
    tn = min(timed(11) for _ in range(2))
    per_step = (tn - t1) / 10
    print(json.dumps(
        {"train_scans_per_sec": round(TRAIN_BS / per_step, 3),
         "train_step_ms": round(per_step * 1e3, 3)}))


if __name__ == "__main__":
    if "--train-step" in sys.argv:
        train_step_bench()
    else:
        main()
