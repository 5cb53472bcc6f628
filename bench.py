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
import signal
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# Persistent compilation cache: fresh XLA compiles through this
# environment's remote-compile tunnel cost minutes; caching makes repeat
# bench runs (and the driver's end-of-round run) near-instant to warm up.
#
# CACHE-KEY FRAGILITY (measured round 5): programs containing Mosaic/Pallas
# custom calls embed the CALLER's source locations inside the serialized
# kernel payload, where jax's strip-debuginfo canonicalization cannot reach
# — so their cache keys change whenever any file on the trace path (this
# file, prob/mc_dropout.py, ops/pallas_mc_megatail.py, ...) shifts line
# numbers, and each such program recompiles ~530 s through the tunnel.
# Pure-XLA programs canonicalize fine and survive edits. Consequence: after
# editing ANY of those files, re-run bench.py once on the TPU and commit the
# refreshed bench_cache/ TOGETHER with the source change.
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

if os.environ.get("SLU_BENCH_DEBUG"):
    import logging
    jax.config.update("jax_explain_cache_misses", True)
    logging.basicConfig(level=logging.INFO)
    logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
    logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)

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
# 40 chained iterations: at ~65 scans/s that is ~0.6 s of pure device time
# per endpoint run — enough signal to clear the tunnel's fetch-RTT jitter
# once the min-of-4 repeats pin both endpoints to the RTT floor
N_ITERS = 40
# total wall budget (s) before we skip the optional metrics so the primary
# metric always prints inside the driver's timeout. Round-4 driver evidence:
# its run was still being recorded after ~1580 s of compile, so the old 520 s
# self-limit skipped the optional metrics far too early.
BUDGET_S = float(os.environ.get("SLU_BENCH_BUDGET_S", "1500"))

# The one JSON line this process owes its caller, updated after every phase.
# A SIGTERM/SIGINT (e.g. the driver's `timeout`) prints the metrics measured
# SO FAR instead of dying silently — round-5 lesson: a kill during the last
# optional phase used to discard an already-measured primary metric.
_RESULT: dict = {}
_PRINTED = False


def _emit() -> None:
    global _PRINTED
    if not _PRINTED and _RESULT:
        _PRINTED = True
        print(json.dumps(_RESULT), flush=True)


def _on_term(signum, frame):
    _mark(f"signal {signum}: emitting partial result")
    _emit()
    os._exit(0)


signal.signal(signal.SIGTERM, _on_term)
signal.signal(signal.SIGINT, _on_term)


def _timed_slope(chained_fn, n_iters: int, repeats: int = 4) -> float:
    """Per-iteration seconds via the (1, N+1)-run slope (cancels RPC cost).

    min() over `repeats` runs of each endpoint: the tunnel's fetch RTT
    jitters by up to ~1 s, and the min-floor is what is stable — measured
    round 5, 2 repeats gave a 3x spread on the train-step metric."""
    def timed(n: int) -> float:
        t0 = time.perf_counter()
        int(chained_fn(jnp.asarray(n)))  # single scalar fetch -> full sync
        dt = time.perf_counter() - t0
        _mark(f"  timed({n}) = {dt:.3f}s")
        return dt

    timed(1)  # compile + warm caches
    t1 = min(timed(1) for _ in range(repeats))
    tn = min(timed(n_iters + 1) for _ in range(repeats))
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
    # visible), (3) the secondary model-only number if time remains.
    #
    # ALL phases run in-process and sequential: the TPU chip is held
    # exclusively by this process, so a subprocess can never acquire it
    # while the parent lives (measured round 5 — the round-4 train-step
    # subprocess died on backend init every time). Each optional phase is
    # gated on the remaining budget with a cold/warm compile estimate, and
    # the SIGTERM handler guarantees whatever has been measured still
    # prints if an external timeout fires mid-phase.
    def _remaining() -> float:
        return BUDGET_S - (time.monotonic() - _T0)

    def _publish(scans_per_sec: float) -> None:
        _RESULT.update({
            "metric": "kitti_mc20_e2e_scans_per_sec",
            "value": round(scans_per_sec, 3),
            "unit": "scans/s/chip",
            "vs_baseline": round(scans_per_sec / BASELINE_SCANS_PER_SEC, 3),
            "vs_reference_gpu": round(
                scans_per_sec / REFERENCE_GPU_SCANS_PER_SEC, 3),
        })
        _RESULT.setdefault("model_only_scans_per_sec", None)
        _RESULT.setdefault("train_bs8_scans_per_sec", None)
        _RESULT.setdefault("baseline_note", (
            "baseline = reference-GPU 2.29 scans/s (forward only) x assumed "
            "H100 factor 2.5; e2e value also includes on-device "
            "projection+back-projection the baseline excludes"))

    _mark("measuring primary e2e" + (" (split pipeline)" if use_split else ""))
    t_phase = time.monotonic()
    per_scan_full = _timed_slope(chained_full, N_ITERS)
    cold = (time.monotonic() - t_phase) > 200.0   # no warm cache this run
    scans_per_sec = 1.0 / per_scan_full
    _mark(f"primary e2e done: {scans_per_sec:.1f} scans/s")
    if use_split:
        _RESULT["e2e_split_scans_per_sec"] = round(scans_per_sec, 3)
    _publish(scans_per_sec)

    # The fused single-executable variant of the same full path (the
    # make_batched_mc_segmenter fallback pipeline): zero per-scan dispatch
    # overhead, so it wins over the split Pallas pipeline when the RPC
    # link to the chip is slow; the split wins on fast links. Headline =
    # the better of the two product pipelines under current conditions.
    if use_split and _remaining() > (600.0 if cold else 120.0):
        _mark("measuring fused single-program e2e variant")
        per_scan_fused = _timed_slope(
            lambda n: chained_full_impl(n, variables), N_ITERS)
        fused_scans = 1.0 / per_scan_fused
        _mark(f"fused e2e variant done: {fused_scans:.1f} scans/s")
        _RESULT["e2e_fused_scans_per_sec"] = round(fused_scans, 3)
        if fused_scans > scans_per_sec:
            scans_per_sec = fused_scans
            _publish(scans_per_sec)

    if _remaining() > (550.0 if cold else 150.0):
        _mark("measuring bs8 train-step throughput")
        try:
            train_scans, step_ms = measure_train_step()
            _RESULT["train_bs8_scans_per_sec"] = round(train_scans, 3)
            _RESULT["train_step_ms"] = round(step_ms, 3)
            _mark(f"train-step done: {train_scans:.1f} scans/s")
        except Exception as e:                    # pragma: no cover
            _mark(f"train-step phase failed: {e!r}")
    else:
        _mark(f"skipping train-step (remaining {_remaining():.0f}s)")

    if _remaining() > (500.0 if cold else 90.0):
        _mark("measuring model-only")
        per_scan_model = _timed_slope(chained_model, N_ITERS)
        _RESULT["model_only_scans_per_sec"] = round(1.0 / per_scan_model, 3)
        _mark("model-only done")
    else:
        _mark(f"skipping model-only (remaining {_remaining():.0f}s)")

    _emit()


def measure_train_step() -> tuple[float, float]:
    """bs8 resnet50 bf16 CE+Lovász train-step (scans/s, step ms) via the
    chained-slope methodology the inference metrics use. Called in-process
    by main() (the chip is exclusive to this process) and by the
    standalone `--train-step` CLI mode. Reference train protocol:
    trainer.py:455-787."""
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
        dt = time.perf_counter() - t0
        _mark(f"  train timed({n}) = {dt:.3f}s")
        return dt

    # 30-step chain + min-of-4: at ~0.1 s/step the 30-step signal (~3 s)
    # must clear the tunnel's ~1 s fetch-RTT jitter (round-5 measurement:
    # 10-step chains with 2 repeats spread 3x run-to-run)
    timed(1)
    t1 = min(timed(1) for _ in range(4))
    tn = min(timed(31) for _ in range(4))
    per_step = (tn - t1) / 30
    return TRAIN_BS / per_step, per_step * 1e3


def train_step_bench():
    scans, step_ms = measure_train_step()
    print(json.dumps({"train_scans_per_sec": round(scans, 3),
                      "train_step_ms": round(step_ms, 3)}))


if __name__ == "__main__":
    if "--train-step" in sys.argv:
        train_step_bench()
    else:
        main()
