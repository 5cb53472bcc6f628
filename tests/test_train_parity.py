"""Training-step parity vs the ACTUAL reference Trainer.

Runs N optimizer steps of the reference PyTorch Trainer
(/root/reference/src/models/trainer.py:455-787 — torch CPU, full Dirichlet
loss zoo + AdaptiveLossBalancer + comp/wle/kl schedules + AdamW) on a fixed
tiny synthetic set, from an init converted into this framework's flax model,
and asserts:

  1. per-step TOTAL LOSS trajectories agree,
  2. the post-training PARAMETERS agree leaf-by-leaf (the strongest check:
     any divergence in alpha maps, any of the 8 loss terms, balancer weight
     updates, weight schedules, LR, or AdamW math compounds into the params),
  3. the balancer/schedule weights agree at the end.

This is the strongest training-math parity evidence obtainable without real
SemanticKITTI scans (no data exists in this environment); forward parity and
metric parity are covered by test_torch_parity.py / test_metric_parity.py.

Known, accepted sources of small divergence: float32 reduction order,
optimizer epsilon placement, and the GradNorm reference-param mask (the
reference's name-based exclude accidentally KEEPS Sequential-indexed norm
scales, /root/reference/src/utils/grad_norm.py:269 — our mask excludes all
norm scales, a ~0.1%-of-norm difference on this model).
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_SRC = "/root/reference/src"

sys.path.insert(0, os.path.dirname(__file__))
from test_torch_parity import TorchReichertOracle  # noqa: E402

H, W = 32, 64
NUM_CLASSES_EXTRAS = 7          # Dirichlet: 6 data classes + 1 (ref :53-57)
N_SCANS = 4
BATCH = 2
EPOCHS = int(os.environ.get("PARITY_EPOCHS", "4"))  # x2 steps each
LR = 1e-3
WD = 1e-4


def _cfg():
    return {
        "dataset_name": "SemanticKitti",
        "model_settings": {
            "baseline": "Reichert", "model_type": "resnet18",
            "loss_function": "Dirichlet", "attention": True,
            "multi_scale_meta": True, "normals": True, "reflectivity": True,
            "use_mc_sampling": 0, "projection": [H, W],
        },
        "model_weights": {},     # reference defaults: all 8 terms active
        "train_params": {
            "learning_rate": LR, "learning_rate_min": LR,  # flat LR
            "batch_size": BATCH, "num_epochs": EPOCHS,
            "num_warmup_epochs": 0, "weight_decay": WD,
        },
        "logging_settings": {"test_every_nth_epoch": 1000},
        "extras": {
            "num_classes": NUM_CLASSES_EXTRAS,
            "class_names": [f"c{i}" for i in range(NUM_CLASSES_EXTRAS)],
            "class_colors": {},
            "save_path": "",
        },
    }


def _synthetic_batches():
    """N_SCANS fixed synthetic scans as BATCH-sized batches (NHWC numpy)."""
    rng = np.random.default_rng(42)
    batches = []
    for _ in range(N_SCANS // BATCH):
        xyz = rng.standard_normal((BATCH, H, W, 3)).astype(np.float32) * 5.0
        batches.append({
            "range": np.linalg.norm(xyz, axis=-1, keepdims=True)
                       .astype(np.float32),
            "reflectivity": rng.uniform(0, 1, (BATCH, H, W, 1))
                              .astype(np.float32),
            "xyz": xyz,
            "normals": rng.uniform(-1, 1, (BATCH, H, W, 3))
                         .astype(np.float32),
            "labels": rng.integers(
                0, NUM_CLASSES_EXTRAS - 1, (BATCH, H, W)).astype(np.int32),
        })
    return batches


def _torch_loader(batches):
    """Reference loader protocol: (range, refl, xyz, normals, labels) NCHW."""
    out = []
    for b in batches:
        out.append((
            torch.from_numpy(b["range"].transpose(0, 3, 1, 2)),
            torch.from_numpy(b["reflectivity"].transpose(0, 3, 1, 2)),
            torch.from_numpy(b["xyz"].transpose(0, 3, 1, 2)),
            torch.from_numpy(b["normals"].transpose(0, 3, 1, 2)),
            torch.from_numpy(b["labels"].astype(np.int64)),
        ))
    return out


@pytest.mark.skipif(not os.path.isdir(REF_SRC),
                    reason="reference tree not mounted")
def test_train_parity_dirichlet_vs_reference_trainer(monkeypatch):
    import jax
    import jax.numpy as jnp

    from semanticlidarunc_tpu.models.fpn import SemanticFPN
    from semanticlidarunc_tpu.train.trainer import Trainer as JaxTrainer
    from semanticlidarunc_tpu.utils.torch_convert import (
        apply_converted, convert_reichert_state_dict)

    cfg = _cfg()
    batches = _synthetic_batches()
    total_steps = EPOCHS * len(batches)

    # ---------------- reference side (actual reference Trainer) -----------
    sys.path.insert(0, REF_SRC)
    try:
        import importlib
        ref_trainer_mod = importlib.import_module("models.trainer")
    finally:
        sys.path.remove(REF_SRC)

    torch.manual_seed(0)
    # the oracle has no dropout module == Dropout2d(p=0); the flax twin runs
    # pyramid_dropout=0.0, so both trajectories are deterministic
    model_t = TorchReichertOracle(num_classes=NUM_CLASSES_EXTRAS)
    sd0 = {k: v.detach().numpy().copy() for k, v in
           model_t.state_dict().items()}

    opt = torch.optim.AdamW(model_t.parameters(), lr=LR, weight_decay=WD)

    # the reference's exact LR lambda (train_semantics.py:195-210): with
    # num_warmup_epochs=0 it still has ONE 0.3x-LR warmup step (max(1, .)),
    # matching this framework's warmup_cosine port; eta_min=LR makes the
    # cosine flat afterwards
    import math as _math
    warmup_steps = 1

    def lr_lambda(s):
        if s < warmup_steps:
            return 0.3 + 0.7 * (s / warmup_steps)
        t = (s - warmup_steps) / max(1, total_steps - warmup_steps)
        return 1.0 + (1 - 1.0) * 0.5 * (1 + _math.cos(_math.pi * t))

    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda=lr_lambda)
    ref_tr = ref_trainer_mod.Trainer(model_t, opt, cfg, scheduler=sched,
                                     visualize=False, logging=False)
    ref_tr.total_train_steps = total_steps

    # capture each step's total loss at its backward() call
    ref_losses = []
    orig_backward = torch.Tensor.backward

    def rec_backward(self, *a, **kw):
        if self.ndim == 0:
            ref_losses.append(float(self.detach()))
        return orig_backward(self, *a, **kw)

    monkeypatch.setattr(torch.Tensor, "backward", rec_backward)
    loader_t = _torch_loader(batches)
    for epoch in range(EPOCHS):
        ref_tr.train_one_epoch(loader_t, epoch)
    monkeypatch.setattr(torch.Tensor, "backward", orig_backward)
    assert len(ref_losses) == total_steps

    # ---------------- this framework ---------------------------------------
    model_j = SemanticFPN(num_classes=NUM_CLASSES_EXTRAS, backbone="resnet18",
                          input_channels=2, meta_channels=6,
                          pyramid_dropout=0.0)
    tr = JaxTrainer(model_j, cfg)
    state = tr.create_state(batches[0], num_epochs=EPOCHS,
                            steps_per_epoch=len(batches))
    converted = convert_reichert_state_dict(sd0, "resnet18",
                                            NUM_CLASSES_EXTRAS)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    variables, missing = apply_converted(variables, converted)
    assert not missing, f"unconverted leaves: {missing[:8]}"
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])

    jax_losses = []
    for epoch in range(EPOCHS):
        state, _ = tr.train_one_epoch(state, batches, epoch)
        jax_losses.extend(tr.last_step_losses)
    assert len(jax_losses) == total_steps

    # 1) per-step loss trajectory
    print("loss trajectory (jax vs ref):")
    for a, b_ in zip(jax_losses, ref_losses):
        print(f"  {a:.6f}  {b_:.6f}  rel {abs(a - b_) / abs(b_):.2e}")
    np.testing.assert_allclose(
        np.asarray(jax_losses), np.asarray(ref_losses), rtol=5e-3,
        err_msg=f"loss trajectories diverged:\n jax={jax_losses}\n "
                f"ref={ref_losses}")
    # step 0 is pure forward+loss math (no optimizer state yet): tight
    assert abs(jax_losses[0] - ref_losses[0]) / abs(ref_losses[0]) < 2e-3

    # diagnostic: step-0 per-term grad norms + end weights, both sides
    print("grad norms (jax vs ref, measured at the last eq step):")
    for k in sorted(tr._last_raw_g):
        print(f"  {k}: {tr._last_raw_g[k]:.6f}  "
              f"{ref_tr._last_raw_g.get(k, float('nan')):.6f}")
    print("final weights (jax vs ref):")
    for k in sorted(tr.current_weights):
        print(f"  {k}: {tr.current_weights[k]:.6f}  "
              f"{float(ref_tr._last_new_w.get(k, float('nan'))):.6f}")

    # 2) post-training parameters agree leaf-by-leaf (convert the FINAL
    # torch state dict and diff against the final jax params; running
    # BN stats excluded — torch uses Bessel-corrected running var, an
    # eval-only estimator difference). Criterion: each leaf's divergence
    # must be small relative to EITHER the param scale or the total update
    # that training applied to it — near-zero-gradient leaves (attention
    # score convs) are chaotically sensitive under Adam (update ~ lr*sign(g)
    # when v is tiny), so cross-framework float noise there can flip single
    # update signs; divergence bounded by a fraction of the applied update
    # is the meaningful exactness statement.
    sd_final = {k: v.detach().numpy().copy() for k, v in
                model_t.state_dict().items()}
    conv_final = convert_reichert_state_dict(sd_final, "resnet18",
                                             NUM_CLASSES_EXTRAS)
    vars_final, _ = apply_converted(
        {"params": state.params, "batch_stats": state.batch_stats},
        conv_final)
    conv_init = convert_reichert_state_dict(sd0, "resnet18",
                                            NUM_CLASSES_EXTRAS)
    vars_init, _ = apply_converted(
        {"params": state.params, "batch_stats": state.batch_stats},
        conv_init)
    got = jax.tree_util.tree_leaves_with_path(state.params)
    want = dict(jax.tree_util.tree_leaves_with_path(vars_final["params"]))
    init = dict(jax.tree_util.tree_leaves_with_path(vars_init["params"]))
    ratios = {}
    for path, leaf in got:
        ref_leaf = np.asarray(want[tuple(path)])
        d = np.asarray(leaf, np.float64) - ref_leaf
        u = ref_leaf - np.asarray(init[tuple(path)], np.float64)
        rms_d = float(np.sqrt(np.mean(d * d)))
        rms_u = float(np.sqrt(np.mean(u * u)))
        ratios[jax.tree_util.keystr(path)] = rms_d / (rms_u + 1e-12)
        # chaos bound: element-wise sign-flipped Adam updates on near-zero-
        # gradient elements diverge by at most ~2x the max update applied
        dmax = float(np.max(np.abs(d)))
        umax = float(np.max(np.abs(u)))
        assert dmax < 2.5 * umax + 1e-6, (
            f"param diverged beyond its own update: "
            f"{jax.tree_util.keystr(path)} max|Δ|={dmax:.3e} "
            f"(max update {umax:.3e})")
    vals = np.asarray(sorted(ratios.values()))
    worst = max(ratios, key=ratios.get)
    print(f"param RMS(Δ)/RMS(update) after {total_steps} steps: "
          f"median {np.median(vals):.3f}, p90 {np.percentile(vals, 90):.3f},"
          f" max {vals.max():.3f} ({worst})")
    # systematic training-math errors produce coherent divergence ~ the
    # update itself across MOST leaves; cross-framework float noise flips
    # isolated near-zero-gradient elements only
    assert np.median(vals) < 0.25
    assert np.percentile(vals, 90) < 0.5

    # 3) balancer / schedule weights agree at the end
    ref_w = {k: float(v) for k, v in ref_tr._last_new_w.items()}
    for k, v in tr.current_weights.items():
        assert k in ref_w
        np.testing.assert_allclose(v, ref_w[k], rtol=0.15, atol=5e-3,
                                   err_msg=f"weight '{k}' diverged")
