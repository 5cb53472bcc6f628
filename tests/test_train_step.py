"""End-to-end training smoke tests on synthetic data (CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from semanticlidarunc_tpu.dataset.pipeline import DataLoader, SyntheticDataset
from semanticlidarunc_tpu.models import registry
from semanticlidarunc_tpu.train.trainer import Trainer
from semanticlidarunc_tpu.utils import config as cfg_util


def _cfg(loss="CE", baseline="Reichert"):
    cfg = {
        "dataset_name": "SemanticKitti",
        "model_settings": {
            "baseline": baseline, "model_type": "resnet10t",
            "loss_function": loss, "attention": True,
            "multi_scale_meta": True, "normals": True, "reflectivity": True,
            "projection": [32, 64], "use_mc_sampling": False,
            "mc_samples": 4,
        },
        "model_weights": {"Dirichlet": {"w_mse": 1.0, "w_kl": 0.05,
                                        "w_nll": 0.0, "w_ls": 0.0,
                                        "w_comp": 0.0, "w_brier": 0.0,
                                        "w_wle": 0.0, "w_digamma_ce": 0.0}},
        "train_params": {"learning_rate": 1e-3, "learning_rate_min": 1e-5,
                         "batch_size": 2, "num_workers": 0, "num_epochs": 2,
                         "weight_decay": 1e-4, "num_warmup_epochs": 0},
    }
    return cfg_util.with_extras(cfg)


def _run_epochs(cfg, n_epochs=2, n_scans=4):
    ds = SyntheticDataset(n_scans=n_scans, projection=(32, 64), n_beams=32,
                          n_azimuth=64)
    loader = DataLoader(ds, batch_size=2, shuffle=False)
    model = registry.build_model(cfg)
    tr = Trainer(model, cfg)
    batch0 = next(iter(loader))
    state = tr.create_state(batch0, num_epochs=n_epochs,
                            steps_per_epoch=len(loader))
    losses = []
    for ep in range(n_epochs):
        state, stats = tr.train_one_epoch(state, loader, ep)
        losses.append(stats["loss"])
        assert np.isfinite(stats["loss"])
    return tr, state, loader, losses


def test_ce_training_reduces_loss():
    cfg = _cfg("CE")
    tr, state, loader, losses = _run_epochs(cfg, n_epochs=3)
    assert losses[-1] < losses[0]
    stats = tr.test_one_epoch(state, loader)
    assert np.isfinite(stats["mIoU"])
    assert np.isfinite(stats["ECE"])


def test_dirichlet_training_runs_and_balances():
    cfg = _cfg("Dirichlet")
    assert cfg["extras"]["num_classes"] == 21
    tr, state, loader, losses = _run_epochs(cfg, n_epochs=2)
    assert tr.num_classes == 20
    assert set(tr.active_terms) == {"mse", "kl"}
    assert np.isfinite(losses[-1])
    # balancer measured grad norms at step 0
    assert "mse" in tr._last_raw_g
    stats = tr.test_one_epoch(state, loader)
    assert np.isfinite(stats["ECE"])
    assert np.isfinite(stats["AUROC_MI"]) or stats["AUROC_MI"] != stats["AUROC_MI"]


def test_mc_eval_path():
    cfg = _cfg("CE")
    cfg["model_settings"]["use_mc_sampling"] = True
    cfg["model_settings"]["mc_samples"] = 3
    tr, state, loader, _ = _run_epochs(cfg, n_epochs=1)
    stats = tr.test_one_epoch(state, loader)
    assert np.isfinite(stats["mIoU"])


def test_mc_split_eval_matches_fused():
    """The split-executable MC eval path (Pallas mega-tail in its own
    program, trainer.eval_batch dispatch) must produce the same metric
    statistics as the fused single-jit eval step — same rng, identical
    dropout masks."""
    import jax

    cfg = _cfg("CE")
    cfg["model_settings"]["use_mc_sampling"] = True
    cfg["model_settings"]["mc_samples"] = 3
    tr, state, loader, _ = _run_epochs(cfg, n_epochs=1)
    batch = next(iter(loader))
    rng = jax.random.PRNGKey(7)
    fused = tr._eval_step(state.params, state.batch_stats, batch, rng,
                          tr.temp_scalar())
    assert tr._eval_pre is not None
    tr.force_split_eval = True
    assert tr._use_split_eval(batch)
    split = tr.eval_batch(state.params, state.batch_stats, batch, rng,
                          tr.temp_scalar())
    assert set(split.keys()) == set(fused.keys())
    for k in fused:
        for a, b in zip(jax.tree_util.tree_leaves(fused[k]),
                        jax.tree_util.tree_leaves(split[k])):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            # count-quantized statistics (histogram bins, confusion matrix)
            # may shift a few pixels when p_bar differs at the 1e-7 level
            # near a bin edge/argmax tie; require near-identical values and
            # conserved totals
            np.testing.assert_allclose(b, a, atol=4.0, err_msg=k)
            np.testing.assert_allclose(b.sum(), a.sum(), rtol=1e-5,
                                       atol=1e-3, err_msg=f"{k} total")


def test_checkpoint_roundtrip(tmp_path):
    from semanticlidarunc_tpu.train import checkpoint as ck
    cfg = _cfg("CE")
    tr, state, loader, _ = _run_epochs(cfg, n_epochs=1)
    path = str(tmp_path / "ckpt")
    tr.save(state, path)
    restored = ck.restore_checkpoint(path)
    assert "variables" in restored and restored["step"] >= 1

    # warm-start via shape-tolerant loader
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    merged, report = ck.load_pretrained_safely(variables, path)
    assert report["ok"] and len(report["skipped"]) == 0
