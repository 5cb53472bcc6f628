"""True resume, Dirichlet health stats, adaptive ECE, shared-param discovery,
legacy qkv attention."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlidarunc_tpu.dataset.pipeline import DataLoader, SyntheticDataset
from semanticlidarunc_tpu.models import registry
from semanticlidarunc_tpu.train.trainer import Trainer
from semanticlidarunc_tpu.utils import config as cfg_util


def _cfg(loss="Dirichlet"):
    return cfg_util.with_extras({
        "dataset_name": "SemanticKitti",
        "model_settings": {"baseline": "Reichert", "model_type": "resnet10t",
                           "loss_function": loss, "attention": True,
                           "multi_scale_meta": True, "normals": True,
                           "reflectivity": True, "projection": [32, 64]},
        "model_weights": {"Dirichlet": {"w_mse": 1.0, "w_kl": 0.05,
                                        "w_nll": 0.0, "w_ls": 0.0,
                                        "w_comp": 0.0, "w_brier": 0.0,
                                        "w_wle": 0.0, "w_digamma_ce": 0.0}},
        "train_params": {"learning_rate": 1e-3, "batch_size": 2,
                         "num_epochs": 2, "num_warmup_epochs": 0}})


def test_true_resume_roundtrip(tmp_path):
    cfg = _cfg("CE")
    ds = SyntheticDataset(n_scans=2, projection=(32, 64), n_beams=32,
                          n_azimuth=64)
    loader = DataLoader(ds, batch_size=2)
    model = registry.build_model(cfg)
    tr = Trainer(model, cfg)
    batch0 = next(iter(loader))
    state = tr.create_state(batch0, num_epochs=2, steps_per_epoch=1)
    state, _ = tr.train_one_epoch(state, loader, 0)
    path = str(tmp_path / "ck")
    tr.save(state, path)

    tr2 = Trainer(model, cfg, seed=123)
    state2 = tr2.create_state(batch0, num_epochs=2, steps_per_epoch=1,
                              resume=path)
    assert int(state2.step) == int(state.step) == 1
    # optimizer moments restored, not fresh zeros
    l1 = jax.tree_util.tree_leaves(state.opt_state)
    l2 = jax.tree_util.tree_leaves(state2.opt_state)
    assert any(np.allclose(a, b) and np.abs(np.asarray(a)).sum() > 0
               for a, b in zip(l1, l2)
               if hasattr(a, "shape") and np.shape(a) != ())
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state2.params)[0]))


def test_dirichlet_health_metrics():
    from semanticlidarunc_tpu.prob.dirichlet import dirichlet_health
    rng = np.random.default_rng(0)
    alpha = np.abs(rng.standard_normal((2, 8, 8, 6))).astype(np.float32) + 1
    labels = rng.integers(0, 6, (2, 8, 8))
    h = dirichlet_health(jnp.asarray(alpha), jnp.asarray(labels))
    h = {k: float(v) for k, v in h.items()}
    assert h["alpha0_p01"] <= h["alpha0_p50"] <= h["alpha0_p99"]
    assert 0.0 <= h["wrong_rate"] <= 1.0
    assert 0.0 <= h["H_norm_lt_0.5"] <= 1.0
    assert np.isfinite(h["H_norm_mean"])


def test_adaptive_ece_binning(rng):
    from semanticlidarunc_tpu.metrics.ece import ECEAggregator
    logits = rng.standard_normal((4000, 6)).astype(np.float32) * 3
    labels = rng.integers(0, 6, 4000)
    agg = ECEAggregator(n_bins=10, mode="logits", ignore_index=0,
                        binning="adaptive")
    agg.update(jnp.asarray(logits), jnp.asarray(labels))
    (ece, mce), stats = agg.compute()
    assert np.isfinite(ece)
    n = stats["n"]
    nz = n[n > 0]
    # equal-mass: populated bins should have comparable counts
    assert nz.max() / max(1, nz.min()) < 4.0


def test_discover_ref_mask():
    from semanticlidarunc_tpu.losses.balancer import discover_ref_mask
    params = {"shared": {"kernel": jnp.ones((3, 3))},
              "only_a": {"kernel": jnp.ones((2,))},
              "norm": {"scale": jnp.ones((3,))}}

    def terms_fn(p, x):
        a = jnp.sum(p["shared"]["kernel"]) + jnp.sum(p["only_a"]["kernel"])
        b = jnp.sum(p["shared"]["kernel"] ** 2) + jnp.sum(p["norm"]["scale"])
        return {"a": a, "b": b}

    mask = discover_ref_mask(terms_fn, params, (jnp.zeros(1),), min_terms=2)
    assert mask["shared"]["kernel"] is True
    assert mask["only_a"]["kernel"] is False      # touched by one term only
    assert mask["norm"]["scale"] is False         # excluded as norm param


def test_qkv_attention_variant():
    from semanticlidarunc_tpu.models.fpn import SemanticFPN
    m = SemanticFPN(num_classes=4, backbone="resnet10t", input_channels=2,
                    meta_channels=6, attention_type="qkv")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 16, 32, 2))
    meta = jax.random.normal(rng, (1, 16, 32, 6))
    vs = m.init({"params": rng, "dropout": rng}, x, meta, train=False)
    out = m.apply(vs, x, meta, train=False)
    assert out.shape == (1, 16, 32, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_temperature_set_after_first_eval_trace_takes_effect():
    """The post-hoc calibration temperature is a TRACED eval-step argument:
    setting trainer.temperature after the first eval step must change the
    confidence statistics (previously it was silently trace-captured)."""
    cfg = _cfg("CE")
    ds = SyntheticDataset(n_scans=2, projection=(32, 64), n_beams=32,
                          n_azimuth=64)
    loader = DataLoader(ds, batch_size=2)
    model = registry.build_model(cfg)
    tr = Trainer(model, cfg)
    batch = next(iter(loader))
    state = tr.create_state(batch, num_epochs=1, steps_per_epoch=1)
    rng = jax.random.PRNGKey(0)
    out1 = jax.device_get(tr._eval_step(state.params, state.batch_stats,
                                        batch, rng, tr.temp_scalar()))
    tr.temperature = 10.0      # AFTER the first trace
    out2 = jax.device_get(tr._eval_step(state.params, state.batch_stats,
                                        batch, rng, tr.temp_scalar()))
    # T=10 flattens probabilities -> mean confidence must drop
    conf1 = np.asarray(out1["ece"][1]).sum() / np.asarray(out1["ece"][0]).sum()
    conf2 = np.asarray(out2["ece"][1]).sum() / np.asarray(out2["ece"][0]).sum()
    assert conf2 < conf1 - 1e-3
    # predictions are temperature-invariant
    np.testing.assert_array_equal(out1["confmat"], out2["confmat"])
