"""Fused scan inference, label smoothing, dataset stats."""
import numpy as np

import jax
import jax.numpy as jnp

from semanticlidarunc_tpu import inference as inf
from semanticlidarunc_tpu.dataset.synthetic import make_scan
from semanticlidarunc_tpu.models import registry
from semanticlidarunc_tpu.ops.projection import pad_points
from semanticlidarunc_tpu.utils import config as cfg_util


def _cfg(h, w, loss="CE"):
    return cfg_util.with_extras({
        "dataset_name": "SemanticKitti",
        "model_settings": {"baseline": "Reichert", "model_type": "resnet10t",
                           "loss_function": loss, "attention": True,
                           "multi_scale_meta": True, "normals": True,
                           "reflectivity": True, "projection": [h, w]},
        "train_params": {}})


def test_fused_scan_segmenter():
    h, w = 32, 64
    cfg = _cfg(h, w)
    model = registry.build_model(cfg)
    # n_beams != h: equal values put every elevation exactly on a bin edge,
    # where fused-vs-unfused float rounding can differ by one row
    pc = make_scan(seed=0, n_beams=48, n_azimuth=64)
    pts, valid = pad_points(pc, 1 << 12)
    pts_j, valid_j = jnp.asarray(pts), jnp.asarray(valid)

    key = jax.random.PRNGKey(0)
    inputs, flat = inf.preprocess_scan(pts_j, valid_j, h, w, cfg)
    variables = model.init({"params": key, "dropout": key}, *inputs,
                           train=False)

    run = inf.make_scan_segmenter(model, variables, cfg, h, w)
    labels, seg = run(pts_j, valid_j)
    assert labels.shape == (pts.shape[0],)
    assert seg.shape == (h, w)
    # every valid point's label equals the segmentation at its pixel
    fl = np.asarray(flat)
    ok = fl < h * w
    np.testing.assert_array_equal(
        np.asarray(labels)[ok], np.asarray(seg).reshape(-1)[fl[ok]])

    mc_run = inf.make_mc_scan_segmenter(model, variables, cfg, h, w,
                                        n_samples=3)
    labels2, seg2, h_norm, mi_norm = mc_run(pts_j, valid_j, key)
    assert h_norm.shape == (h, w) and mi_norm.shape == (h, w)
    assert np.isfinite(np.asarray(h_norm)).all()

    # the split Pallas-tail pipeline (the TPU production path; interpreter
    # here) must match the single-jit XLA tail — same rng, same masks
    mc_split = inf.make_mc_scan_segmenter(model, variables, cfg, h, w,
                                          n_samples=3, use_pallas_tail=True)
    labels3, seg3, h3, mi3 = mc_split(pts_j, valid_j, key)
    np.testing.assert_array_equal(np.asarray(seg3), np.asarray(seg2))
    np.testing.assert_array_equal(np.asarray(labels3), np.asarray(labels2))
    np.testing.assert_allclose(np.asarray(h3), np.asarray(h_norm),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(mi3), np.asarray(mi_norm),
                               atol=5e-5)


def test_fused_dirichlet_segmenter_strips_unknown_class():
    h, w = 16, 32
    cfg = _cfg(h, w, loss="Dirichlet")
    model = registry.build_model(cfg)   # K+1 output channels
    pc = make_scan(seed=1, n_beams=16, n_azimuth=32)
    pts, valid = pad_points(pc, 1 << 10)
    key = jax.random.PRNGKey(0)
    inputs, _ = inf.preprocess_scan(jnp.asarray(pts), jnp.asarray(valid),
                                    h, w, cfg)
    variables = model.init({"params": key, "dropout": key}, *inputs,
                           train=False)
    run = inf.make_scan_segmenter(model, variables, cfg, h, w)
    labels, seg = run(jnp.asarray(pts), jnp.asarray(valid))
    k = cfg["extras"]["num_classes"] - 1
    assert int(np.asarray(seg).max()) < k


def test_smoothing_schedule_and_one_hot():
    from semanticlidarunc_tpu.prob.smoothing import (smooth_one_hot,
                                                     smoothing_schedule)
    assert smoothing_schedule(0, 50) == 0.25
    assert smoothing_schedule(49, 50) == 0.15
    mid = smoothing_schedule(30, 50)
    assert 0.15 < mid < 0.25
    oh = np.asarray(smooth_one_hot(jnp.asarray([2]), 5, smoothing=0.2))
    np.testing.assert_allclose(oh.sum(), 1.0, atol=1e-6)
    assert abs(oh[0, 2] - 0.8) < 1e-6
    assert abs(oh[0, 0] - 0.05) < 1e-6


def test_class_counts_and_plot(tmp_path):
    from semanticlidarunc_tpu.dataset import definitions, stats
    from semanticlidarunc_tpu.dataset.pipeline import SyntheticDataset
    ds = SyntheticDataset(n_scans=2, projection=(16, 32), n_beams=16,
                          n_azimuth=32)
    counts = stats.class_counts(ds, 21)
    assert sum(counts.values()) == 2 * 16 * 32
    path = str(tmp_path / "dist.png")
    stats.plot_class_counts(counts, definitions.CLASS_NAMES, 21,
                            definitions.COLOR_MAP, save_path=path)
    import os
    assert os.path.exists(path)
