"""Batched serving path: batched segmenter == single-scan segmenter, and the
ScanServer stream preserves order / handles ragged batches."""
import numpy as np

import jax
import jax.numpy as jnp

from semanticlidarunc_tpu import inference, serve
from semanticlidarunc_tpu.dataset.synthetic import make_scan
from semanticlidarunc_tpu.models import registry
from semanticlidarunc_tpu.utils import config as cfg_util

H, W = 32, 64


def _cfg(loss="CE"):
    return cfg_util.with_extras({
        "dataset_name": "SemanticKitti",
        "model_settings": {
            "baseline": "Reichert", "model_type": "resnet10t",
            "loss_function": loss, "attention": True,
            "multi_scale_meta": True, "normals": True, "reflectivity": True,
            "projection": [H, W], "use_mc_sampling": loss != "CE",
            "mc_samples": 4,
        },
        "train_params": {},
    })


def _raw_scans(k):
    return [make_scan(seed=s, n_beams=32, n_azimuth=64)[:, :4]
            for s in range(k)]


def _build(cfg):
    model = registry.build_model(cfg)
    pc = _raw_scans(1)[0]
    from semanticlidarunc_tpu.ops.projection import pad_points
    pts, valid = pad_points(pc, 1 << 12)
    key = jax.random.PRNGKey(0)
    inputs0, _ = inference.preprocess_scan(jnp.asarray(pts[:, :4]),
                                           jnp.asarray(valid), H, W, cfg)
    variables = model.init({"params": key, "dropout": key}, *inputs0,
                           train=False)
    return model, variables


def test_batched_segmenter_matches_single():
    cfg = _cfg("CE")
    model, variables = _build(cfg)
    single = inference.make_scan_segmenter(model, variables, cfg, H, W)
    server = serve.ScanServer(model, variables, cfg, H, W, batch_size=2,
                              n_points=1 << 12, use_mc=False)
    scans = _raw_scans(5)          # 5 scans -> 2 full batches + ragged 1
    valid = [np.ones((len(s),), bool) for s in scans]

    got = list(server.stream(zip(scans, valid)))
    assert len(got) == 5
    from semanticlidarunc_tpu.ops.projection import pad_points
    for s, g in zip(scans, got):
        pts, vld = pad_points(s, 1 << 12)
        labels, seg = single(jnp.asarray(pts[:, :4]), jnp.asarray(vld))
        np.testing.assert_array_equal(np.asarray(seg),
                                      g["segmentation"])
        np.testing.assert_array_equal(np.asarray(labels)[: len(s)],
                                      g["point_labels"])


def test_batched_mc_segmenter_matches_single_scan_mc():
    cfg = _cfg("CE")
    model, variables = _build(cfg)
    from semanticlidarunc_tpu.ops.projection import pad_points
    pc = _raw_scans(1)[0]
    pts, vld = pad_points(pc, 1 << 12)
    rng = jax.random.PRNGKey(7)

    single = inference.make_mc_scan_segmenter(model, variables, cfg, H, W,
                                              n_samples=4)
    batched = serve.make_batched_mc_segmenter(model, variables, cfg, H, W,
                                              n_samples=4)
    l1, s1, h1, m1 = single(jnp.asarray(pts[:, :4]), jnp.asarray(vld), rng)
    l2, s2, h2, m2 = batched(jnp.asarray(pts[None, :, :4]),
                             jnp.asarray(vld[None]), rng)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2[0]))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2[0]))
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2[0]), atol=1e-5)


def test_scan_server_mc_stream_shapes():
    cfg = _cfg("CE")
    model, variables = _build(cfg)
    server = serve.ScanServer(model, variables, cfg, H, W, n_samples=4,
                              batch_size=2, n_points=1 << 12, use_mc=True)
    scans = _raw_scans(3)
    valid = [np.ones((len(s),), bool) for s in scans]
    got = list(server.stream(zip(scans, valid)))
    assert len(got) == 3
    for s, g in zip(scans, got):
        assert g["point_labels"].shape == (len(s),)
        assert g["segmentation"].shape == (H, W)
        assert g["h_norm"].shape == (H, W)
        assert np.isfinite(g["h_norm"]).all()
        assert np.isfinite(g["mi_norm"]).all()


def test_scan_server_in_flight_window_and_report():
    """max_in_flight>1 keeps results identical and in order, and the stream
    self-report (latency/throughput) is populated with sane values."""
    cfg = _cfg("CE")
    model, variables = _build(cfg)
    scans = _raw_scans(7)          # 3 full batches + ragged 1
    valid = [np.ones((len(s),), bool) for s in scans]

    base = serve.ScanServer(model, variables, cfg, H, W, batch_size=2,
                            n_points=1 << 12, use_mc=False, max_in_flight=1)
    deep = serve.ScanServer(model, variables, cfg, H, W, batch_size=2,
                            n_points=1 << 12, use_mc=False, max_in_flight=3)
    want = list(base.stream(zip(scans, valid)))
    got = list(deep.stream(zip(scans, valid)))
    assert len(got) == len(want) == 7
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w["segmentation"], g["segmentation"])
        np.testing.assert_array_equal(w["point_labels"], g["point_labels"])

    rep = deep.last_report()
    assert rep["n_scans"] == 7 and rep["n_batches"] == 4
    assert rep["max_in_flight"] == 3
    assert rep["scans_per_sec"] > 0
    assert rep["latency_ms_p95"] >= rep["latency_ms_p50"] > 0


def test_scan_server_callback_serve():
    """serve(scans, on_result) pushes every result and returns the report."""
    cfg = _cfg("CE")
    model, variables = _build(cfg)
    server = serve.ScanServer(model, variables, cfg, H, W, batch_size=2,
                              n_points=1 << 12, use_mc=False,
                              max_in_flight=2)
    scans = _raw_scans(3)
    valid = [np.ones((len(s),), bool) for s in scans]
    got = []
    rep = server.serve(zip(scans, valid), got.append)
    assert len(got) == 3
    assert rep["n_scans"] == 3 and rep["n_batches"] == 2
    for s, g in zip(scans, got):
        assert g["point_labels"].shape == (len(s),)
