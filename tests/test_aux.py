"""Aux subsystems: viz helpers, agg, reliability, ouster replay loop."""
import os

import numpy as np
import pytest


def test_colorize_labels_matches_loop_reference():
    from semanticlidarunc_tpu.dataset.definitions import COLOR_MAP
    from semanticlidarunc_tpu.utils.viz import colorize_labels
    rng = np.random.default_rng(0)
    mask = rng.integers(0, 21, (16, 32))
    got = colorize_labels(mask, COLOR_MAP)
    want = np.zeros((16, 32, 3), np.uint8)
    for cid, col in COLOR_MAP.items():
        want[mask == cid] = col
    np.testing.assert_array_equal(got, want)


def test_uncertainty_layers_build():
    from semanticlidarunc_tpu.utils.viz import build_uncertainty_layers
    rng = np.random.default_rng(0)
    alpha = np.abs(rng.standard_normal((1, 8, 16, 6))).astype(np.float32) + 1
    names = ["H_norm", "AU_norm", "EU_norm", "alpha0", "AU_frac", "EU_frac",
             "EU_minus_AU_frac"]
    layers = build_uncertainty_layers(alpha, names)
    assert set(layers) == set(names)
    for img in layers.values():
        assert img.shape == (8, 16, 3) and img.dtype == np.uint8


def test_mean_aggregator():
    from semanticlidarunc_tpu.utils.agg import mean_aggregator

    @mean_aggregator()
    def f(x):
        return x

    f(np.asarray(2.0))
    f(np.asarray(4.0))
    assert f.mean() == 3.0
    f.reset()
    assert np.isnan(f.mean())


def test_reliability_diagram(tmp_path):
    from semanticlidarunc_tpu.utils.reliability import reliability_diagram
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((500, 5)) * 3
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    labels = rng.integers(0, 5, 500)
    path = str(tmp_path / "rel.png")
    ece, acc, conf, counts = reliability_diagram(probs, labels,
                                                 save_path=path)
    assert os.path.exists(path)
    assert 0 <= ece <= 1 and counts.sum() > 0


def test_mc_dirichlet_reliability(tmp_path):
    import jax
    from semanticlidarunc_tpu.utils.reliability import mc_dirichlet_reliability
    rng = np.random.default_rng(0)
    alpha = np.abs(rng.standard_normal((1, 8, 8, 5))).astype(np.float32) + 1
    labels = rng.integers(0, 5, (1, 8, 8))
    path = str(tmp_path / "mc_rel.png")
    acc, centers, totals = mc_dirichlet_reliability(
        jax.random.PRNGKey(0), alpha, labels, save_path=path)
    assert os.path.exists(path)
    assert totals.sum() == 64


def test_ouster_replay_inference(tmp_path):
    """The streaming loop runs headless from KITTI-format organized scans."""
    from semanticlidarunc_tpu.cli.inference_ouster import main, parse_args
    from semanticlidarunc_tpu.dataset.synthetic import make_scan
    import yaml

    h, w = 32, 64
    d = tmp_path / "frames"
    d.mkdir()
    for i in range(2):
        pc = make_scan(seed=i, n_beams=h, n_azimuth=w)
        # organize to exactly h*w points (synthetic drops ~5%; re-make dense)
        rng = np.random.default_rng(i)
        xyzi = np.zeros((h * w, 4), np.float32)
        n = min(pc.shape[0], h * w)
        xyzi[:n] = pc[:n, :4]
        xyzi.tofile(str(d / f"{i:06d}.bin"))

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = yaml.safe_load(open(os.path.join(root, "configs",
                                           "Synthetic_smoke.yaml")))
    cfg["model_settings"]["projection"] = [h, w]
    cfg_path = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))
    main(parse_args(["--cfg_path", str(cfg_path), "--replay_dir", str(d),
                     "--shape", str(h), str(w), "--max_frames", "2"]))


def test_viz_panel_headless():
    from semanticlidarunc_tpu.utils import viz_panel as vp
    panel = vp.InspectionPanel(interactive=False)
    base = {"sem": np.zeros((8, 16, 3), np.uint8)}
    built = {"called": False}

    def builder():
        built["called"] = True
        return np.ones((8, 16, 3), np.uint8)

    out = panel.frame(base, {"H_norm": builder})
    assert out.ndim == 3
    assert not built["called"], "off layer builder must stay lazy"
    panel.deck.set("H_norm", True)
    panel.frame(base, {"H_norm": builder})
    assert built["called"]
    # sticky toggle survives re-registration, zoom keys clamp sanely
    panel.handle_key(ord("+"))
    panel.handle_key(ord("0"))
    panel.frame(base, {"H_norm": builder})
    assert panel.deck.is_on("H_norm")
    # pruning drops stale layers
    panel.frame({"other": np.zeros((4, 8, 3), np.uint8)})
    assert panel.deck.names() == ["other"]
