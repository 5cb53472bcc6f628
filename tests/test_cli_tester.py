"""CLI + Tester end-to-end smoke on the synthetic config."""
import json
import os

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def smoke_cfg(tmp_path_factory):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = yaml.safe_load(open(os.path.join(root, "configs",
                                           "Synthetic_smoke.yaml")))
    cfg["model_settings"]["projection"] = [32, 64]
    cfg["train_params"]["num_epochs"] = 1
    cfg["logging_settings"]["log_dir"] = str(
        tmp_path_factory.mktemp("runs"))
    p = tmp_path_factory.mktemp("cfg") / "smoke.yaml"
    yaml.safe_dump(cfg, open(p, "w"))
    return str(p)


def test_cli_train_then_test(smoke_cfg, tmp_path):
    from semanticlidarunc_tpu.cli.train_semantics import main, parse_args

    main(parse_args(["--cfg_path", smoke_cfg, "--mode", "train"]))

    cfg = yaml.safe_load(open(smoke_cfg))
    log_dir = cfg["logging_settings"]["log_dir"]
    finals = []
    for dirpath, dirnames, _ in os.walk(log_dir):
        finals += [os.path.join(dirpath, d) for d in dirnames
                   if d == "model_final"]
    assert finals, "no final checkpoint written"

    cfg["model_settings"]["pretrained"] = finals[0]
    test_cfg = tmp_path / "test.yaml"
    yaml.safe_dump(cfg, open(test_cfg, "w"))
    main(parse_args(["--cfg_path", str(test_cfg), "--mode", "test"]))

    results = []
    for dirpath, _, files in os.walk(log_dir):
        results += [os.path.join(dirpath, f) for f in files
                    if f == "result_dict.json"]
    assert results
    res = json.load(open(results[0]))
    assert "mIoU" in res and "ECE" in res and "AUROC" in res
    assert res["checkpoint"] == finals[0]
    # entropy/error + MC-Dirichlet reliability diagnostics are wired into
    # the Tester (reference probability_helper.py:339-450)
    assert res.get("entropy_ECE") is not None
    out_dir = os.path.dirname(results[0])
    arts = os.listdir(out_dir)
    for prefix in ("entropy_error_iou_", "entropy_reliability_",
                   "mc_reliability_", "ece_", "roc_", "risk_coverage_"):
        assert any(a.startswith(prefix) for a in arts), (prefix, arts)

    # cache roundtrip: a re-run over the same out_dir restores the summary
    # (skips inference) and reproduces the diagnostics
    from semanticlidarunc_tpu.cli.train_semantics import build_loaders
    from semanticlidarunc_tpu.models import registry
    from semanticlidarunc_tpu.train.tester import Tester
    from semanticlidarunc_tpu.utils import config as cfg_util

    cfg2 = cfg_util.with_extras(cfg_util.load_config(str(test_cfg)))
    _, test_loader = build_loaders(cfg2, "test")
    tester = Tester(registry.build_model(cfg2), cfg2, checkpoint=finals[0],
                    out_dir=out_dir)
    tester.run(test_loader)
    res2 = json.load(open(results[0]))
    assert res2["ran_inference"] is False
    assert abs(res2["entropy_ECE"] - res["entropy_ECE"]) < 1e-9
    assert abs(res2["mIoU"] - res["mIoU"]) < 1e-9


def test_config_yaml_files_parse():
    from semanticlidarunc_tpu.utils import config as cfg_util
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_dir = os.path.join(root, "configs")
    for name in os.listdir(cfg_dir):
        cfg = cfg_util.load_config(os.path.join(cfg_dir, name))
        cfg = cfg_util.with_extras(cfg)
        assert cfg["extras"]["num_classes"] in (20, 21, 22), name


def test_thab_split_leave_one_out(tmp_path):
    """Leave-one-scene-out split semantics of the baseline THAB entry
    (reference train_semantic_THAB.py:46-53)."""
    from semanticlidarunc_tpu.cli.train_semantic_thab import build_thab_split

    seq = tmp_path / "sequences"
    for i in range(4):
        d = seq / f"{i:04}" / "velodyne"
        d.mkdir(parents=True)
        for j in range(2):
            (d / f"{j:06}.bin").write_bytes(b"")

    train, test = build_thab_split(str(tmp_path), test_id=2)
    assert len(train) == 6 and len(test) == 2
    assert all("/0002/" not in b for b, _ in train)
    assert all("/0002/" in b for b, _ in test)
    assert all(l.endswith(".label") and "labels" in l for _, l in train)

    # -1: train on ALL scenes, test on scene 2 (reference's `i == 2` pick)
    train_all, test_all = build_thab_split(str(tmp_path), test_id=-1)
    assert len(train_all) == 8 and test_all == test


def test_thab_entry_smoke(tmp_path):
    """The per-baseline THAB entry trains+tests CENet through the unified
    Trainer on the synthetic dataset."""
    from semanticlidarunc_tpu.cli import train_semantic_thab as tt

    args = tt.parse_args([
        "--dataset_dir", "synthetic", "--model_type", "ResNet_34",
        "--num_epochs", "1", "--batch_size", "2", "--projection", "32", "64", "--test_id", "6", "--log_dir", str(tmp_path),
        "--with_logging", "true"])
    # scene-6 mask applied (reference train_semantic_THAB.py:57-58)
    cfg = tt.build_cfg(args)
    n = cfg["extras"]["num_classes"]
    assert cfg["extras"]["test_mask"][:4] == [0, 1, 0, 0]
    assert len(cfg["extras"]["test_mask"]) == n
    assert cfg["model_settings"]["loss_function"] == "Tversky"
    assert "split_pairs" not in cfg["extras"]

    tt.main(["--dataset_dir", "synthetic", "--model_type", "ResNet_34",
             "--num_epochs", "1", "--batch_size", "2", "--projection",
             "32", "64", "--log_dir", str(tmp_path),
             "--with_logging", "true"])
    finals = []
    for dirpath, dirnames, _ in os.walk(str(tmp_path)):
        finals += [os.path.join(dirpath, d) for d in dirnames
                   if d == "model_final"]
    assert finals, "no final checkpoint written"
