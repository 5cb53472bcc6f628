"""Tester-vs-Tester end-to-end parity vs the reference's ACTUAL Tester.

test_metric_parity.py checks our pipeline against re-implemented reference
metric math; this suite closes the final link of the parity chain (VERDICT
r4 ask #4) by running the reference's real `models.tester.Tester` (torch,
imported from /root/reference/src, CPU) and this framework's Tester over
the SAME synthetic scans with converted identical weights, then asserting
the REPORTED numbers — result_dict.json mIoU + per-class IoU, and the
ECE/MCE/AUROC/AUROC-MI the reference prints after its eval loop
(/root/reference/src/models/tester.py:605-720) — agree.

Both pipelines run fully deterministically: the torch oracle has no dropout
module and the JAX model uses pyramid_dropout=0 in the MC leg, so MC mode
exercises the full T-sample plumbing (mc_forward stacking, softmax, p_bar,
argmax, every aggregator) without stochastic masks. Stochastic-mask
equality itself is covered by the matched-mask mc_forward leg in
test_torch_parity.py.

Differences that bound the tolerances: our ECE/AUROC aggregators are
fixed-shape histogram sufficient statistics while the reference keeps exact
per-pixel reservoirs (uncapped at this scan count), so scores can differ by
sub-bin quantization; and fp32 conv reassociation across frameworks can
flip argmax on near-tie pixels (forward parity is <5e-3 on logits).
"""
import copy
import importlib
import json
import math
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_torch_parity import TorchReichertOracle  # noqa: E402

H, W = 32, 64
N_SCANS = 4
IGNORE = 0
REF_SRC = "/root/reference/src"


def _import_ref(module):
    sys.path.insert(0, REF_SRC)
    try:
        return importlib.import_module(module)
    finally:
        sys.path.remove(REF_SRC)


class _FakeCudaEvent:
    """CPU stand-in for torch.cuda.Event: the reference Tester constructs
    events unconditionally and calls elapsed_time in its MC loop
    (tester.py:149,482), which raises on CPU-only torch. Timing-only."""

    def __init__(self, *a, **k):
        pass

    def record(self, *a, **k):
        pass

    def elapsed_time(self, other):
        return 0.0


class _TupleLoader:
    """Minimal loader for the reference test_epoch: yields NCHW torch
    (range, reflectivity, xyz, normals, labels) tuples, exposes len() and
    .batch_size (tester.py:306,383)."""

    def __init__(self, batches):
        self.batches = batches
        self.batch_size = batches[0]["labels"].shape[0]

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        for b in self.batches:
            def nchw(a):
                return torch.from_numpy(np.ascontiguousarray(
                    np.asarray(a, np.float32).transpose(0, 3, 1, 2)))
            yield (nchw(b["range"]), nchw(b["reflectivity"]),
                   nchw(b["xyz"]), nchw(b["normals"]),
                   torch.from_numpy(np.asarray(b["labels"])).long())


def _scan_batches(n_classes, seed=0):
    r = np.random.default_rng(seed)
    return [{
        "range": r.random((1, H, W, 1), np.float32) * 50,
        "reflectivity": r.random((1, H, W, 1), np.float32),
        "xyz": r.standard_normal((1, H, W, 3)).astype(np.float32) * 10,
        "normals": r.standard_normal((1, H, W, 3)).astype(np.float32),
        "labels": r.integers(0, n_classes, (1, H, W)),
    } for _ in range(N_SCANS)]


def _our_cfg(loss, use_mc=0, mc_samples=4):
    from semanticlidarunc_tpu.utils import config as cfg_util
    ms = {"baseline": "Reichert", "model_type": "resnet18",
          "loss_function": loss, "attention": True, "multi_scale_meta": True,
          "normals": True, "reflectivity": True, "projection": [H, W]}
    if use_mc:
        ms.update(use_mc_sampling=1, mc_samples=mc_samples)
    return cfg_util.with_extras({
        "dataset_name": "SemanticKitti",
        "model_settings": ms,
        "model_weights": {"Dirichlet": {"w_mse": 1.0, "w_kl": 0.05}},
        "train_params": {"learning_rate": 1e-3, "batch_size": 1,
                         "num_epochs": 1, "num_warmup_epochs": 0},
    })


def _ref_cfg(cfg):
    """The reference Tester reads the same schema but expects test_mask as
    a dict (tester.py:160-163), of length num_classes-1 for Dirichlet
    (its evaluator drops the scale channel, tester.py:140; our
    with_extras mask instead carries a False entry for it — same classes
    averaged either way)."""
    cfg = copy.deepcopy(cfg)
    mask = cfg["extras"]["test_mask"]
    if cfg["model_settings"]["loss_function"] == "Dirichlet":
        mask = mask[:-1]
    cfg["extras"]["test_mask"] = {
        str(i): int(v) for i, v in enumerate(mask)}
    return cfg


def _make_oracle(out_channels, seed=0):
    torch.manual_seed(seed)
    oracle = TorchReichertOracle(num_classes=out_channels)
    oracle.eval()
    with torch.no_grad():
        for mod in oracle.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
        # sharpen the 1x1 head: default-init logits are ~0 -> near-uniform
        # softmax -> every entropy score is 0.9999+/-1e-4, and AUROC
        # degenerates to tie-breaking noise where the reference's exact
        # sort and our histogram bins legitimately disagree; x8 spreads
        # confidences/entropies across (0,1) so the scores carry real
        # ordering on both sides
        oracle.decoder_semantic[-1].weight *= 8.0
        oracle.decoder_semantic[-1].bias *= 8.0
    return oracle


def _run_reference_tester(oracle, cfg, batches, tmp_path, monkeypatch,
                          mc_samples=None):
    """Drive the reference's actual Tester.test_epoch on CPU; return its
    result_dict.json contents + the post-loop ECE/MCE/AUROC computes."""
    monkeypatch.setattr(torch.cuda, "Event", _FakeCudaEvent)
    tester_mod = _import_ref("models.tester")
    import matplotlib
    matplotlib.use("Agg")

    ckpt = str(tmp_path / "ref" / "model_007.pt")
    os.makedirs(os.path.dirname(ckpt), exist_ok=True)
    torch.save(oracle.state_dict(), ckpt)
    t = tester_mod.Tester(oracle, _ref_cfg(cfg), visualize=False,
                          logging=False, checkpoint=ckpt)
    t.test_epoch(_TupleLoader(batches))

    with open(os.path.join(os.path.dirname(ckpt), "test",
                           "result_dict.json")) as f:
        result = json.load(f)
    # the aggregators still hold the epoch's buffers after test_epoch (they
    # are only reset at the START of a fresh run, tester.py:369-376);
    # save_plot_path is required (compute() only defines its fig when
    # plotting)
    pp = str(tmp_path / "ref" / "post")
    (ece, mce), _, fig1 = t.ece_eval.compute(save_plot_path=pp + "_ece.png")
    auroc, _, fig2 = t.auroc_eval.compute(save_plot_path=pp + "_roc.png")
    auroc_mi, _, fig3 = t.auroc_eval_mi.compute(
        save_plot_path=pp + "_roc_mi.png")
    import matplotlib.pyplot as plt
    for fig in (fig1, fig2, fig3):
        if fig is not None:
            plt.close(fig)
    result.update(ECE=float(ece), MCE=float(mce), AUROC=float(auroc),
                  AUROC_MI=float(auroc_mi))
    return result


def _run_our_tester(model, cfg, sd, n_out, batches, tmp_path):
    from semanticlidarunc_tpu.train.tester import Tester
    from semanticlidarunc_tpu.utils.torch_convert import (
        apply_converted, convert_reichert_state_dict)

    out_dir = str(tmp_path / "ours")
    t = Tester(model, cfg, out_dir=out_dir)
    converted = convert_reichert_state_dict(sd, "resnet18", n_out)
    orig_load = t._load_variables

    def load_converted(batch):
        state = orig_load(batch)
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        variables, missing = apply_converted(variables, converted)
        assert not missing, f"unconverted leaves: {missing[:8]}"
        t.state = state.replace(params=variables["params"],
                                batch_stats=variables.get("batch_stats"))
        return t.state

    t._load_variables = load_converted
    t.run(batches)
    with open(os.path.join(out_dir, "result_dict.json")) as f:
        return json.load(f)


def _assert_result_parity(ours, ref, iou_atol, score_atol, mi_atol=None):
    assert set(ours["iou"]) == set(ref["iou"])
    assert math.isclose(ours["mIoU"], ref["mIoU"], abs_tol=iou_atol), (
        ours["mIoU"], ref["mIoU"])
    for k in ref["iou"]:
        a, b = ours["iou"][k], ref["iou"][k]
        if a is None or b is None:
            assert a == b, (k, a, b)  # NaN -> null must match
        else:
            assert math.isclose(a, b, abs_tol=iou_atol), (k, a, b)
    for k in ("ECE", "MCE", "AUROC"):
        assert math.isclose(ours[k], ref[k], abs_tol=score_atol), (
            k, ours[k], ref[k])
    assert math.isclose(ours["AUROC_MI"], ref["AUROC_MI"],
                        abs_tol=(mi_atol or score_atol)), (
        ours["AUROC_MI"], ref["AUROC_MI"])


def test_tester_vs_reference_tester_dirichlet(tmp_path, monkeypatch):
    """Dirichlet (non-MC) mode: alpha-based metrics end to end."""
    from semanticlidarunc_tpu.models.fpn import SemanticFPN

    cfg = _our_cfg("Dirichlet")
    n_out = cfg["extras"]["num_classes"]          # 20 classes + scale ch
    oracle = _make_oracle(n_out)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    batches = _scan_batches(n_classes=n_out - 1)

    ref = _run_reference_tester(oracle, cfg, batches, tmp_path, monkeypatch)
    model = SemanticFPN(num_classes=n_out, backbone="resnet18",
                        input_channels=2, meta_channels=6)
    ours = _run_our_tester(model, cfg, sd, n_out, batches, tmp_path)

    # per-class IoU: fp32 near-tie argmax flips move a handful of the ~2k
    # pixels per class; ECE/AUROC add sub-bin histogram quantization
    _assert_result_parity(ours, ref, iou_atol=0.005, score_atol=0.005)


def test_tester_vs_reference_tester_mc(tmp_path, monkeypatch):
    """MC-dropout mode (CE loss): the reference runs its real mc_forward
    T-sample loop; deterministic (no dropout modules / rate 0), so the
    whole MC plumbing must agree."""
    from semanticlidarunc_tpu.models.fpn import SemanticFPN

    T = 4
    cfg = _our_cfg("CE", use_mc=1, mc_samples=T)
    n_out = cfg["extras"]["num_classes"]          # 20
    oracle = _make_oracle(n_out)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    batches = _scan_batches(n_classes=n_out)

    ref = _run_reference_tester(oracle, cfg, batches, tmp_path, monkeypatch,
                                mc_samples=T)
    model = SemanticFPN(num_classes=n_out, backbone="resnet18",
                        input_channels=2, meta_channels=6,
                        pyramid_dropout=0.0)
    ours = _run_our_tester(model, cfg, sd, n_out, batches, tmp_path)

    # MI is identically 0 for deterministic samples, so AUROC-MI is a
    # degenerate all-ties ROC on both sides (=0.5 up to tie handling)
    _assert_result_parity(ours, ref, iou_atol=0.005, score_atol=0.005,
                          mi_atol=0.02)
