"""Tests for the single-kernel Pallas mega-tail (ops/pallas_mc_megatail.py).

On CPU the kernel runs in interpreter mode; both y1 layouts must match the
validated 3-kernel pipeline (prob/mc_dropout.mc_pallas_tail_summaries) and
the XLA production tail bit-near.
"""
import jax
import jax.numpy as jnp
import numpy as np

from semanticlidarunc_tpu.models import registry
from semanticlidarunc_tpu.ops import pallas_mc_megatail as pmm
from semanticlidarunc_tpu.prob import mc_dropout as mc
from semanticlidarunc_tpu.prob.mc_dropout import _mc_epilogue
from semanticlidarunc_tpu.utils import config as cfg_util


def _build(h, w, **ms_extra):
    cfg = cfg_util.with_extras({
        "dataset_name": "SemanticKitti",
        "model_settings": {
            "baseline": "Reichert", "model_type": "resnet18",
            "loss_function": "CE", "attention": True,
            "multi_scale_meta": True, "normals": True, "reflectivity": True,
            "projection": [h, w], **ms_extra},
        "train_params": {}})
    model = registry.build_model(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, h, w, 2))
    meta = jax.random.normal(jax.random.fold_in(key, 1), (2, h, w, 6))
    variables = model.init({"params": key, "dropout": key}, x, meta,
                           train=False)
    return model, variables, x, meta, key


def test_megatail_matches_3kernel_pipeline_both_layouts():
    t = 3
    model, variables, x, meta, key = _build(16, 64)
    fused = model.apply(variables, x, meta, train=False,
                        method=model.features)
    y1 = model.apply(variables, fused, key, t, method=model.head_mc_pre)
    y1f = model.apply(variables, fused, key, t,
                      method=model.head_mc_pre_flat)
    ref = mc.mc_pallas_tail_summaries(model, variables, y1, t)

    params = variables["params"]
    wl = params["logits_conv"]["kernel"][0, 0]
    bl = params["logits_conv"]["bias"]
    for kwargs in ({}, {"n_samples": t}):
        y = y1f if kwargs else y1
        p_sum, h_sum = pmm.mc_megatail(y, params, wl, bl, interpret=True,
                                       **kwargs)
        got = _mc_epilogue(p_sum, h_sum, t, 1e-12)
        for name, r, g in zip(("p_bar", "H", "MI"), ref, got):
            np.testing.assert_allclose(g, r, atol=5e-5, err_msg=name)


def test_megatail_summaries_matches_xla_tail():
    """mc_megatail_summaries == the XLA production tail (mc_fused_summaries
    use_pallas=False), including temperature and class_slice."""
    t = 4
    model, variables, x, meta, key = _build(16, 64)
    fused = model.apply(variables, x, meta, train=False,
                        method=model.features)
    for kwargs in ({}, {"temperature": 1.7, "class_slice": 16}):
        ref = mc.mc_fused_summaries(model, variables, (x, meta), key, t,
                                    use_pallas=False, **kwargs)
        y1f = model.apply(variables, fused, key, t,
                          method=model.head_mc_pre_flat)
        got = mc.mc_megatail_summaries(model, variables, y1f, t, **kwargs)
        for name, r, g in zip(("p_bar", "H", "MI"), ref, got):
            np.testing.assert_allclose(g, r, atol=5e-5, err_msg=name)


def test_can_megatail_gates():
    model, _, _, _, _ = _build(16, 64)
    assert mc.can_megatail(model, 16, 64)
    assert not mc.can_megatail(model, 2, 64)       # degenerate phase grid
    assert mc.can_megatail(model, 16, 64, class_slice=31)
    assert not mc.can_megatail(model, 16, 64, class_slice=32)  # 4K+4 > 128
    # elu_plus_one heads qualify since round 5 (VERDICT r4 ask #5)
    model_elu, _, _, _, _ = _build(16, 64, head_activation="elu_plus_one")
    assert mc.can_megatail(model_elu, 16, 64)


def test_megatail_elu_plus_one_head_matches_xla_tail():
    """The elu_plus_one (Dirichlet-style legacy semanticFCN) head runs
    in-kernel: both Pallas tails must match the XLA production tail,
    including a calibration temperature — which for this nonlinear head is
    applied POST-activation rather than folded into wl/bl."""
    t = 4
    model, variables, x, meta, key = _build(
        16, 64, head_activation="elu_plus_one")
    assert model.head_activation == "elu_plus_one"
    fused = model.apply(variables, x, meta, train=False,
                        method=model.features)
    for kwargs in ({}, {"temperature": 1.7, "class_slice": 16}):
        ref = mc.mc_fused_summaries(model, variables, (x, meta), key, t,
                                    use_pallas=False, **kwargs)
        got = mc.mc_megatail_fused_summaries(model, variables, fused, key,
                                             t, **kwargs)
        for name, r, g in zip(("p_bar", "H", "MI"), ref, got):
            np.testing.assert_allclose(g, r, atol=5e-5, err_msg=name)
        y1 = model.apply(variables, fused, key, t, method=model.head_mc_pre)
        got3 = mc.mc_pallas_tail_summaries(model, variables, y1, t, **kwargs)
        for name, r, g in zip(("p_bar", "H", "MI"), ref, got3):
            np.testing.assert_allclose(g, r, atol=5e-5, err_msg=name)


def test_megatail_fused_dec1_matches_xla_tail():
    """mc_megatail_fused_summaries (dec1 IN-KERNEL from the fused pyramid)
    == the XLA production tail: same rng -> identical dropout masks ->
    same samples, so the stats must agree to conv precision."""
    t = 4
    model, variables, x, meta, key = _build(16, 64)
    fused = model.apply(variables, x, meta, train=False,
                        method=model.features)
    for kwargs in ({}, {"temperature": 1.7, "class_slice": 16}):
        ref = mc.mc_fused_summaries(model, variables, (x, meta), key, t,
                                    use_pallas=False, **kwargs)
        got = mc.mc_megatail_fused_summaries(model, variables, fused, key,
                                             t, **kwargs)
        for name, r, g in zip(("p_bar", "H", "MI"), ref, got):
            np.testing.assert_allclose(g, r, atol=5e-5, err_msg=name)
