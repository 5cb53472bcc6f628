"""Model construction / forward-shape / trunk-head-split tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semanticlidarunc_tpu.models.fpn import SemanticFPN
from semanticlidarunc_tpu.models.salsanext import SalsaNext, pixel_shuffle
from semanticlidarunc_tpu.models import registry


H, W = 32, 64


def _init(model, *shapes):
    rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, len(shapes))
    args = [jax.random.normal(k, s, jnp.float32) for k, s in zip(keys, shapes)]
    variables = model.init({"params": rng, "dropout": rng}, *args, train=False)
    return variables, args


def test_fpn_forward_shapes():
    m = SemanticFPN(num_classes=20, backbone="resnet18",
                    input_channels=2, meta_channels=6)
    variables, (x, meta) = _init(m, (2, H, W, 2), (2, H, W, 6))
    out = m.apply(variables, x, meta, train=False)
    assert out.shape == (2, H, W, 20)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_fpn_train_mode_runs_with_batch_stats():
    m = SemanticFPN(num_classes=5, backbone="resnet18",
                    input_channels=2, meta_channels=6)
    variables, (x, meta) = _init(m, (1, H, W, 2), (1, H, W, 6))
    out, mut = m.apply(variables, x, meta, train=True,
                       rngs={"dropout": jax.random.PRNGKey(1)},
                       mutable=["batch_stats"])
    assert out.shape == (1, H, W, 5)
    assert "batch_stats" in mut


def test_fpn_trunk_head_split_matches_full_forward():
    m = SemanticFPN(num_classes=7, backbone="resnet18",
                    input_channels=2, meta_channels=6)
    variables, (x, meta) = _init(m, (1, H, W, 2), (1, H, W, 6))
    full = m.apply(variables, x, meta, train=False, stochastic=False)
    fused = m.apply(variables, x, meta, train=False, method=m.features)
    head = m.apply(variables, fused, stochastic=False, method=m.head)
    np.testing.assert_allclose(np.asarray(full), np.asarray(head), atol=1e-5)


def test_fpn_head_stochasticity():
    m = SemanticFPN(num_classes=7, backbone="resnet18",
                    input_channels=2, meta_channels=6)
    variables, (x, meta) = _init(m, (1, H, W, 2), (1, H, W, 6))
    fused = m.apply(variables, x, meta, train=False, method=m.features)
    o1 = m.apply(variables, fused, stochastic=True, method=m.head,
                 rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = m.apply(variables, fused, stochastic=True, method=m.head,
                 rngs={"dropout": jax.random.PRNGKey(2)})
    o1b = m.apply(variables, fused, stochastic=True, method=m.head,
                  rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o1b))


# The non-resnet18 variants are `slow`: each of these families' forward is
# already covered BY A STRONGER TEST in the default run — the torch-oracle
# numeric parity tests in tests/test_torch_parity.py (resnet50, shufflenet,
# regnet, efficientnet_v2_s, squeezenet) — so the shape-only smoke here is
# duplicate coverage that costs ~50-70 s of cold CPU compile per family.
@pytest.mark.parametrize("backbone", [
    "resnet18",
    pytest.param("resnet50", marks=pytest.mark.slow),
    pytest.param("shufflenet_v2_x1_0", marks=pytest.mark.slow),
    pytest.param("regnet_y_400mf", marks=pytest.mark.slow),
    pytest.param("efficientnet_v2_s", marks=pytest.mark.slow),
    pytest.param("squeezenet1_0", marks=pytest.mark.slow),
])
def test_backbone_variants(backbone):
    m = SemanticFPN(num_classes=4, backbone=backbone,
                    input_channels=1, meta_channels=3)
    variables, (x, meta) = _init(m, (1, H, W, 1), (1, H, W, 3))
    out = m.apply(variables, x, meta, train=False)
    assert out.shape == (1, H, W, 4)


def test_pixel_shuffle_matches_torch_semantics():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).standard_normal((2, 3, 4, 16)).astype(np.float32)
    got = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    want = torch.nn.functional.pixel_shuffle(
        torch.from_numpy(x).permute(0, 3, 1, 2), 2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want)


def test_salsanext_forward():
    m = SalsaNext(num_classes=20)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, H, W, 5))
    variables = m.init({"params": rng, "dropout": rng}, x, train=False)
    out = m.apply(variables, x, train=False)
    assert out.shape == (1, H, W, 20)


def test_registry_builds_from_config():
    cfg = {
        "dataset_name": "SemanticKitti",
        "model_settings": {"baseline": "Reichert", "model_type": "resnet18",
                           "loss_function": "CE", "attention": True,
                           "multi_scale_meta": True, "normals": True,
                           "reflectivity": True},
        "train_params": {},
    }
    from semanticlidarunc_tpu.utils import config as cfg_util
    cfg = cfg_util.with_extras(cfg)
    assert cfg["extras"]["num_classes"] == 20
    m = registry.build_model(cfg)
    assert m.input_channels == 2 and m.meta_channels == 6

    r = jnp.zeros((1, H, W, 1))
    refl = jnp.zeros((1, H, W, 1))
    xyz = jnp.zeros((1, H, W, 3))
    nrm = jnp.zeros((1, H, W, 3))
    inputs = registry.set_model_inputs(r, refl, xyz, nrm, cfg)
    assert inputs[0].shape[-1] == 2 and inputs[1].shape[-1] == 6


def test_grouped_conv_merged_padded_equivalence(monkeypatch):
    """All three lowerings of the grouped conv must equal the direct
    feature_group_count conv: the default dense block-diagonal embedding,
    and (with the dense-size cap shrunk to 0) the ~128-lane divisor merge
    and the padded merge for prime-style group counts (regnet_y_3_2gf)."""
    from semanticlidarunc_tpu.models import backbones
    from semanticlidarunc_tpu.models.backbones import grouped_conv_merged

    rng = np.random.default_rng(0)
    for dense_cap in (None, 0):
        if dense_cap is not None:
            monkeypatch.setattr(backbones, "_DENSE_EMBED_MAX_BYTES",
                                dense_cap)
        for groups, gw, stride in ((63, 4, 1), (63, 4, 2), (20, 16, 1),
                                   (24, 4, 1)):
            width = groups * gw
            x = jnp.asarray(rng.standard_normal(
                (1, 4, 6, width)).astype(np.float32))
            k = jnp.asarray((rng.standard_normal(
                (3, 3, gw, width)) * 0.1).astype(np.float32))
            got = grouped_conv_merged(x, k, groups, stride, jnp.float32)
            want = jax.lax.conv_general_dilated(
                x, k, (stride, stride), padding=((1, 1), (1, 1)),
                feature_group_count=groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=0, atol=1e-4)
