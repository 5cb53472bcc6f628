"""CENet / FIDNet baseline tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semanticlidarunc_tpu.models.cenet import (CENet, hard_link,
                                               resize_align_corners)
from semanticlidarunc_tpu.models.fidnet import FIDNet


def test_hard_link_channel_arithmetic():
    # HarDBlock(128, gr=16, grmul=1.6, n=8) must produce 130 output channels
    # (reference aux_head1 input width, CENet_HardDNet.py:252)
    total = 0
    for i in range(8):
        outch, _, _ = hard_link(i + 1, 128, 16, 1.6)
        if i % 2 == 0 or i == 7:
            total += outch
    assert total == 130


def test_resize_align_corners_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).standard_normal((1, 5, 9, 3)).astype(np.float32)
    got = np.asarray(resize_align_corners(jnp.asarray(x), 20, 36))
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(20, 36),
        mode="bilinear", align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("trunk", ["HarDNet", "ResNet_34"])
def test_cenet_aux_outputs(trunk):
    m = CENet(6, aux=True, model=trunk)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 16, 32, 5))
    vs = m.init({"params": rng}, x, train=False)
    out = m.apply(vs, x, train=False)
    assert isinstance(out, list) and len(out) == 4
    for o in out:
        assert o.shape == (1, 16, 32, 6)
        np.testing.assert_allclose(np.asarray(o.sum(-1)), 1.0, atol=1e-5)


def test_fidnet_logits():
    m = FIDNet(6)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 16, 32, 5))
    vs = m.init({"params": rng}, x, train=False)
    out = m.apply(vs, x, train=False)
    assert out.shape == (1, 16, 32, 6)
    # raw logits, not probabilities
    assert not np.allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-2)


def test_fpn_elu_head_positive():
    from semanticlidarunc_tpu.models.fpn import SemanticFPN
    m = SemanticFPN(num_classes=5, backbone="resnet10t", input_channels=2,
                    meta_channels=6, head_activation="elu_plus_one")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 16, 32, 2))
    meta = jax.random.normal(rng, (1, 16, 32, 6))
    vs = m.init({"params": rng, "dropout": rng}, x, meta, train=False)
    out = m.apply(vs, x, meta, train=False)
    assert (np.asarray(out) > 0).all()
