"""Fused Pallas ASPP (ops/pallas_aspp.py) vs FIDNet's XLA `aspp` method.

On CPU the kernel runs in interpreter mode. f32 compute must match the
model's eval-mode ASPP (conv + running-stats BN + leaky) to float precision;
the bf16 production dtype stays within bf16 rounding of it.
"""
import jax
import jax.numpy as jnp
import numpy as np

from semanticlidarunc_tpu.models.fidnet import FIDNet
from semanticlidarunc_tpu.ops import pallas_aspp as pa


def _build(h=32, w=96, nc=6):
    model = FIDNet(nc)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, h, w, 5))
    variables = model.init({"params": key}, x, train=False)
    # randomize BN stats so the folded affine is actually exercised
    stats = jax.tree_util.tree_map(lambda v: v, variables["batch_stats"])
    for i in range(1, 4):
        bn = stats[f"BatchNorm_{i}"]
        k1 = jax.random.fold_in(key, i)
        bn["mean"] = jax.random.normal(k1, bn["mean"].shape) * 0.5
        bn["var"] = jax.random.uniform(jax.random.fold_in(k1, 1),
                                       bn["var"].shape, minval=0.5,
                                       maxval=2.0)
    variables = {"params": variables["params"], "batch_stats": stats}
    res = model.apply(variables, x, train=False, method=FIDNet.pre_aspp)
    return model, variables, res


def test_fused_aspp_matches_model_aspp_f32():
    model, variables, res = _build()
    want = np.asarray(model.apply(variables, res, train=False,
                                  method=FIDNet.aspp))
    got = np.asarray(pa.fused_aspp(
        res, *pa.fold_fidnet_aspp(variables), wt=32, rg=8, interpret=True,
        compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fused_aspp_bf16_within_rounding():
    model, variables, res = _build()
    want = np.asarray(model.apply(variables, res, train=False,
                                  method=FIDNet.aspp))
    got = np.asarray(pa.fused_aspp(
        res, *pa.fold_fidnet_aspp(variables), wt=32, rg=8, interpret=True))
    err = np.abs(got - want)
    scale = np.abs(want).mean() + 1e-3
    assert err.mean() / scale < 2e-2, (err.mean(), scale)


def test_fused_aspp_ragged_width_and_gate():
    """W not a multiple of the tile width is padded internally and sliced
    back; the shape gate accepts/rejects correctly."""
    model, variables, res = _build(h=32, w=80)   # 80 % 32 != 0
    want = np.asarray(model.apply(variables, res, train=False,
                                  method=FIDNet.aspp))
    got = np.asarray(pa.fused_aspp(
        res, *pa.fold_fidnet_aspp(variables), wt=32, rg=8, interpret=True,
        compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, atol=2e-5)
    assert pa.can_fused_aspp((1, 32, 80, 768))
    assert not pa.can_fused_aspp((1, 30, 80, 768))   # H % rg != 0
    assert not pa.can_fused_aspp((1, 32, 80, 700))   # C not lane-aligned
