"""Tests for the fused Pallas MC-tail reduction (ops/pallas_mc_tail.py).

On CPU the kernel runs in interpreter mode; the math must match both the
pure-JAX oracle and the production XLA tail end-to-end (same model, same
RNG, same dropout masks).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semanticlidarunc_tpu.ops import pallas_mc_tail as pmt


@pytest.mark.parametrize("t,bsz,n,cin,k", [
    (3, 2, 64, 32, 21), (2, 1, 128, 32, 20), (4, 1, 96, 16, 7),
])
def test_kernel_matches_oracle(t, bsz, n, cin, k):
    rng = np.random.default_rng(t * 10 + n)
    pc = 4 * cin
    act = jnp.asarray(rng.standard_normal((t, bsz, n, pc)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((t, bsz, pc)) * 0.5 + 1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((t, bsz, pc)), jnp.float32)
    wl = jnp.asarray(rng.standard_normal((cin, k)), jnp.float32) * 0.3
    bl = jnp.asarray(rng.standard_normal((k,)), jnp.float32)
    ps, hs = pmt.mc_tail_reduce(act, a, b, wl, bl, interpret=True)
    pr, hr = pmt.mc_tail_reduce_reference(act, a, b, wl, bl)
    np.testing.assert_allclose(ps, pr, atol=1e-5)
    np.testing.assert_allclose(hs, hr, atol=1e-5)


def test_kernel_extreme_spread_per_group_max():
    """A phase group whose own max sits ~200 nats below the row max (the
    small-calibration-temperature regime: T folds into wl/bl and multiplies
    logit spreads 100-1000x) must still produce normalized probabilities and
    finite entropies — the per-group max makes this exact, where a shared
    row max would underflow exp to all-zeros for that group."""
    t, bsz, n, cin, k = 2, 1, 64, 16, 5
    pc = 4 * cin
    rng = np.random.default_rng(7)
    act = jnp.asarray(rng.standard_normal((t, bsz, n, pc)), jnp.float32)
    # phase 0 gets a huge affine scale: its logits dwarf every other group's
    a = jnp.ones((t, bsz, pc), jnp.float32).at[:, :, :cin].mul(300.0)
    b = jnp.zeros((t, bsz, pc), jnp.float32)
    wl = jnp.asarray(rng.standard_normal((cin, k)), jnp.float32)
    bl = jnp.zeros((k,), jnp.float32)
    ps, hs = pmt.mc_tail_reduce(act, a, b, wl, bl, interpret=True)
    pr, hr = pmt.mc_tail_reduce_reference(act, a, b, wl, bl)
    # every phase group's probabilities sum to t (T samples of a simplex)
    group_sums = np.asarray(ps).reshape(bsz, n, 4, k).sum(-1)
    np.testing.assert_allclose(group_sums, t, rtol=1e-5)
    assert np.isfinite(np.asarray(hs)).all()
    np.testing.assert_allclose(ps, pr, atol=1e-5)
    np.testing.assert_allclose(hs, hr, atol=1e-4)


def test_pallas_summaries_match_xla_path():
    """mc_fused_summaries(use_pallas=True) == (use_pallas=False) bit-near,
    including temperature scaling and the Dirichlet class_slice."""
    from semanticlidarunc_tpu.models import registry
    from semanticlidarunc_tpu.prob import mc_dropout as mc
    from semanticlidarunc_tpu.utils import config as cfg_util

    cfg = cfg_util.with_extras({
        "dataset_name": "SemanticKitti",
        "model_settings": {
            "baseline": "Reichert", "model_type": "resnet18",
            "loss_function": "CE", "attention": True,
            "multi_scale_meta": True, "normals": True, "reflectivity": True,
            "projection": [32, 128]},
        "train_params": {}})
    model = registry.build_model(cfg)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.random((2, 32, 128, 2)), jnp.float32)
    meta = jnp.asarray(rng.standard_normal((2, 32, 128, 6)), jnp.float32)
    variables = model.init({"params": key, "dropout": key}, x, meta,
                           train=False)
    for kwargs in ({}, {"temperature": 1.7, "class_slice": 16}):
        ref = mc.mc_fused_summaries(model, variables, (x, meta), key, 4,
                                    use_pallas=False, **kwargs)
        got = mc.mc_fused_summaries(model, variables, (x, meta), key, 4,
                                    use_pallas=True, **kwargs)
        for name, r, g in zip(("p_bar", "H", "MI"), ref, got):
            np.testing.assert_allclose(g, r, atol=5e-5, err_msg=name)
