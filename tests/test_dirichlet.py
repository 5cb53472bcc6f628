"""Dirichlet core + loss parity against literal torch/scipy oracles."""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlidarunc_tpu.losses import dirichlet as dl
from semanticlidarunc_tpu.prob import dirichlet as pd
from semanticlidarunc_tpu.prob import prior


def _alpha_labels(rng, b=2, h=6, w=9, c=7):
    shape_logits = rng.standard_normal((b, h, w, c)).astype(np.float32)
    scale_logits = rng.standard_normal((b, h, w, 1)).astype(np.float32) * 2
    alpha = np.asarray(pd.to_alpha_shape_scale(jnp.asarray(shape_logits),
                                               jnp.asarray(scale_logits)))
    labels = rng.integers(0, c, size=(b, h, w))
    labels[rng.random((b, h, w)) < 0.15] = 0
    return alpha, labels


def test_shape_scale_alpha0_identity(rng):
    c = 7
    shape_logits = rng.standard_normal((4, c)).astype(np.float32)
    scale_logits = rng.standard_normal((4, 1)).astype(np.float32)
    alpha = np.asarray(pd.to_alpha_shape_scale(jnp.asarray(shape_logits),
                                               jnp.asarray(scale_logits)))
    s = np.log1p(np.exp(scale_logits[:, 0]))
    # alpha0 = K + s exactly (+ K*eps)
    np.testing.assert_allclose(alpha.sum(-1), c + s, atol=1e-4)
    assert (alpha > 1.0).all()


def test_uncertainties_match_torch(rng):
    torch = pytest.importorskip("torch")
    from torch.special import digamma
    alpha, _ = _alpha_labels(rng)
    a = torch.from_numpy(alpha)
    eps = 1e-8
    a0 = a.sum(-1, keepdim=True) + eps
    p = a / a0
    want_h = -(p * torch.log(p + eps)).sum(-1)
    term = digamma(a + 1.0) - digamma(a0 + 1.0)
    want_au = -(p * term).sum(-1)

    got_h = np.asarray(pd.predictive_entropy(jnp.asarray(alpha)))
    got_au = np.asarray(pd.aleatoric_uncertainty(jnp.asarray(alpha)))
    got_eu = np.asarray(pd.epistemic_uncertainty(jnp.asarray(alpha)))
    np.testing.assert_allclose(got_h, want_h.numpy(), atol=1e-5)
    np.testing.assert_allclose(got_au, want_au.numpy(), atol=1e-5)
    np.testing.assert_allclose(got_eu, (want_h - want_au).numpy(), atol=1e-5)
    # EU >= 0 and H = AU + EU
    assert (got_eu > -1e-5).all()


def test_norm_modes(rng):
    alpha, _ = _alpha_labels(rng)
    a = jnp.asarray(alpha)
    for mode in ("max", "ref"):
        au = np.asarray(pd.aleatoric_uncertainty_norm(a, mode=mode))
        eu = np.asarray(pd.epistemic_uncertainty_norm(a, mode=mode))
        assert ((au >= 0) & (au <= 1)).all()
        assert ((eu >= 0) & (eu <= 1)).all()
    # "ref" mode: AU_vis + EU_vis = 1 by construction
    au = np.asarray(pd.aleatoric_uncertainty_norm(a, mode="ref"))
    eu = np.asarray(pd.epistemic_uncertainty_norm(a, mode="ref"))
    np.testing.assert_allclose(au + eu, 1.0, atol=1e-5)


def test_nll_dircat_scale_invariance(rng):
    alpha, labels = _alpha_labels(rng)
    l1 = float(dl.nll_dirichlet_categorical(jnp.asarray(alpha),
                                            jnp.asarray(labels)))
    l2 = float(dl.nll_dirichlet_categorical(jnp.asarray(alpha * 7.3),
                                            jnp.asarray(labels)))
    assert abs(l1 - l2) < 1e-5


def test_losses_match_torch_oracles(rng):
    torch = pytest.importorskip("torch")
    from torch.special import digamma
    alpha, labels = _alpha_labels(rng)
    a = torch.from_numpy(alpha)
    y = torch.from_numpy(labels).long()
    valid = y != 0
    safe = torch.where(valid, y, torch.zeros_like(y))
    w = valid.float()

    def mmean(per):
        return float((per * w).sum() / w.sum().clamp_min(1.0))

    a0 = a.sum(-1)
    ay = a.gather(-1, safe.unsqueeze(-1)).squeeze(-1)

    # nll dircat
    want = mmean(-(torch.log(ay + 1e-12) - torch.log(a0 + 1e-12)))
    got = float(dl.nll_dirichlet_categorical(jnp.asarray(alpha),
                                             jnp.asarray(labels)))
    assert abs(got - want) < 1e-5

    # digamma CE
    want = mmean(torch.digamma(a0) - torch.digamma(ay))
    got = float(dl.digamma_dirichlet_ce(jnp.asarray(alpha),
                                        jnp.asarray(labels)))
    assert abs(got - want) < 1e-5

    # brier with s_ref
    s_ref = 27.0
    a0k = a.sum(-1, keepdim=True)
    p = a / (a0k + 1e-12)
    sum_p2 = (p * p).sum(-1)
    sum_ep2 = (s_ref * sum_p2 + 1.0) / (s_ref + 1.0)
    ep_y = p.gather(-1, safe.unsqueeze(-1)).squeeze(-1)
    want = mmean(sum_ep2 - 2.0 * ep_y + 1.0)
    got = float(dl.brier_dirichlet(jnp.asarray(alpha), jnp.asarray(labels),
                                   s_ref=s_ref))
    assert abs(got - want) < 1e-5

    # dirichlet mse (Sensoy eq.5)
    import torch.nn.functional as F
    c = alpha.shape[-1]
    one_hot = F.one_hot(safe, c).float()
    a0k = a.sum(-1, keepdim=True)
    p = a / (a0k + 1e-8)
    sq = (one_hot - p) ** 2
    var = a * (a0k - a) / ((a0k * a0k + 1e-8) * (a0k + 1.0))
    want = mmean((sq + var).sum(-1))
    got = float(dl.dirichlet_mse(jnp.asarray(alpha), jnp.asarray(labels)))
    assert abs(got - want) < 1e-5

    # kl off-classes to uniform
    a_t = one_hot + (1.0 - one_hot) * a
    a_t = a_t.clamp_min(1e-8)
    sum_a = a_t.sum(-1)
    t1 = torch.lgamma(sum_a) - torch.lgamma(a_t).sum(-1)
    t2 = ((a_t - 1.0) * (torch.digamma(a_t) -
                         torch.digamma(sum_a).unsqueeze(-1))).sum(-1)
    kl = t1 + t2
    want = float(kl[valid].mean())
    got = float(dl.kl_off_classes_to_uniform(jnp.asarray(alpha),
                                             jnp.asarray(labels)))
    assert abs(got - want) < 3e-4

    # complement KL uniform (gated)
    eps = 1e-8
    a0k = a.sum(-1, keepdim=True) + eps
    p = a / a0k
    py = p.gather(-1, safe.unsqueeze(-1)).clamp_min(eps)
    p_off = p.scatter(-1, safe.unsqueeze(-1), 0.0)
    tilde = p_off / (1.0 - py).clamp_min(eps)
    kl_u = (tilde * tilde.clamp_min(eps).log()).sum(-1) + math.log(c - 1)
    kl_u = kl_u / math.log(c - 1)
    gamma, tau, sigma = 1.25, 0.65, 0.15
    pyg = py.detach()
    w_unc = ((1.0 - pyg).pow(gamma) *
             torch.sigmoid((tau - pyg) / sigma)).squeeze(-1)
    want = mmean(w_unc * kl_u)
    got = float(dl.complement_kl_uniform(jnp.asarray(alpha),
                                         jnp.asarray(labels)))
    assert abs(got - want) < 1e-5

    # wrong-low-evidence
    p_det = (a / a.sum(-1, keepdim=True).clamp_min(1e-8)).detach()
    pred = p_det.argmax(-1)
    wrong = (pred != safe)
    pyd = p_det.gather(-1, safe.unsqueeze(-1)).squeeze(-1).clamp_min(1e-8)
    pmax = p_det.max(-1).values.clamp_min(1e-8)
    mgn = pmax - pyd
    gate = wrong.float() * torch.sigmoid((mgn - 0.05) / 0.08) * w
    tgt = math.log(c + 0.0 + 1e-8)
    per = torch.relu(a.sum(-1).clamp_min(1e-8).log() - tgt).pow(2) * gate
    want = float(per.sum() / gate.sum().clamp_min(1.0))
    got = float(dl.wrong_low_evidence(jnp.asarray(alpha), jnp.asarray(labels)))
    assert abs(got - want) < 1e-5


def test_losses_differentiable(rng):
    alpha, labels = _alpha_labels(rng)
    y = jnp.asarray(labels)
    for fn in (dl.nll_dirichlet_categorical, dl.digamma_dirichlet_ce,
               dl.brier_dirichlet, dl.dirichlet_mse,
               dl.complement_kl_uniform, dl.kl_off_classes_to_uniform,
               dl.wrong_low_evidence):
        g = jax.grad(lambda a: fn(a, y))(jnp.asarray(alpha))
        assert np.isfinite(np.asarray(g)).all(), fn.__name__


def test_prior_solver_matches_mpmath():
    mp = pytest.importorskip("mpmath")
    a0, per = prior.solve_alpha0_for_coverage(p_star=0.90, h=0.05,
                                              delta=0.025, K=20)
    # cross-check coverage at solution with mpmath at high precision
    mp.mp.dps = 50
    a = 0.90 * a0
    b = 0.10 * a0
    cov = mp.betainc(a, b, 0, 0.95, regularized=True) - \
        mp.betainc(a, b, 0, 0.85, regularized=True)
    assert abs(float(cov) - 0.95) < 1e-5
    assert abs(per - a0 / 20) < 1e-12


def test_logit_threshold_for_alpha_cap():
    z_thr, a_thr = prior.logit_threshold_for_alpha_cap(120.0, K=20, m=3,
                                                       margin=0.05)
    # softplus(z_thr) + 1 == a_thr by construction
    assert abs((math.log1p(math.exp(z_thr)) + 1.0) - a_thr) < 1e-9


def test_mc_summaries_consistency(rng):
    from semanticlidarunc_tpu.prob import mc_dropout as mc
    logits = jnp.asarray(rng.standard_normal((5, 2, 4, 4, 6)).astype(np.float32))
    p_bar, h_norm, mi_norm = mc.mc_summaries(logits)
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    np.testing.assert_allclose(np.asarray(p_bar), probs.mean(0), atol=1e-6)
    want_h = -(probs.mean(0) * np.log(probs.mean(0))).sum(-1) / np.log(6)
    np.testing.assert_allclose(np.asarray(h_norm), want_h, atol=1e-5)
    assert (np.asarray(mi_norm) > -1e-6).all()


def test_mc_split_summaries_matches_stacked(rng):
    import jax
    from semanticlidarunc_tpu.models.fpn import SemanticFPN
    from semanticlidarunc_tpu.prob import mc_dropout as mc
    m = SemanticFPN(num_classes=6, backbone="resnet10t", input_channels=2,
                    meta_channels=6)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 16, 32, 2))
    meta = jax.random.normal(key, (1, 16, 32, 6))
    vs = m.init({"params": key, "dropout": key}, x, meta, train=False)
    feats = lambda v, *i, **kw: m.apply(v, *i, method=m.features, **kw)
    # mc_forward_split passes stochastic=True itself; mc_split_summaries
    # expects the caller's head_fn to set it
    head_plain = lambda v, f, **kw: m.apply(v, f, method=m.head, **kw)
    head_stoch = lambda v, f, **kw: m.apply(v, f, method=m.head,
                                            stochastic=True, **kw)
    logits = mc.mc_forward_split(feats, head_plain, vs, (x, meta), key, 4)
    p1, h1, mi1 = mc.mc_summaries(logits)
    p2, h2, mi2 = mc.mc_split_summaries(feats, head_stoch, vs, (x, meta),
                                        key, 4)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mi1), np.asarray(mi2), atol=1e-5)


def test_head_mc_fused_path(rng):
    """Weight-folded MC head: exact at p=0, matching sampling statistics."""
    import jax
    from semanticlidarunc_tpu.models.fpn import SemanticFPN
    from semanticlidarunc_tpu.prob import mc_dropout as mc

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 16, 32, 2))
    meta = jax.random.normal(key, (1, 16, 32, 6))

    m0 = SemanticFPN(num_classes=6, backbone="resnet10t", input_channels=2,
                     meta_channels=6, pyramid_dropout=0.0)
    vs = m0.init({"params": key, "dropout": key}, x, meta, train=False)
    fused = m0.apply(vs, x, meta, train=False, method=m0.features)
    det = m0.apply(vs, fused, stochastic=False, method=m0.head)
    s = m0.apply(vs, fused, key, 3, method=m0.head_mc)
    np.testing.assert_allclose(
        np.asarray(s), np.broadcast_to(np.asarray(det)[None], s.shape),
        atol=1e-4)
    p_bar, h, mi = mc.mc_fused_summaries(m0, vs, (x, meta), key, 3)
    np.testing.assert_allclose(
        np.asarray(p_bar), np.asarray(jax.nn.softmax(det, -1)), atol=1e-5)

    m = SemanticFPN(num_classes=6, backbone="resnet10t", input_channels=2,
                    meta_channels=6, pyramid_dropout=0.1)
    vs = m.init({"params": key, "dropout": key}, x, meta, train=False)
    fused = m.apply(vs, x, meta, train=False, method=m.features)
    s1 = np.asarray(m.apply(vs, fused, key, 32, method=m.head_mc))
    keys = jax.random.split(jax.random.PRNGKey(7), 32)
    s2 = np.asarray(jax.vmap(lambda k: m.apply(
        vs, fused, stochastic=True, method=m.head,
        rngs={"dropout": k}))(keys))
    # same sampling law: per-pixel std across samples agrees within 10%
    v1, v2 = s1.std(axis=0).mean(), s2.std(axis=0).mean()
    assert abs(v1 - v2) / v2 < 0.15


def test_head_mc_batched(rng):
    """Weight-folded MC head at batch > 1: exact at p=0, per-element at p>0
    each batch element matches its own vmapped-head distribution."""
    import jax
    from semanticlidarunc_tpu.models.fpn import SemanticFPN
    from semanticlidarunc_tpu.prob import mc_dropout as mc

    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 16, 32, 2))
    meta = jax.random.normal(key, (2, 16, 32, 6))

    m0 = SemanticFPN(num_classes=6, backbone="resnet10t", input_channels=2,
                     meta_channels=6, pyramid_dropout=0.0)
    vs = m0.init({"params": key, "dropout": key}, x, meta, train=False)
    fused = m0.apply(vs, x, meta, train=False, method=m0.features)
    det = m0.apply(vs, fused, stochastic=False, method=m0.head)
    s = m0.apply(vs, fused, key, 3, method=m0.head_mc)
    assert s.shape == (3, 2) + det.shape[1:]
    np.testing.assert_allclose(
        np.asarray(s), np.broadcast_to(np.asarray(det)[None], s.shape),
        atol=1e-4)
    # the production dispatcher picks the fused path for the FPN and agrees
    p_bar, h, mi = mc.mc_predictive_summaries(m0, vs, (x, meta), key, 3)
    assert p_bar.shape == det.shape
    np.testing.assert_allclose(
        np.asarray(p_bar), np.asarray(jax.nn.softmax(det, -1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mi), 0.0, atol=1e-5)

    # p>0: batched fused samples match the per-element vmapped-head law
    m = SemanticFPN(num_classes=6, backbone="resnet10t", input_channels=2,
                    meta_channels=6, pyramid_dropout=0.1)
    vs = m.init({"params": key, "dropout": key}, x, meta, train=False)
    fused = m.apply(vs, x, meta, train=False, method=m.features)
    s1 = np.asarray(m.apply(vs, fused, key, 32, method=m.head_mc))
    keys = jax.random.split(jax.random.PRNGKey(11), 32)
    s2 = np.asarray(jax.vmap(lambda k: m.apply(
        vs, fused, stochastic=True, method=m.head,
        rngs={"dropout": k}))(keys))
    for b in range(2):
        v1 = s1[:, b].std(axis=0).mean()
        v2 = s2[:, b].std(axis=0).mean()
        assert abs(v1 - v2) / v2 < 0.15


def test_mc_predictive_summaries_class_slice_and_split(rng):
    """Dispatcher: Dirichlet class_slice drops the scale channel; fused and
    split paths agree exactly when dropout is off."""
    import jax
    from semanticlidarunc_tpu.models.fpn import SemanticFPN
    from semanticlidarunc_tpu.prob import mc_dropout as mc

    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (2, 16, 32, 2))
    meta = jax.random.normal(key, (2, 16, 32, 6))
    m = SemanticFPN(num_classes=7, backbone="resnet10t", input_channels=2,
                    meta_channels=6, pyramid_dropout=0.0)
    vs = m.init({"params": key, "dropout": key}, x, meta, train=False)
    p1, h1, mi1 = mc.mc_predictive_summaries(m, vs, (x, meta), key, 2,
                                             class_slice=6)
    assert p1.shape[-1] == 6
    p2, h2, mi2 = mc.mc_split_summaries(
        lambda v, *i, **kw: m.apply(v, *i, method=m.features, **kw),
        lambda v, f, **kw: m.apply(v, f, method=m.head, stochastic=True,
                                   **kw),
        vs, (x, meta), key, 2, class_slice=6)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-5)
