"""Dirichlet evidential losses and regularizers.

Functional JAX ports of /root/reference/src/losses/dirichlet_losses.py and
/root/reference/src/losses/regularizers.py. All take channel-last alpha
([..., C], every entry > 0) and integer labels ([...]); reductions are means
over valid (non-ignored) pixels, matching the reference exactly. Gates use
`stop_gradient` where the reference detaches.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln

from .segmentation import valid_mask


def _masked_mean(per_pixel, mask):
    w = mask.astype(per_pixel.dtype)
    return jnp.sum(per_pixel * w) / jnp.clip(jnp.sum(w), 1.0)


def _gather_y(x, labels):
    """x [..., C], labels [...] -> x_y [...]."""
    return jnp.take_along_axis(x, labels[..., None], axis=-1)[..., 0]


def nll_dirichlet_categorical(alpha, labels, ignore_index=0, eps=1e-12):
    """-log E[p_y] = -(log alpha_y - log alpha0); scale-invariant
    (reference dirichlet_losses.py:73-119)."""
    mask = valid_mask(labels, ignore_index)
    safe = jnp.where(mask, labels, 0)
    a0 = alpha.sum(axis=-1)
    ay = _gather_y(alpha, safe)
    per = -(jnp.log(ay + eps) - jnp.log(a0 + eps))
    return _masked_mean(per, mask)


def digamma_dirichlet_ce(alpha, labels, ignore_index=0):
    """E[-log p_y] = psi(alpha0) - psi(alpha_y); scale-sensitive
    (reference :122-167)."""
    mask = valid_mask(labels, ignore_index)
    safe = jnp.where(mask, labels, 0)
    per = digamma(alpha.sum(axis=-1)) - digamma(_gather_y(alpha, safe))
    return _masked_mean(per, mask)


def brier_dirichlet(alpha, labels, ignore_index=0, s_ref: float | None = None,
                    eps=1e-12):
    """Expected Brier score under the Dirichlet predictive; optional constant
    s_ref replaces alpha0 for scale-freedom (reference :174-220)."""
    mask = valid_mask(labels, ignore_index)
    safe = jnp.where(mask, labels, 0)
    a0 = alpha.sum(axis=-1, keepdims=True)
    p = alpha / (a0 + eps)
    sum_p2 = jnp.sum(p * p, axis=-1)
    s = a0[..., 0] if s_ref is None else jnp.asarray(float(s_ref), alpha.dtype)
    sum_ep2 = (s * sum_p2 + 1.0) / (s + 1.0)
    ep_y = _gather_y(p, safe)
    per = sum_ep2 - 2.0 * ep_y + 1.0
    return _masked_mean(per, mask)


def dirichlet_mse(alpha, labels, ignore_index=0, eps=1e-8):
    """Sensoy et al. 2018 Eq. 5: sum_c[(y - p_hat)^2 + Var_c] — the reference
    loss for GradNorm and the only active fit term in shipped configs
    (reference :317-385, configs/SemanticKitti_default.yaml:61)."""
    c = alpha.shape[-1]
    mask = valid_mask(labels, ignore_index)
    safe = jnp.where(mask, labels, 0)
    a0 = alpha.sum(axis=-1, keepdims=True)
    p = alpha / (a0 + eps)
    y = jax.nn.one_hot(safe, c, dtype=alpha.dtype)
    sq = (y - p) ** 2
    var = alpha * (a0 - alpha) / ((a0 * a0 + eps) * (a0 + 1.0))
    per = jnp.sum(sq + var, axis=-1)
    return _masked_mean(per, mask)


def complement_kl_uniform(alpha, labels, ignore_index=0, gamma=1.25,
                          tau=0.65, sigma=0.15, s_target: float | None = None,
                          normalize=True, eps=1e-8, detach_uncert=True):
    """Gated KL(off-class conditional || uniform) with a DETACHED p_y gate
    (reference dirichlet_losses.py:228-314; trainer init values :339)."""
    c = alpha.shape[-1]
    if c <= 2:
        return jnp.asarray(0.0, alpha.dtype)
    mask = valid_mask(labels, ignore_index)
    safe = jnp.where(mask, labels, 0)
    a0 = alpha.sum(axis=-1, keepdims=True) + eps
    p = alpha / a0
    y = jax.nn.one_hot(safe, c, dtype=jnp.bool_)
    py = jnp.clip(_gather_y(p, safe), eps)
    p_off = jnp.where(y, 0.0, p)
    tilde = p_off / jnp.clip(1.0 - py[..., None], eps)
    kl_u = jnp.sum(tilde * jnp.log(jnp.clip(tilde, eps)), axis=-1) + \
        math.log(c - 1)
    if normalize:
        kl_u = kl_u / math.log(c - 1)
    py_gate = jax.lax.stop_gradient(py) if detach_uncert else py
    w_uncert = (1.0 - py_gate) ** gamma * \
        jax.nn.sigmoid((tau - py_gate) / sigma)
    if s_target is not None:
        w_evid = float(s_target) / (jax.lax.stop_gradient(a0[..., 0]) +
                                    float(s_target))
        w_uncert = w_uncert * w_evid
    return _masked_mean(w_uncert * kl_u, mask)


def kl_off_classes_to_uniform(alpha, labels, ignore_index=0,
                              with_conf_weighting=False, gamma=1.0, eps=1e-8):
    """KL( Dir(y + (1-y) alpha) || Dir(1) ) — pushes off-class evidence to 1
    (reference regularizers.py:291-388)."""
    c = alpha.shape[-1]
    mask = valid_mask(labels, ignore_index)
    safe = jnp.where(mask, labels, 0)
    y = jax.nn.one_hot(safe, c, dtype=alpha.dtype)
    a_t = jnp.clip(y + (1.0 - y) * alpha, eps)
    sum_a = a_t.sum(axis=-1)
    term1 = gammaln(sum_a) - jnp.sum(gammaln(a_t), axis=-1)
    term2 = jnp.sum((a_t - 1.0) * (digamma(a_t) -
                                   digamma(sum_a)[..., None]), axis=-1)
    kl = term1 + term2
    if with_conf_weighting:
        a0 = alpha.sum(axis=-1, keepdims=True)
        p_y = _gather_y(alpha / (a0 + eps), safe)
        w = jax.lax.stop_gradient(jnp.clip(1.0 - p_y, 0.0, 1.0) ** gamma)
        w = w * mask.astype(w.dtype)
        return jnp.sum(kl * w) / jnp.clip(jnp.sum(w), 1.0)
    return _masked_mean(kl, mask)


def wrong_low_evidence(alpha, labels, ignore_index=0, s_low=0.0, margin=0.05,
                       soft_margin_k=0.08, eps=1e-8):
    """Squared hinge on log(alpha0) above log(C + s_low), gated (detached) on
    wrong-argmax pixels with a confidence margin (reference regularizers.py:
    218-289). Averaged over ACTIVE wrong pixels, not all valid pixels."""
    c = alpha.shape[-1]
    mask = valid_mask(labels, ignore_index)
    safe = jnp.where(mask, labels, 0)
    a0 = jnp.clip(alpha.sum(axis=-1, keepdims=True), eps)
    p = alpha / a0

    p_det = jax.lax.stop_gradient(p)
    pred = jnp.argmax(p_det, axis=-1)
    wrong = pred != safe
    py = jnp.clip(_gather_y(p_det, safe), eps)
    pmax = jnp.clip(jnp.max(p_det, axis=-1), eps)
    m = pmax - py
    if margin > 0.0:
        gate_m = jax.nn.sigmoid((m - margin) / soft_margin_k) \
            if soft_margin_k > 0.0 else (m > margin).astype(p.dtype)
    else:
        gate_m = jnp.ones_like(m)
    gate = wrong.astype(p.dtype) * gate_m * mask.astype(p.dtype)
    gate = jax.lax.stop_gradient(gate)

    target_log = math.log(c + s_low + eps)
    per = jnp.clip(jnp.log(a0[..., 0]) - target_log, 0.0) ** 2 * gate
    return jnp.sum(per) / jnp.clip(jnp.sum(gate), 1.0)


def evidence_reg(alpha, labels=None, ignore_index=None, *, s_target: float,
                 mode: str = "log_squared", margin: float = 0.1,
                 scale_correct: bool = False):
    """Direct regularizer on alpha0 (reference regularizers.py:149-211)."""
    a0 = alpha.sum(axis=-1) + 1e-8
    mask = jnp.ones(a0.shape, bool) if labels is None \
        else valid_mask(labels, ignore_index)
    s = float(s_target)
    if mode == "log_squared":
        per = jnp.log(a0 / s) ** 2
        if scale_correct:
            per = (a0 / s) * per
    elif mode == "one_sided":
        per = jnp.clip(a0 - s * (1.0 + margin), 0.0) ** 2
    else:  # "l2"
        per = (a0 - s) ** 2
    return _masked_mean(per, mask)


def evidence_reg_band(alpha, labels=None, ignore_index=None, *,
                      s_target: float, band: float = 0.10):
    """Two-sided log spring with dead-zone band (reference :116-147)."""
    a0 = alpha.sum(axis=-1) + 1e-8
    mask = jnp.ones(a0.shape, bool) if labels is None \
        else valid_mask(labels, ignore_index)
    s = float(s_target)
    over = jnp.clip(jnp.log(a0 / (s * (1.0 + band))), 0.0)
    under = jnp.clip(jnp.log((s * (1.0 - band)) / a0), 0.0)
    return _masked_mean(over ** 2 + under ** 2, mask)


def logit_reg(logits, labels=None, ignore_index=None,
              threshold: float | None = None):
    """Hinge-squared on raw logits (reference regularizers.py:75-110)."""
    per = logits ** 2 if threshold is None \
        else jnp.clip(logits - float(threshold), 0.0) ** 2
    per = per.mean(axis=-1)
    mask = jnp.ones(per.shape, bool) if labels is None \
        else valid_mask(labels, ignore_index)
    return _masked_mean(per, mask)
