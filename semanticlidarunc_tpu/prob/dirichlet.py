"""Dirichlet evidential uncertainty core.

Functional JAX port of /root/reference/src/models/probability_helper.py
(logits->alpha maps :81-108; entropy/AU/EU and normalized variants :116-247).
All arrays are channel-last ([..., C]); every function is jit/vmap/grad-safe
and takes eps/T explicitly instead of the reference's module-global knobs
(:12-37) — globals don't compose with jit.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

EPS = 1e-8  # reference default _EPS (probability_helper.py:14)


def to_alpha(logits: jnp.ndarray, T: float = 1.0, eps: float = EPS) -> jnp.ndarray:
    """alpha = softplus(z/T) + 1 + eps (reference :81-87)."""
    return jax.nn.softplus(logits / T) + 1.0 + eps


def to_alpha_shape_scale(shape_logits: jnp.ndarray, scale_logits: jnp.ndarray,
                         T: float = 1.0, eps: float = EPS) -> jnp.ndarray:
    """Shape-scale parametrization used in training (reference :89-105):

    alpha = 1 + softplus(scale/T) * softmax(shape) + eps, so that
    alpha0 = K + s exactly — the scale head controls total evidence and the
    shape head controls its allocation.

    shape_logits [..., C], scale_logits [..., 1].
    """
    s = jax.nn.softplus(scale_logits / T)
    p = jax.nn.softmax(shape_logits, axis=-1)
    return 1.0 + s * p + eps


def split_dirichlet_logits(outputs: jnp.ndarray, num_classes: int):
    """Split the network's K+1 channels into (shape [...,K], scale [...,1])
    (reference trainer.py:533-534)."""
    return outputs[..., :num_classes], outputs[..., num_classes:num_classes + 1]


def mean_probs(alpha: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    a0 = alpha.sum(axis=-1, keepdims=True) + eps
    return alpha / a0


def predictive_entropy(alpha: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """H[E[p]] (reference :116-121)."""
    p = mean_probs(alpha, eps)
    return -jnp.sum(p * jnp.log(p + eps), axis=-1)


def aleatoric_uncertainty(alpha: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """AU = -sum p_hat (psi(alpha+1) - psi(alpha0+1)) (reference :124-130)."""
    a0 = alpha.sum(axis=-1, keepdims=True) + eps
    term = jax.scipy.special.digamma(alpha + 1.0) - \
        jax.scipy.special.digamma(a0 + 1.0)
    p = alpha / a0
    return -jnp.sum(p * term, axis=-1)


def epistemic_uncertainty(alpha: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    return predictive_entropy(alpha, eps) - aleatoric_uncertainty(alpha, eps)


mutual_information = epistemic_uncertainty  # Dirichlet MI == EU


# ---- normalized variants (reference :147-216) ----

def _au_ref(c: int) -> float:
    """psi(C+1) - psi(2) = H_C - 1, the AU of a flat Dirichlet."""
    import scipy.special as sp
    return float(sp.digamma(c + 1) - sp.digamma(2.0))


def predictive_entropy_norm(alpha: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    return predictive_entropy(alpha, eps) / math.log(alpha.shape[-1])


def aleatoric_uncertainty_norm(alpha: jnp.ndarray, eps: float = EPS,
                               mode: str = "max") -> jnp.ndarray:
    c = alpha.shape[-1]
    au = aleatoric_uncertainty(alpha, eps)
    if mode == "max":
        return jnp.clip(au / math.log(c), 0.0, 1.0)
    if mode == "ref":
        au_ref = _au_ref(c)
        eu_span = max(math.log(c) - au_ref, eps)
        raw = (au - au_ref) / eu_span
        lo = -au_ref / eu_span
        return jnp.clip((raw - lo) / (1.0 - lo), 0.0, 1.0)
    raise ValueError(f"Unknown mode: {mode}")


def epistemic_uncertainty_norm(alpha: jnp.ndarray, eps: float = EPS,
                               mode: str = "max") -> jnp.ndarray:
    c = alpha.shape[-1]
    if mode == "max":
        return jnp.clip(epistemic_uncertainty(alpha, eps) / math.log(c), 0.0, 1.0)
    if mode == "ref":
        return jnp.clip(1.0 - aleatoric_uncertainty_norm(alpha, eps, "ref"),
                        0.0, 1.0)
    raise ValueError(f"Unknown mode: {mode}")


def aleatoric_fraction(alpha: jnp.ndarray, eps: float = EPS,
                       min_h: float = EPS) -> jnp.ndarray:
    h = predictive_entropy(alpha, eps)
    au = aleatoric_uncertainty(alpha, eps)
    return jnp.clip(au / jnp.clip(h, min_h), 0.0, 1.0)


def epistemic_fraction(alpha: jnp.ndarray, eps: float = EPS,
                       min_h: float = EPS) -> jnp.ndarray:
    h = predictive_entropy(alpha, eps)
    eu = epistemic_uncertainty(alpha, eps)
    return jnp.clip(eu / jnp.clip(h, min_h), 0.0, 1.0)


def eu_minus_au_fraction(alpha: jnp.ndarray, eps: float = EPS,
                         min_h: float = EPS) -> jnp.ndarray:
    return jnp.clip(epistemic_fraction(alpha, eps, min_h) -
                    aleatoric_fraction(alpha, eps, min_h), -1.0, 1.0)


# ---- entropy/error analysis (reference :389-450) ----

def entropy_error_iou(entropy_norm: jnp.ndarray, error_mask: jnp.ndarray,
                      thresholds: jnp.ndarray) -> jnp.ndarray:
    """IoU between {entropy > tau} and the error mask, per threshold."""
    e = entropy_norm.reshape(-1)
    err = error_mask.reshape(-1) > 0.5
    pred = e[None, :] > thresholds[:, None]
    inter = jnp.sum(pred & err[None, :], axis=1).astype(jnp.float32)
    union = jnp.sum(pred | err[None, :], axis=1).astype(jnp.float32)
    return jnp.where(union > 0, inter / union, 0.0)


def entropy_error_iou_stats(entropy_norm: jnp.ndarray,
                            error_mask: jnp.ndarray,
                            valid: jnp.ndarray,
                            thresholds: jnp.ndarray):
    """(inter, union) per threshold over valid pixels — the streaming
    sufficient statistics of `entropy_error_iou`, accumulable across batches
    (IoU = inter/union at epoch end)."""
    e = entropy_norm.reshape(-1)
    v = valid.reshape(-1)
    err = (error_mask.reshape(-1) > 0.5) & v
    pred = (e[None, :] > thresholds[:, None]) & v[None, :]
    inter = jnp.sum(pred & err[None, :], axis=1).astype(jnp.float32)
    union = jnp.sum(pred | err[None, :], axis=1).astype(jnp.float32)
    return inter, union


def entropy_reliability(entropy_norm: jnp.ndarray, error_mask: jnp.ndarray,
                        n_bins: int = 10):
    """(totals, errors, err_rate, ece): does entropy predict error frequency?
    (reference :425-450, bucketize semantics)."""
    h = entropy_norm.reshape(-1)
    e = error_mask.reshape(-1).astype(jnp.float32)
    edges = jnp.linspace(0.0, 1.0, n_bins + 1)
    centers = 0.5 * (edges[:-1] + edges[1:])
    bins = jnp.clip(jnp.searchsorted(edges, h, side="right"), 0, n_bins) - 1
    bins = jnp.clip(bins, 0, n_bins - 1)
    totals = jnp.zeros(n_bins).at[bins].add(1.0)
    errors = jnp.zeros(n_bins).at[bins].add(e)
    rate = jnp.where(totals > 0, errors / jnp.clip(totals, 1.0), 0.0)
    n = h.shape[0]
    ece = jnp.sum(totals / max(n, 1) * jnp.abs(centers - rate))
    return totals, errors, rate, ece


def entropy_reliability_stats(entropy_norm: jnp.ndarray,
                              error_mask: jnp.ndarray, valid: jnp.ndarray,
                              n_bins: int = 10):
    """(totals, errors) per entropy bin over valid pixels — streaming form
    of `entropy_reliability`; err_rate/ECE derive on host at epoch end."""
    h = entropy_norm.reshape(-1)
    v = valid.reshape(-1)
    e = (error_mask.reshape(-1) > 0.5) & v
    edges = jnp.linspace(0.0, 1.0, n_bins + 1)
    bins = jnp.clip(jnp.searchsorted(edges, h, side="right") - 1, 0,
                    n_bins - 1)
    bins = jnp.where(v, bins, n_bins)   # invalid pixels -> overflow bin
    totals = jnp.zeros(n_bins + 1).at[bins].add(1.0)[:n_bins]
    errors = jnp.zeros(n_bins + 1).at[bins].add(
        e.astype(jnp.float32))[:n_bins]
    return totals, errors


def entropy_reliability_ece(totals, errors, n_bins: int = 10):
    """Host-side finish: (err_rate, ece) from accumulated bin stats."""
    import numpy as np
    totals = np.asarray(totals, np.float64)
    errors = np.asarray(errors, np.float64)
    centers = (np.arange(n_bins) + 0.5) / n_bins
    rate = np.divide(errors, totals, out=np.zeros_like(errors),
                     where=totals > 0)
    n = max(1.0, totals.sum())
    ece = float(np.sum(totals / n * np.abs(centers - rate)))
    return rate, ece


def mc_reliability_stats(rng: jax.Array, alpha: jnp.ndarray,
                         y_true: jnp.ndarray, valid: jnp.ndarray,
                         n_bins: int = 10, n_samples: int = 64,
                         eps: float = EPS):
    """(hits, totals) of `mc_reliability_bins` restricted to valid pixels —
    accumulable across batches."""
    samples = sample_dirichlet(rng, alpha, n_samples)
    agree = (jnp.argmax(samples, axis=-1) == y_true[None]).mean(axis=0)
    conf = jnp.clip(agree.reshape(-1), eps, 1.0 - eps)
    pred1 = jnp.argmax(mean_probs(alpha, eps), axis=-1).reshape(-1)
    correct1 = (pred1 == y_true.reshape(-1)).astype(jnp.float32)
    v = valid.reshape(-1)
    bin_id = jnp.clip((conf * n_bins).astype(jnp.int32), 0, n_bins - 1)
    bin_id = jnp.where(v, bin_id, n_bins)
    totals = jnp.zeros(n_bins + 1).at[bin_id].add(1.0)[:n_bins]
    hits = jnp.zeros(n_bins + 1).at[bin_id].add(correct1)[:n_bins]
    return hits, totals


def dirichlet_health(alpha: jnp.ndarray, labels: jnp.ndarray,
                     ignore_index: int | None = 0, eps: float = EPS) -> dict:
    """Training-health diagnostics over valid pixels (the reference logs
    these to TensorBoard every 20 steps, trainer.py:847-948): alpha0
    percentiles, top-1 alpha share percentiles and >=0.9 fraction, wrong-
    argmax rate, and H_norm coverage buckets."""
    valid = jnp.ones(labels.shape, bool) if ignore_index is None \
        else labels != ignore_index
    nan = jnp.asarray(jnp.nan, jnp.float32)
    a0 = alpha.sum(axis=-1)
    a0_v = jnp.where(valid, a0, nan).reshape(-1)
    top1 = jnp.max(alpha, axis=-1) / (a0 + eps)
    top1_v = jnp.where(valid, top1, nan).reshape(-1)
    qs = jnp.asarray([0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99])
    a0_q = jnp.nanquantile(a0_v, qs)
    t1_q = jnp.nanquantile(top1_v, qs)
    hn = predictive_entropy_norm(alpha, eps)
    hn_v = jnp.where(valid, hn, nan).reshape(-1)
    nvalid = jnp.clip(jnp.sum(valid), 1)
    cover = [jnp.sum(valid & (hn < t)) / nvalid for t in (0.25, 0.5, 0.75)]
    pred = jnp.argmax(alpha, axis=-1)
    wrong = jnp.sum(valid & (pred != labels)) / nvalid
    # gate activity of the comp / wle loss terms (reference logs these at
    # trainer.py:901-942); constants match the Trainer's loss wiring
    safe = jnp.where(valid, labels, 0)
    p = alpha / (a0[..., None] + eps)
    py = jnp.clip(jnp.take_along_axis(p, safe[..., None], -1)[..., 0], eps)
    comp_gate = (1.0 - py) ** 1.25 * jax.nn.sigmoid((0.65 - py) / 0.15)
    pmax = jnp.max(p, axis=-1)
    wle_gate = (pred != safe).astype(p.dtype) * \
        jax.nn.sigmoid(((pmax - py) - 0.05) / 0.08)
    vf = valid.astype(p.dtype)
    out = {"wrong_rate": wrong,
           "top1_ge_0.9": jnp.sum(valid & (top1 >= 0.9)) / nvalid,
           "H_norm_mean": jnp.nanmean(hn_v),
           "comp_gate_mean": jnp.sum(comp_gate * vf) / nvalid,
           "wle_active_rate": jnp.sum(wle_gate * vf) / nvalid}
    for i, q in enumerate((1, 5, 25, 50, 75, 95, 99)):
        out[f"alpha0_p{q:02d}"] = a0_q[i]
        out[f"top1_p{q:02d}"] = t1_q[i]
    for t, c in zip((0.25, 0.5, 0.75), cover):
        out[f"H_norm_lt_{t}"] = c
    return out


def _gamma_fixed_rounds(key: jax.Array, alpha: jnp.ndarray,
                        n_rounds: int = 6, eps: float = EPS) -> jnp.ndarray:
    """Gamma(alpha, 1) draws via UNROLLED Marsaglia-Tsang rejection.

    `jax.random.gamma` lowers to a per-element rejection while_loop, which
    (a) is a serialization point on the TPU VPU and (b) makes the GSPMD
    partitioner pathologically slow when it appears in a sharded program
    (round-5 measurement: the mesh eval step compiled in 273-477 s with the
    while_loop sampler vs 7 s without it, even hidden inside a shard_map).
    This version unrolls a FIXED number of Marsaglia-Tsang acceptance
    rounds as straight-line elementwise code: per-round acceptance is
    >= 0.95 for every alpha (with the standard +1 boost for alpha < 1), so
    all n_rounds=6 rounds fail with probability < 1e-8, in which case the
    mode-proportional candidate d = alpha_eff - 1/3 is used. The <1e-8
    truncation bias is irrelevant for the MC-reliability diagram this
    feeds (a 10-bin visualization statistic).
    """
    a = jnp.maximum(alpha.astype(jnp.float32), eps)
    boost = a < 1.0
    ae = jnp.where(boost, a + 1.0, a)
    d = ae - 1.0 / 3.0
    c = 1.0 / jnp.sqrt(9.0 * d)
    val = d                          # fallback candidate (the mode of G(ae))
    accepted = jnp.zeros(a.shape, bool)
    for i in range(n_rounds):
        kx, ku = jax.random.split(jax.random.fold_in(key, i))
        x = jax.random.normal(kx, a.shape, jnp.float32)
        v = (1.0 + c * x) ** 3
        u = jax.random.uniform(ku, a.shape, jnp.float32, minval=eps)
        ok = (v > 0) & (jnp.log(u) < 0.5 * x * x + d - d * v +
                        d * jnp.log(jnp.maximum(v, eps)))
        val = jnp.where(ok & ~accepted, d * v, val)
        accepted |= ok
    ub = jax.random.uniform(jax.random.fold_in(key, n_rounds), a.shape,
                            jnp.float32, minval=eps)
    val = val * jnp.where(boost, ub ** (1.0 / a), 1.0)
    return jnp.maximum(val, eps)


def sample_dirichlet(rng: jax.Array, alpha: jnp.ndarray,
                     n_samples: int) -> jnp.ndarray:
    """[M, ..., C] Dirichlet draws via normalized Gamma samples."""
    g = _gamma_fixed_rounds(
        rng, jnp.broadcast_to(alpha, (n_samples,) + alpha.shape))
    return g / jnp.sum(g, axis=-1, keepdims=True)


def mc_reliability_bins(rng: jax.Array, alpha: jnp.ndarray, y_true: jnp.ndarray,
                        n_bins: int = 10, n_samples: int = 64,
                        eps: float = EPS):
    """(hits, totals): empirical argmax-agreement confidence vs 1-shot
    correctness (reference :339-366)."""
    samples = sample_dirichlet(rng, alpha, n_samples)
    max_s = jnp.argmax(samples, axis=-1)
    agree = (max_s == y_true[None]).mean(axis=0)
    conf = jnp.clip(agree.reshape(-1), eps, 1.0 - eps)
    pred1 = jnp.argmax(mean_probs(alpha, eps), axis=-1).reshape(-1)
    correct1 = (pred1 == y_true.reshape(-1)).astype(jnp.float32)
    bin_id = jnp.clip((conf * n_bins).astype(jnp.int32), 0, n_bins - 1)
    totals = jnp.zeros(n_bins).at[bin_id].add(1.0)
    hits = jnp.zeros(n_bins).at[bin_id].add(correct1)
    return hits, totals


def entropy_from_logistic_normal(rng: jax.Array, logits_mean: jnp.ndarray,
                                 logits_var: jnp.ndarray, k: int = 16,
                                 T: float = 1.0, eps: float = EPS):
    """MC predictive entropy of a logistic-normal output (ADF-style heads,
    reference :453-484). Returns (H, H_norm)."""
    c = logits_mean.shape[-1]
    std = jnp.sqrt(jnp.clip(logits_var, 0.0) + eps)
    noise = jax.random.normal(rng, (k,) + logits_mean.shape, logits_mean.dtype)
    samples = (logits_mean[None] + noise * std[None]) / max(T, eps)
    p_bar = jax.nn.softmax(samples, axis=-1).mean(axis=0)
    h = -jnp.sum(jnp.log(jnp.clip(p_bar, eps)) * p_bar, axis=-1)
    return h, h / math.log(c)


def plot_entropy_error_iou(mean_ious, thresholds, save_path=None, dpi=300):
    """Mean IoU between error mask and entropy-threshold mask vs threshold
    (reference probability_helper.py:411-421)."""
    import numpy as np
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5), constrained_layout=True)
    ax.set_ylim(0, 1)
    ax.set_xlim(0, 1)
    ax.plot(np.asarray(thresholds), np.asarray(mean_ious), marker="o")
    ax.set_xlabel("Entropy threshold")
    ax.set_ylabel("Mean IoU")
    ax.set_title("Mean IoU between Error Mask and Entropy-Threshold Mask")
    ax.grid(True, linestyle=":")
    if save_path:
        fig.savefig(save_path, dpi=dpi, bbox_inches="tight")
    plt.close(fig)
    return fig
