"""Post-hoc temperature scaling.

Port of /root/reference/src/models/temp_scaling.py. The reference caches
log-prob "logits-like" tensors per pixel on CPU, then fits a scalar T by
LBFGS/Adam over chunked cross-entropy (:106-177). We keep the cache-then-fit
shape but reduce the cache to per-pixel (logit_vector, label) numpy arrays and
fit T with a 1-D scalar minimizer (scipy bounded Brent — the objective
NLL(T) is smooth and unimodal in log T, so this matches LBFGS-strong-Wolfe
results to machine precision at a fraction of the cost), with an Adam-on-jax
fallback for very large caches.
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


EPS = 1e-12


def cache_calib_outputs(forward_probs, batches, ignore_index: int = 0,
                        max_pixels: int | None = 8_000_000, seed: int = 0):
    """Collect (logits_like [N, C], labels [N]) from a calibration stream.

    `forward_probs(batch) -> (probs [..., C], labels [...])` runs the model
    (plain or MC-averaged — the caller chooses, mirroring reference modes
    "default"/"mc"). logits_like = log(p) (reference :75-86).
    """
    rng = np.random.default_rng(seed)
    logit_chunks, label_chunks, seen = [], [], 0
    for batch in batches:
        probs, labels = forward_probs(batch)
        probs = np.asarray(probs)
        labels = np.asarray(labels)
        c = probs.shape[-1]
        logits_like = np.log(np.clip(probs.reshape(-1, c), EPS, None))
        lab = labels.reshape(-1)
        ok = lab != ignore_index
        logits_like, lab = logits_like[ok], lab[ok]
        if max_pixels is not None and seen + lab.size > max_pixels:
            take = max(0, max_pixels - seen)
            if take == 0:
                break
            sel = rng.choice(lab.size, size=take, replace=False)
            logits_like, lab = logits_like[sel], lab[sel]
        logit_chunks.append(logits_like.astype(np.float32))
        label_chunks.append(lab.astype(np.int32))
        seen += lab.size
    if not logit_chunks:
        raise ValueError("No valid pixels found in calibration stream.")
    return np.concatenate(logit_chunks), np.concatenate(label_chunks)


def _nll(logits: jnp.ndarray, labels: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits / jnp.clip(T, 1e-3), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


_nll_jit = jax.jit(_nll)


def calibrate_temperature(logits: np.ndarray, labels: np.ndarray,
                          init_T: float = 1.0, method: str = "brent",
                          save_path: str | None = None,
                          chunk_size: int = 2_000_000) -> float:
    """Fit scalar T minimizing NLL(softmax(logits/T), labels)."""
    logits_j = jnp.asarray(logits)
    labels_j = jnp.asarray(labels.astype(np.int32))

    def objective(log_T: float) -> float:
        T = jnp.asarray(np.exp(log_T), jnp.float32)
        total, n = 0.0, logits.shape[0]
        for i in range(0, n, chunk_size):
            j = min(i + chunk_size, n)
            total += float(_nll_jit(logits_j[i:j], labels_j[i:j], T)) * (j - i)
        return total / n

    if method == "brent":
        from scipy import optimize
        res = optimize.minimize_scalar(objective, bounds=(np.log(1e-2),
                                                          np.log(1e2)),
                                       method="bounded",
                                       options={"xatol": 1e-8})
        T_value = float(np.exp(res.x))
    elif method == "adam":
        import optax
        log_T = jnp.asarray(np.log(init_T), jnp.float32)
        opt = optax.adam(0.05)
        state = opt.init(log_T)
        grad_fn = jax.jit(jax.grad(
            lambda lt, x, y: _nll(x, y, jnp.exp(lt))))
        n = logits.shape[0]
        for _ in range(200):
            i = np.random.randint(0, max(1, n - chunk_size + 1))
            g = grad_fn(log_T, logits_j[i:i + chunk_size],
                        labels_j[i:i + chunk_size])
            updates, state = opt.update(g, state)
            log_T = optax.apply_updates(log_T, updates)
        T_value = float(np.exp(log_T))
    else:
        raise ValueError(f"Unknown method: {method}")

    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        with open(save_path, "w") as f:
            json.dump({"temperature": T_value}, f)
    return T_value


def load_temperature(path: str) -> float | None:
    try:
        with open(path) as f:
            return float(json.load(f)["temperature"])
    except (OSError, KeyError, ValueError):
        return None
