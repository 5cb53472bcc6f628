"""MC-dropout inference as vmapped stochastic forwards.

The reference runs T sequential full forwards with only dropout layers
flipped to train mode (BatchNorm frozen on running stats;
/root/reference/src/utils/mc_dropout.py:13-34, 98-119). The JAX equivalents:

- `mc_forward`: vmap the full stochastic forward over T dropout keys
  (train=False keeps BN on running averages; stochastic=True enables dropout
  only — exactly the reference's dropout_sampling semantics).
- `mc_forward_split`: for models exposing a deterministic `features` trunk and
  stochastic `head` (the FPN family, where the ONLY dropout sits on the fused
  pyramid), run the trunk ONCE and vmap just the head over T keys. Sample
  distribution is identical; compute drops from T full forwards to
  1 trunk + T small heads.

Entropy / mutual-information reductions are fused in the same jit so the
[T, B, H, W, C] sample stack never leaves the device.
"""
from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp


def mc_forward(apply_fn: Callable, variables: Any, inputs: tuple,
               rng: jax.Array, n_samples: int) -> jnp.ndarray:
    """[T, ..., C] stochastic logits via vmap over dropout keys."""
    keys = jax.random.split(rng, n_samples)

    def one(key):
        return apply_fn(variables, *inputs, train=False, stochastic=True,
                        rngs={"dropout": key})

    return jax.vmap(one)(keys)


def mc_forward_split(features_fn: Callable, head_fn: Callable, variables: Any,
                     inputs: tuple, rng: jax.Array,
                     n_samples: int) -> jnp.ndarray:
    """Trunk-once / head-T-times MC forward for trunk-head models."""
    fused = features_fn(variables, *inputs, train=False)
    keys = jax.random.split(rng, n_samples)

    def one(key):
        return head_fn(variables, fused, stochastic=True,
                       rngs={"dropout": key})

    return jax.vmap(one)(keys)


def mc_probs(mc_logits: jnp.ndarray, temperature: float | None = None,
             eps: float = 1e-12) -> jnp.ndarray:
    """[T, ..., C] logits -> probabilities (reference mc_dropout_probs)."""
    if temperature is not None:
        mc_logits = mc_logits / max(1e-3, float(temperature))
    return jax.nn.softmax(mc_logits, axis=-1)


def predictive_entropy_mc(probs: jnp.ndarray, eps: float = 1e-12,
                          normalize: bool = True) -> jnp.ndarray:
    """Entropy of the MC-mean predictive (reference mc_dropout.py:121-133)."""
    p_bar = jnp.clip(probs.mean(axis=0), eps)
    ent = -jnp.sum(p_bar * jnp.log(p_bar), axis=-1)
    return ent / math.log(probs.shape[-1]) if normalize else ent


def mc_summaries(mc_logits: jnp.ndarray, temperature: float | None = None,
                 eps: float = 1e-12):
    """Fused MC reductions: (p_bar, H_norm, MI_norm).

    Matches the Trainer's MC eval math (reference trainer.py:1143-1152):
    H_norm = H[p_bar]/log C;  MI_norm = (H[p_bar] - E_T H[p_t])/log C.
    """
    c = mc_logits.shape[-1]
    logp = jax.nn.log_softmax(
        mc_logits if temperature is None else mc_logits / max(1e-3, temperature),
        axis=-1)
    p = jnp.exp(logp)
    p_bar = p.mean(axis=0)
    h_bar = -jnp.sum(jnp.clip(p_bar, eps) * jnp.log(jnp.clip(p_bar, eps)),
                     axis=-1)
    h_each = -jnp.sum(p * logp, axis=-1)
    mi = h_bar - h_each.mean(axis=0)
    log_c = math.log(c)
    return p_bar, h_bar / log_c, mi / log_c
