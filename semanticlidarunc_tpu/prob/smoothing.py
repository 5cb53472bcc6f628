"""Label smoothing utilities.

Port of /root/reference/src/models/probability_helper.py:54-78 (the smoothing
schedule with warm-up/linear-decay and the smoothed one-hot builder).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def smoothing_schedule(epoch: int, num_epochs: int, *, s0: float = 0.25,
                       s_min: float = 0.15, start_frac: float = 0.4,
                       end_frac: float = 0.8, warmup_epochs: int = 2) -> float:
    """Constant s0 until start, linear decay to s_min by end."""
    start_ep = max(warmup_epochs, int(round(start_frac * num_epochs)))
    end_ep = max(start_ep + 1, int(round(end_frac * num_epochs)))
    if epoch <= start_ep:
        return s0
    if epoch >= end_ep:
        return s_min
    t = (epoch - start_ep) / max(1, end_ep - start_ep)
    return s_min + (s0 - s_min) * (1.0 - t)


def smooth_one_hot(targets: jnp.ndarray, num_classes: int,
                   smoothing: float = 0.25) -> jnp.ndarray:
    """[..., C] smoothed one-hot: 1-s on the target, s/(C-1) elsewhere."""
    confidence = 1.0 - smoothing
    low = smoothing / (num_classes - 1)
    one_hot = jax.nn.one_hot(targets, num_classes)
    return one_hot * (confidence - low) + low
