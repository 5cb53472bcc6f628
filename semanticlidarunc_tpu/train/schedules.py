"""LR schedule: linear warmup (from 30% of base) -> cosine decay to eta_min.

Exact port of the reference's LambdaLR lambda
(/root/reference/src/train_semantics.py:199-211), expressed as an optax
schedule so it lives inside the jitted optimizer update.
"""
from __future__ import annotations

import math


def warmup_cosine(base_lr: float, eta_min: float, warmup_steps: int,
                  total_steps: int, warmup_start: float = 0.3):
    warmup_steps = max(1, int(warmup_steps))
    total_steps = max(1, int(total_steps))

    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_start + (1.0 - warmup_start) * (step / warmup_steps)
        t = (step - warmup_steps) / max(1, total_steps - warmup_steps)
        cos = 0.5 * (1.0 + jnp.cos(math.pi * jnp.clip(t, 0.0, 1.0)))
        ratio = eta_min / base_lr
        decay = ratio + (1.0 - ratio) * cos
        return base_lr * jnp.where(step < warmup_steps, warm, decay)

    return schedule
