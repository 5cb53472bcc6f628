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


def warmup_cosine_host(base_lr: float, eta_min: float, warmup_steps: int,
                       total_steps: int, warmup_start: float = 0.3):
    """Pure-Python float mirror of `warmup_cosine` for host-side use
    (per-iteration LR logging, reference trainer.py:807-808) — same math,
    no device dispatch per call."""
    warmup_steps = max(1, int(warmup_steps))
    total_steps = max(1, int(total_steps))

    def schedule(step: int) -> float:
        step = float(step)
        if step < warmup_steps:
            return base_lr * (warmup_start
                              + (1.0 - warmup_start) * step / warmup_steps)
        t = (step - warmup_steps) / max(1, total_steps - warmup_steps)
        cos = 0.5 * (1.0 + math.cos(math.pi * min(max(t, 0.0), 1.0)))
        ratio = eta_min / base_lr
        return base_lr * (ratio + (1.0 - ratio) * cos)

    return schedule
