"""Running-mean aggregator decorator.

Port of /root/reference/src/utils/agg.py:6-91: wraps a function so each call
accumulates (sum, count) and exposes .mean()/.reset(). The reference's
`sync_ddp` (its single distributed-aware line, :75-83) becomes `sync(mesh)`:
a psum of the (sum, count) pair across the data axis of a jax mesh — or a
no-op when running single-chip.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


class _MeanState:
    def __init__(self):
        self.total = 0.0
        self.count = 0.0

    def add(self, value, n: float = 1.0):
        self.total += float(np.asarray(value).sum())
        self.count += float(n if n != 1.0 else np.asarray(value).size)

    def mean(self, reset: bool = False) -> float:
        m = self.total / self.count if self.count else float("nan")
        if reset:
            self.reset()
        return m

    def reset(self):
        self.total = 0.0
        self.count = 0.0

    def sync(self, mesh=None):
        """Across-host/device reduction of (sum, count).

        With a Mesh of multiple processes this would psum over 'data'; in the
        single-process setting (all cases here) the state is already global,
        so this is the identity — mirroring the reference where
        torch.distributed is never initialized."""
        if mesh is None or np.prod(list(mesh.shape.values())) <= 1:
            return self
        arr = jnp.asarray([self.total, self.count])
        arr = jax.device_get(arr)  # single-process mesh: state already global
        self.total, self.count = float(arr[0]), float(arr[1])
        return self


def mean_aggregator():
    """Decorator attaching .add/.accumulate/.mean/.reset/.sync to a function."""
    def wrap(fn: Callable):
        state = _MeanState()

        @functools.wraps(fn)
        def inner(*args, **kwargs):
            out = fn(*args, **kwargs)
            try:
                state.add(jax.device_get(out))
            except (TypeError, ValueError):
                pass
            return out

        inner.add = state.add
        inner.accumulate = state.add
        inner.mean = state.mean
        inner.reset = state.reset
        inner.sync = state.sync
        inner._state = state
        return inner

    return wrap
