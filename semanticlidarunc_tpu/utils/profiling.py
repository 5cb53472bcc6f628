"""Profiling / timing utilities.

The reference only has CUDA-event wall clocks around the forward
(/root/reference/src/models/trainer.py:436-450); the TPU-native equivalents
(SURVEY.md §5) are `jax.profiler` traces plus honest wall-clock timing. On
this machine's RPC-tunneled TPU, `block_until_ready` does NOT wait for device
execution, so `chained_timer` measures by chaining N data-dependent
iterations in one compiled loop and fetching a single scalar — the slope
between two N values cancels the constant RPC cost (see bench.py and
ARCHITECTURE.md).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def chained_timer(fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
                  arg: jnp.ndarray, n_iters: int = 30,
                  repeats: int = 3) -> float:
    """Seconds per iteration of `fn(state_array, i) -> scalar` measured via a
    dependency-chained fori_loop with one terminal host fetch.

    `fn` must return a float32 scalar that depends on the computation under
    test; a tiny multiple of it is folded back into the carried array so
    iterations cannot be elided or overlapped.
    """
    @jax.jit
    def chain(a, m):
        def body(i, carry):
            aa, acc = carry
            out = fn(aa, i)
            return aa + (out * 1e-15).astype(aa.dtype), acc + out
        _, acc = jax.lax.fori_loop(0, m, body, (a, jnp.float32(0)))
        return acc

    float(chain(arg, jnp.asarray(1)))  # compile + warm

    def t(m: int) -> float:
        t0 = time.perf_counter()
        float(chain(arg, jnp.asarray(m)))
        return time.perf_counter() - t0

    t1 = min(t(1) for _ in range(repeats))
    tn = min(t(n_iters + 1) for _ in range(repeats))
    return (tn - t1) / n_iters
