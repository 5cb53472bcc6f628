"""Latency sweep over the non-Reichert model families, mirroring the
reference's per-baseline bench harnesses.

The reference benches SalsaNext / CENet / FIDNet each with an inline
`__main__` harness — bs=1, 5-channel 128x2048 input, 100 iters, CUDA
events, mean (`src/baselines/SalsaNext/SalsaNext.py:220-244`,
`src/baselines/CENet/CENet.py:28-50`, `src/baselines/FIDNet/FIDNet.py:
44-67`) — but publishes no numbers (the harnesses just print locally).
This sweep measures the same deterministic bf16 forward on the TPU with
the chained-slope method (see bench.py for why plain timers lie through
the RPC tunnel) and prints a markdown table.

Run: PYTHONPATH=. python tools/bench_families.py [family ...]
Families: SalsaNext, CENet_HarDNet, CENet_ResNet_34, FIDNet
"""
from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

H, W = 128, 2048
N_ITERS = 30

FAMILIES = ["SalsaNext", "CENet_HarDNet", "CENet_ResNet_34", "FIDNet"]


def build(name: str, dtype):
    if name == "SalsaNext":
        from semanticlidarunc_tpu.models.salsanext import SalsaNext
        return SalsaNext(num_classes=20, dtype=dtype)
    if name.startswith("CENet"):
        from semanticlidarunc_tpu.models.cenet import CENet
        return CENet(num_classes=20, aux=True,
                     model=name.split("_", 1)[1], dtype=dtype)
    if name == "FIDNet":
        from semanticlidarunc_tpu.models.fidnet import FIDNet
        return FIDNet(num_classes=20, dtype=dtype)
    raise ValueError(name)


def bench_one(name: str) -> tuple[float, float]:
    from semanticlidarunc_tpu.models.registry import count_parameters

    model = build(name, jnp.bfloat16)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.standard_normal((1, H, W, 5)), jnp.float32)
    variables = model.init({"params": key, "dropout": key}, x, train=False)
    n_params = count_parameters(variables["params"]) / 1e6

    if name == "FIDNet" and jax.default_backend() == "tpu":
        # production FIDNet inference is the split pipeline (trunk -> fused
        # Pallas ASPP -> head); chain at the python dispatch level — an
        # outer jit would inline the Mosaic call into the big program and
        # hit the ~25 ms stall (inference.make_fidnet_pipeline docstring)
        from semanticlidarunc_tpu import inference as inf
        run = inf.make_fidnet_pipeline(model, variables)

        @jax.jit
        def absorb(c, out):
            return c + out.sum().astype(c.dtype) * 1e-12

        def chained(n):
            c = x
            for _ in range(int(n)):
                c = absorb(c, run(c))
            return float(c.sum())
    else:
        @jax.jit
        def chained_jit(n):
            def body(i, c):
                out = model.apply(variables, c, train=False,
                                  stochastic=False)
                outs = out if isinstance(out, (list, tuple)) else [out]
                bump = sum((o.sum() for o in outs)).astype(c.dtype) * 1e-12
                return c + bump
            return jax.lax.fori_loop(0, n, body, x).sum().astype(jnp.float32)

        def chained(n):
            return float(chained_jit(jnp.asarray(n)))

    def timed(n):
        t0 = time.perf_counter()
        chained(n)
        return time.perf_counter() - t0

    timed(1)
    t1 = min(timed(1) for _ in range(3))
    tn = min(timed(N_ITERS + 1) for _ in range(3))
    return (tn - t1) / N_ITERS, n_params


def main():
    names = sys.argv[1:] or FAMILIES
    print(f"| family | params (M) | TPU v5e fwd (ms, {H}x{W} bs1 bf16) |")
    print("|---|---|---|")
    for name in names:
        s, n_params = bench_one(name)
        print(f"| {name} | {n_params:.1f} | {s * 1e3:.2f} |", flush=True)


if __name__ == "__main__":
    main()
