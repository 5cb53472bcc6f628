"""Depthwise-conv lowering microbench at shufflenet_v2 production shapes.

Compares XLA's feature_group_count=C depthwise lowering against the dense
block-diagonal embedding (diagonal kernel) at the shapes shufflenet_v2_x0_5
runs on a 128x2048 scan, to decide whether the regnet dense-embed win
(tools/bench_regnet_ops.py) transfers to depthwise convs.

Usage: PYTHONPATH=.:/root/.axon_site python tools/bench_depthwise.py
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

N_ITERS = 50


def slope_ms(fn, x0):
    @jax.jit
    def chained(n):
        def body(i, carry):
            out = fn(carry)
            s = out.astype(jnp.float32).mean() * 1e-12
            return carry + s.astype(carry.dtype)
        return jax.lax.fori_loop(0, n, body, x0).astype(jnp.float32).mean()

    def timed(n):
        t0 = time.perf_counter()
        float(chained(jnp.asarray(n)))
        return time.perf_counter() - t0

    timed(1)
    t1 = min(timed(1) for _ in range(3))
    tn = min(timed(N_ITERS + 1) for _ in range(3))
    return (tn - t1) / N_ITERS * 1000.0


def main():
    rng = np.random.default_rng(0)
    # (h, w, c): shufflenet_v2_x0_5 depthwise shapes on a 128x2048 scan
    # (stride-1 branch convs per stage) + one x2_0-scale case
    for h, w, c in [(64, 1024, 24), (32, 512, 48), (16, 256, 96),
                    (8, 128, 192), (32, 512, 122)]:
        x = jnp.asarray(rng.standard_normal((1, h, w, c)), jnp.bfloat16)
        kd = jnp.asarray(rng.standard_normal((3, 3, 1, c)) * 0.1,
                         jnp.bfloat16)

        def depthwise(xx, k=kd, cc=c):
            return jax.lax.conv_general_dilated(
                xx, k, (1, 1), padding=((1, 1), (1, 1)),
                feature_group_count=cc,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        kdense = (jnp.einsum("xyic,mc->xymc", kd.astype(jnp.float32),
                             jnp.eye(c))
                  .reshape(3, 3, c, c).astype(jnp.bfloat16))

        def dense(xx, k=kdense):
            return jax.lax.conv_general_dilated(
                xx, k, (1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        t_dw = slope_ms(depthwise, x)
        t_dense = slope_ms(dense, x)
        print(f"[1,{h},{w},{c}] depthwise {t_dw:.3f} ms | dense-embed "
              f"{t_dense:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
