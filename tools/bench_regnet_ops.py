"""Op-level microbench inside a regnet YBlock shape (sub-2x investigation).

Times single ops at the stage-2 production shape of regnet_y_800mf
(bs=1, 32x512 grid after stride, 144 ch, bf16) with the chained-slope
method, to locate the ~10x-off-roofline per-block cost.

Usage: PYTHONPATH=.:/root/.axon_site python tools/bench_regnet_ops.py
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
    from semanticlidarunc_tpu.models.backbones import grouped_conv_merged

    rng = np.random.default_rng(0)
    h, w, c = 32, 512, 144
    x = jnp.asarray(rng.standard_normal((1, h, w, c)), jnp.bfloat16)
    k1 = jnp.asarray(rng.standard_normal((1, 1, c, c)) * 0.05, jnp.bfloat16)
    k3 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.bfloat16)
    kg = jnp.asarray(rng.standard_normal((3, 3, 16, c)) * 0.05, jnp.float32)

    def conv(xx, k):
        return jax.lax.conv_general_dilated(
            xx, k, (1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    print(f"shape [1,{h},{w},{c}] bf16", flush=True)
    print(f"conv1x1 dense : {slope_ms(lambda xx: conv(xx, k1), x):.3f} ms",
          flush=True)
    print(f"conv3x3 dense : {slope_ms(lambda xx: conv(xx, k3), x):.3f} ms",
          flush=True)
    print(f"conv3x3 merged(9g,gw16): "
          f"{slope_ms(lambda xx: grouped_conv_merged(xx, kg, 9, 1, jnp.bfloat16), x):.3f} ms",
          flush=True)
    print(f"conv3x3 grouped naive(9g): "
          f"{slope_ms(lambda xx: jax.lax.conv_general_dilated(xx, jnp.asarray(rng.standard_normal((3, 3, 16, c)) * 0.05, jnp.bfloat16), (1, 1), padding='SAME', feature_group_count=9, dimension_numbers=('NHWC', 'HWIO', 'NHWC')), x):.3f} ms",
          flush=True)
    print(f"bn+relu chain : "
          f"{slope_ms(lambda xx: jax.nn.relu((xx.astype(jnp.float32) - 0.1) * 1.1 + 0.2).astype(jnp.bfloat16), x):.3f} ms",
          flush=True)
    # stride-2 merged at the pre-stride shape (the 1x1 expands first, so
    # the strided group conv is width->width at the higher grid)
    x2 = jnp.asarray(rng.standard_normal((1, 64, 1024, c)), jnp.bfloat16)
    print(f"conv3x3 merged stride2 {c}->{c} @64x1024: "
          f"{slope_ms(lambda xx: grouped_conv_merged(xx, kg, 9, 2, jnp.bfloat16), x2):.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
