"""Per-stage timing for the regnet_y trunks (sub-2x investigation).

Builds each trunk stage (stem / stage1..4, incl. the meta-injection concat)
as a standalone module at its production input shape (bs=1, 128x2048 scan,
bf16) and times it with the chained-slope method (see bench.py). Small
programs compile fast, so the whole sweep is one run.

Usage: PYTHONPATH=.:/root/.axon_site python tools/bench_regnet_stages.py \
            regnet_y_800mf
"""
from __future__ import annotations

import sys
import time

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

H, W = 128, 2048
META = 6
N_ITERS = 30


class Stage(nn.Module):
    width: int
    depth: int
    group_width: int
    inject_meta: bool
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, meta=None):
        from semanticlidarunc_tpu.models.backbones import (YBlock,
                                                           _inject_meta)
        if self.inject_meta and meta is not None:
            x = _inject_meta(x, meta, META)
        for j in range(self.depth):
            x = YBlock(self.width, stride=2 if j == 0 else 1,
                       group_width=self.group_width,
                       dtype=jnp.bfloat16)(x, False)
        return x


class Stem(nn.Module):
    @nn.compact
    def __call__(self, x):
        from semanticlidarunc_tpu.models.backbones import _bn
        x = nn.Conv(32, (3, 3), use_bias=False, dtype=jnp.bfloat16)(x)
        return nn.relu(_bn(jnp.bfloat16, False)(x))


def slope_ms(apply_fn, *args):
    @jax.jit
    def chained(n, *a):
        def body(i, carry):
            out = apply_fn(carry, *a[1:])
            s = out.astype(jnp.float32).mean() * 1e-12
            return carry + s.astype(carry.dtype)
        x = jax.lax.fori_loop(0, n, body, a[0])
        return x.astype(jnp.float32).mean()

    def timed(n):
        t0 = time.perf_counter()
        float(chained(jnp.asarray(n), *args))
        return time.perf_counter() - t0

    timed(1)
    t1 = min(timed(1) for _ in range(3))
    tn = min(timed(N_ITERS + 1) for _ in range(3))
    return (tn - t1) / N_ITERS * 1000.0


def main():
    from semanticlidarunc_tpu.models.backbones import BACKBONE_SPECS

    name = sys.argv[1] if len(sys.argv) > 1 else "regnet_y_800mf"
    spec = BACKBONE_SPECS[name]
    widths, depths, gw = spec["widths"], spec["depths"], spec["group_width"]
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # stem at full res
    x = jnp.asarray(rng.standard_normal((1, H, W, 8)), jnp.bfloat16)
    stem = Stem()
    v = stem.init(key, x)
    ms = slope_ms(lambda xx: stem.apply(v, xx), x)
    print(f"{name} stem      [{H}x{W}x8->32]: {ms:.2f} ms", flush=True)

    in_ch, h, w = 32, H, W
    for i, (wd, d) in enumerate(zip(widths, depths)):
        inject = i > 0
        stage = Stage(wd, d, gw, inject)
        x = jnp.asarray(rng.standard_normal((1, h, w, in_ch)), jnp.bfloat16)
        meta = (jnp.asarray(rng.standard_normal((1, h, w, META)),
                            jnp.bfloat16) if inject else None)
        args = (x, meta) if inject else (x,)
        v = stage.init(key, *args)
        ms = slope_ms(lambda xx, *a: stage.apply(v, xx, *a), *args)
        print(f"{name} stage{i+1}x{d} [{h}x{w}x{in_ch}->{wd}]: {ms:.2f} ms",
              flush=True)
        in_ch, h, w = wd, h // 2, w // 2


if __name__ == "__main__":
    main()
