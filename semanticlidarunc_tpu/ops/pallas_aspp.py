"""Pallas TPU kernel: FIDNet's 3-rate dilated ASPP as ONE fused pass.

The reference ASPP (/root/reference/src/baselines/FIDNet/ResNet.py:208-215)
is three full-resolution dilated 3x3 convs 768->128 (rates 3/6/9) + BN +
leaky — the dominant cost of FIDNet on v5e (~17.4 of ~30 ms at 128x2048
bs1). Measured facts driving this design (tools-era probes, round 4):

- XLA convs at cout=128 run ~74 TF/s regardless of dilation (a DENSE
  768->128 conv costs the same 6.3 ms as the dil-9 one), so three separate
  branches pay ~18.9 ms of MXU-underfed time.
- Coset/space-to-depth reformulations lose: the relayout transposes alone
  cost ~8 ms, and grouped convs lower ~3x worse.

Here all 27 tap-matmuls (3 rates x 9 taps) run over ONE VMEM-resident input
tile as [rg*wt, 768] x [768, 128] MXU matmuls — K = 6 and N = 1 exact
128-lane tiles, zero padding waste. The inference BatchNorm is
an affine: its scale folds into the conv kernels host-side and its shift
rides as a per-branch bias, so BN + leaky finish in-kernel and the 384
output channels are written once.

Eval-path only (no custom VJP; training keeps the XLA branch convs in
models/fidnet.py `aspp`). IMPORTANT: dispatch from a SMALL jit — a Mosaic
custom call embedded in the big trunk program stalls ~25 ms/iteration in
this runtime (see ops/pallas_mc_megatail.py header; inference.py
`make_fidnet_pipeline` is the product split).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_SLOPE = 0.01      # models/cenet._leaky / reference LeakyReLU default


def _kernel(h, wt, c, n_out, rg, rates, pad, fetch_w, x_hbm, w_ref, b_ref,
            out_ref, x_scr, sem):
    bi = pl.program_id(0)
    wi = pl.program_id(1)

    # fetch_w >= wt + 2*pad rounded up to the sublane tile (8): DMA slice
    # shapes along W must be 8-aligned (Mosaic), so each tile over-fetches
    # a few trailing columns the taps never read
    cp = pltpu.make_async_copy(
        x_hbm.at[bi, :, pl.ds(wi * wt, fetch_w), :], x_scr, sem)
    cp.start()
    cp.wait()

    # per-tap matmul accumulation: lane-concats of differently-offset
    # slices trip Mosaic ("result/input offset mismatch on non-concat
    # dimension"), so each of the 9 taps per rate is its own
    # [rg*wt, C] x [C, 128] matmul — same MXU tiles, no relayout
    for r0 in range(0, h, rg):
        for ri, r in enumerate(rates):
            acc = jnp.zeros((rg * wt, 128), jnp.float32)
            for u in range(3):
                rows = x_scr[pad + r0 + (u - 1) * r:
                             pad + r0 + (u - 1) * r + rg]
                for v in range(3):
                    win = rows[:, pad + (v - 1) * r:
                               pad + (v - 1) * r + wt, :]
                    acc += jnp.dot(win.reshape(rg * wt, c),
                                   w_ref[ri, u * 3 + v],
                                   preferred_element_type=jnp.float32)
            y = acc + b_ref[0, ri * 128:(ri + 1) * 128]
            y = jnp.maximum(y, NEG_SLOPE * y)
            out_ref[0, r0:r0 + rg, :, ri * 128:(ri + 1) * 128] = (
                y.reshape(rg, wt, 128).astype(out_ref.dtype))


def fused_aspp(res: jnp.ndarray, kernels, scales, biases,
               rates=(3, 6, 9), wt: int = 128, rg: int = 8,
               interpret: bool = False,
               compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """leaky(BN(conv_dil_r(res))) for every rate, concatenated over channels.

    res      [B, H, W, C] (any float dtype; computed in compute_dtype)
    kernels  per rate [3, 3, C, 128]
    scales   per rate [128] — folded BN scale  gamma / sqrt(var + eps)
    biases   per rate [128] — folded BN shift  beta - mean * scale
    Returns [B, H, W, len(rates)*128] in res.dtype.
    """
    b, h, w, c = res.shape
    pad = max(rates)
    n_rates = len(rates)
    assert h % rg == 0, (h, rg)

    wp = -w % wt
    fetch_w = -(-(wt + 2 * pad) // 8) * 8     # 8-aligned DMA slice width
    extra = fetch_w - (wt + 2 * pad)
    xp = jnp.pad(res.astype(compute_dtype),
                 ((0, 0), (pad, pad), (pad, pad + wp + extra), (0, 0)))
    n_wtiles = (w + wp) // wt

    # fold the BN scale into the kernels; arrange [R, 9 taps (u*3+v), C, 128]
    wk = jnp.stack([
        (jnp.asarray(k) * jnp.asarray(s).reshape(1, 1, 1, -1)
         ).reshape(9, c, 128)
        for k, s in zip(kernels, scales)]).astype(compute_dtype)
    bb = jnp.concatenate([jnp.asarray(v).reshape(-1) for v in biases]
                         ).reshape(1, n_rates * 128).astype(jnp.float32)

    full = lambda shape: pl.BlockSpec(
        shape, lambda bi, wi: (0,) * len(shape), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, h, wt, c, n_rates * 128, rg, tuple(rates),
                          pad, fetch_w),
        grid=(b, n_wtiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # x (HBM)
            full((n_rates, 9, c, 128)),
            full((1, n_rates * 128)),
        ],
        out_specs=pl.BlockSpec(
            (1, h, wt, n_rates * 128),
            lambda bi, wi: (bi, 0, wi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w + wp, n_rates * 128),
                                       compute_dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2 * pad, fetch_w, c), compute_dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xp, wk, bb)
    return out[:, :, :w, :].astype(res.dtype)


def fold_fidnet_aspp(variables: dict, eps: float = 1e-5):
    """Extract (kernels, scales, biases) for `fused_aspp` from FIDNet
    variables: ASPP convs are Conv_2/3/4, BNs BatchNorm_1/2/3
    (models/fidnet.py setup; utils/baseline_convert.py:136-138)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    kernels, scales, biases = [], [], []
    for i in range(3):
        k = params[f"Conv_{2 + i}"]["kernel"]
        bnp = params[f"BatchNorm_{1 + i}"]
        bns = stats[f"BatchNorm_{1 + i}"]
        s = bnp["scale"] / jnp.sqrt(bns["var"] + eps)
        kernels.append(k)
        scales.append(s)
        biases.append(bnp["bias"] - bns["mean"] * s)
    return kernels, scales, biases


def can_fused_aspp(res_shape, rg: int = 8) -> bool:
    """Shape gate: H divisible by the row group and C lane-aligned."""
    _, h, w, c = res_shape
    return h % rg == 0 and c % 128 == 0 and h >= rg and w >= 1
