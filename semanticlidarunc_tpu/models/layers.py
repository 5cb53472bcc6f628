"""Shared flax building blocks for the segmentation models (NHWC layout).

Equivalents of the reference blocks in
/root/reference/src/baselines/Reichert/semanticFCN_opt.py:10-107, rebuilt
TPU-first: NHWC tensors, bf16-friendly dtypes, `jax.image.resize` for
alias-free interpolation (half-pixel sampling == torch align_corners=False).
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# UpsampleBlock "auto" policy cutoffs (see its docstring); module-level so
# measurement tools can A/B them. Scale>=4 blocks amortize the fused form's
# border-strip fixed cost over 16x phase outputs, so they tolerate a 4x
# smaller low-res grid (v5e A/B at 128x2048: every shufflenet improved with
# its 4096-px scale-4 blocks fused — x0_5 5.3->4.9 ms, x1_0 7.5->6.9,
# x1_5 10.6->9.6 — while the flagship's 64x2048 blocks, all scale-2-at-
# 8192px or scale-4-below-4096px, keep their measured resize optimum).
_FUSED_MAX_FOLDED_BYTES = 64 * 1024 * 1024
_FUSED_MIN_GRID_PX = 16384
_FUSED_MIN_GRID_PX_S4 = 4096


def gn_groups(channels: int, groups: int = 32) -> int:
    g = min(groups, channels)
    return math.gcd(g, channels) or 1


class ConvBN(nn.Module):
    """Conv -> BatchNorm -> ReLU (the reference FPN block, :348-364)."""
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), use_bias=True,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x)


class UpsampleBlock(nn.Module):
    """Interpolate -> 3x3 conv -> GroupNorm -> ReLU (alias-free)
    (reference: semanticFCN_opt.py:10-28).

    TPU-first: at inference the bilinear-upsample + conv pair runs as ONE
    phase-decomposed convolution at the LOW resolution (ops/upconv.py),
    never materializing the (s*h, s*w, Cin) interpolated tensor — exact to
    resize->conv within float reassociation (tests/test_upconv.py). For
    TRAINING (`use_fused=False`) the plain resize->conv composition is kept:
    its backward pass measured ~16% faster per train step (bs8 resnet50
    v5e: 109 vs 126 ms) than differentiating through the folded kernel and
    border assembly. The param tree matches the nn.Conv layout
    ("Conv_0/kernel") either way, so torch-checkpoint converters and
    existing orbax checkpoints load unchanged.

    `use_fused="auto"` picks per block by folded-kernel size: the fused
    form carries s^2 phase copies of the conv weights, and once that
    tensor outgrows ~64 MB the weight traffic swamps the saved upsample
    round-trip. Measured v5e 64x2048 resnet50 inference: the x8 block
    (151 MB folded) runs 2.09 ms fused vs 0.67 resize+conv while the
    small-folded blocks keep a modest fused win; per-backbone forwards
    move with their channel widths (resnet50 128x2048: 10.1 -> 9.0 ms
    from un-fusing x8 alone; shufflenet's <=31 MB blocks prefer fused).
    The decoder's dec_up (4 phases, large grid) is always fused — it is
    what feeds the Pallas MC tail.
    """
    features: int
    scale: int
    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, phase_form: bool = False, raw_affine: bool = False,
                 use_fused="auto"):
        from ..ops import upconv

        if use_fused == "auto":
            # fused wins only when BOTH hold: the folded kernel (s^2 phase
            # copies of the weights) stays small AND the low-res grid is
            # large enough to amortize the border-strip fixed cost — every
            # measured case (v5e round 3: per-block A/Bs at 64x2048, the
            # e2e flagship A/B, and the 128x2048 backbone sweep deltas)
            # separates on (64 MB, 16384 px)
            folded_bytes = (9 * x.shape[-1] * self.scale ** 2
                            * self.features * 2)
            grid_px = x.shape[1] * x.shape[2]
            min_grid = (_FUSED_MIN_GRID_PX_S4 if self.scale >= 4
                        else _FUSED_MIN_GRID_PX)
            use_fused = (folded_bytes <= _FUSED_MAX_FOLDED_BYTES
                         and grid_px >= min_grid)
        # phase_form/raw_affine callers consume the phase layout itself
        # (the MC tail); they require the fused path regardless of policy
        use_fused = use_fused or phase_form or raw_affine

        kernel = self.param(
            "Conv_0",
            lambda rng: {"kernel": nn.initializers.lecun_normal()(
                rng, (3, 3, x.shape[-1], self.features))})["kernel"]
        gnp = self.param(
            "GroupNorm_0",
            lambda rng: {"scale": jnp.ones((self.features,), jnp.float32),
                         "bias": jnp.zeros((self.features,), jnp.float32)})
        g = gn_groups(self.features, self.groups)
        if not use_fused:
            assert not (phase_form or raw_affine)
            b_, h, w, c = x.shape
            y = jax.image.resize(
                x.astype(self.dtype),
                (b_, h * self.scale, w * self.scale, c), method="bilinear")
            y = jax.lax.conv_general_dilated(
                y, kernel.astype(self.dtype), (1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            a, b = _groupnorm_affine(y, g, gnp["scale"], gnp["bias"])
            yn = (y.astype(jnp.float32) * a[:, None, None, :]
                  + b[:, None, None, :]).astype(self.dtype)
            return nn.relu(yn)
        # kernel stays f32 into fold_kernel (the bilinear folding happens in
        # full precision); the folded kernel is cast to the compute dtype
        # inside upsample_conv_phase.
        y = upconv.upsample_conv_phase(x.astype(self.dtype), kernel,
                                       self.scale)
        a, b = _groupnorm_affine(y, g, gnp["scale"], gnp["bias"])
        if raw_affine:
            # pre-norm phase output + the per-(sample, channel) affine that
            # folds the GroupNorm; consumed by the fused Pallas MC tail
            return y, a, b
        yn = (y.astype(jnp.float32) * a[:, None, None, None, None, :]
              + b[:, None, None, None, None, :]).astype(self.dtype)
        out = nn.relu(yn)
        return out if phase_form else upconv.depth_to_space(out)


class SpatialAttention(nn.Module):
    """Residual spatial attention with a stable softmax over H*W
    (reference: semanticFCN_opt.py:73-85)."""
    reduction: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hid = max(1, c // self.reduction)
        s = nn.Conv(hid, (1, 1), use_bias=False, dtype=self.dtype)(x)
        s = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype)(nn.relu(s))
        # softmax over the full spatial map, in f32 for stability
        wmap = jax.nn.softmax(s.astype(jnp.float32).reshape(b, h * w, 1), axis=1)
        wmap = wmap.reshape(b, h, w, 1).astype(x.dtype)
        return x * wmap + x


class QKVAttentionModule(nn.Module):
    """Legacy tanh query-key attention (reference semanticFCN_opt.py:31-63 /
    semanticFCN.py AttentionModule): softmax over the CHANNEL axis of a
    1-channel score map — kept for parity with old checkpoints; the modern
    SpatialAttention is the default."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        q = nn.Conv(self.features, (1, 1), dtype=self.dtype)(x)
        k = nn.Conv(self.features, (1, 1), dtype=self.dtype)(x)
        v = nn.Conv(self.features, (1, 1), dtype=self.dtype)(x)
        score = nn.Conv(1, (1, 1), dtype=self.dtype)(jnp.tanh(q + k))
        w = jax.nn.softmax(score.astype(jnp.float32), axis=-1).astype(x.dtype)
        return v * w


class GNConv(nn.Module):
    """3x3 conv -> GroupNorm -> ReLU (decoder blocks, semanticFCN_opt.py:304-311)."""
    features: int
    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), use_bias=False, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=gn_groups(self.features, self.groups),
                         dtype=self.dtype)(x)
        return nn.relu(x)


def _groupnorm_affine(y_phase: jnp.ndarray, groups: int, scale: jnp.ndarray,
                      bias: jnp.ndarray, eps: float = 1e-6):
    """GroupNorm over [B, ..., C] (4D full-res or 6D phase form), folded to
    a per-(B, C) affine.

    gn(x) = (x - mu) * rsqrt(var + eps) * scale + bias collapses to
    a[b, c] * x + bb[b, c] once the per-(sample, group) statistics are known;
    statistics pool over (h, w, s, s, channels-in-group) — identical to
    full-resolution flax nn.GroupNorm (epsilon 1e-6, f32 stats).
    """
    b = y_phase.shape[0]
    c = y_phase.shape[-1]
    yg = y_phase.astype(jnp.float32).reshape(b, -1, groups, c // groups)
    n = yg.shape[1] * yg.shape[3]
    # single-pass moments (mean + mean-of-squares in ONE fusion over the
    # source — the centered two-pass form reads the tensor twice, ~0.4 ms
    # per MC-20 scan at bench scale); same formulation as flax GroupNorm
    mean = yg.mean(axis=(1, 3))                           # [B, G]
    mean2 = jnp.sum(jnp.square(yg), axis=(1, 3)) / n
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    return _gn_stats_to_affine(mean, var, groups, c, scale, bias, eps)


def _gn_stats_to_affine(mean, var, groups, c, scale, bias, eps=1e-6):
    """Per-(B, group) stats -> per-(B, channel) affine (a, b)."""
    inv = jax.lax.rsqrt(var + eps)                        # [B, G]
    inv_c = jnp.repeat(inv, c // groups, axis=1)          # [B, C]
    mean_c = jnp.repeat(mean, c // groups, axis=1)
    a = inv_c * scale[None, :]
    bb = bias[None, :] - mean_c * a
    return a, bb


def resize_nearest(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Nearest-neighbor resize with torch F.interpolate semantics.

    torch 'nearest' maps out[i] = in[floor(i / scale)] (so 1/2-downsampling
    keeps EVEN rows/cols), while jax.image.resize uses half-pixel centers
    (keeps odd ones) — an off-by-one on every meta pyramid level. Integer
    downscales use strided slicing (exact); other factors use the index
    formula."""
    b, h, w, c = x.shape
    inv = 1.0 / scale
    if scale < 1 and abs(inv - round(inv)) < 1e-9:
        k = int(round(inv))
        return x[:, ::k, ::k, :]
    oh, ow = int(h * scale), int(w * scale)
    ys = jnp.floor(jnp.arange(oh) / scale).astype(jnp.int32).clip(0, h - 1)
    xs = jnp.floor(jnp.arange(ow) / scale).astype(jnp.int32).clip(0, w - 1)
    return x[:, ys][:, :, xs]


def channel_dropout(x: jnp.ndarray, rate: float, deterministic: bool,
                    rng=None) -> jnp.ndarray:
    """Functional Dropout2d (zeroes whole channels), used outside Modules."""
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, (x.shape[0], 1, 1, x.shape[-1]))
    return jnp.where(keep, x / (1.0 - rate), 0.0)


class Dropout2d(nn.Module):
    """Channel dropout (torch nn.Dropout2d) for NHWC tensors."""
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return nn.Dropout(rate=self.rate, broadcast_dims=(1, 2),
                          deterministic=deterministic)(x)
