"""From-scratch flax backbones for the FPN segmentation net.

The reference wraps torchvision backbones, swaps the stem conv for a stride-1
3x3 over `input_channels + meta_channel_dim` channels, and slices each into
five stages (/root/reference/src/baselines/Reichert/semanticFCN_opt.py:
122-247). Here every family in the reference's zoo is implemented natively
(NHWC, bf16-friendly): resnet{18,34,50}, shufflenet_v2_x{0_5,1_0,1_5,2_0},
regnet_y_{400mf,800mf,1_6gf,3_2gf}, efficientnet_v2_{s,m,l}, squeezenet1_0.

Each backbone:
- takes (x, metas, train) where metas = [meta@1/2, meta@1/4, meta@1/8] and
  re-injects the meta image at the reference's per-family points (:380-414);
- returns [stem, x1, x2, x3, x4] feature maps;
- declares `base_channels` (FPN widths, deepest-first) and `scales` (the
  per-family decoder upsample factors, :269-283) via BACKBONE_SPECS.

Family quirks reproduced from the reference forward:
- squeezenet: no meta injection before its layer4 (:387-395);
- efficientnet_v2: layer4 output IS layer3 with meta re-concatenated — the
  deepest stage is never run in multi-scale-meta mode (:396-404).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def _bn(dtype, train):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype)


def _inject_meta(x, meta, meta_dim):
    if meta is None or meta_dim <= 0:
        return x
    return jnp.concatenate(
        [x[..., : x.shape[-1] - meta_dim], meta.astype(x.dtype)], axis=-1)


# ---------------------------------------------------------------------------
# ResNet family
# ---------------------------------------------------------------------------

class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype)(x)
        y = nn.relu(_bn(self.dtype, train)(y))
        y = nn.Conv(self.features, (3, 3), use_bias=False, dtype=self.dtype)(y)
        y = _bn(self.dtype, train)(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(self.features, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               dtype=self.dtype)(residual)
            residual = _bn(self.dtype, train)(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int          # inner width; output is 4x this
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.features * 4
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(_bn(self.dtype, train)(y))
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.relu(_bn(self.dtype, train)(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = _bn(self.dtype, train)(y)
        if residual.shape[-1] != out_ch or self.stride != 1:
            residual = nn.Conv(out_ch, (1, 1), (self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(residual)
            residual = _bn(self.dtype, train)(residual)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    stage_sizes: Sequence[int]
    block: str = "basic"
    width: int = 64
    meta_dim: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, metas=None, train: bool = False):
        blk = BasicBlock if self.block == "basic" else Bottleneck
        x = nn.Conv(self.width, (3, 3), use_bias=False, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = [x]
        for i, n_blocks in enumerate(self.stage_sizes):
            if metas is not None and i > 0:
                x = _inject_meta(x, metas[i - 1], self.meta_dim)
            for j in range(n_blocks):
                stride = 2 if (j == 0 and i > 0) else 1
                x = blk(self.width * (2 ** i), stride=stride,
                        dtype=self.dtype)(x, train=train)
            feats.append(x)
        return feats


# ---------------------------------------------------------------------------
# ShuffleNetV2 family
# ---------------------------------------------------------------------------

def channel_shuffle(x: jnp.ndarray, groups: int = 2) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = x.transpose(0, 1, 2, 4, 3)
    return x.reshape(b, h, w, c)


class ShuffleUnit(nn.Module):
    features: int          # total output channels
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.features // 2

        def branch_main(z):
            z = nn.Conv(half, (1, 1), use_bias=False, dtype=self.dtype)(z)
            z = nn.relu(_bn(self.dtype, train)(z))
            z = nn.Conv(half, (3, 3), (self.stride, self.stride),
                        padding=((1, 1), (1, 1)), feature_group_count=half,
                        use_bias=False, dtype=self.dtype)(z)
            z = _bn(self.dtype, train)(z)
            z = nn.Conv(half, (1, 1), use_bias=False, dtype=self.dtype)(z)
            return nn.relu(_bn(self.dtype, train)(z))

        if self.stride == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
            out = jnp.concatenate([x1, branch_main(x2)], axis=-1)
        else:
            c_in = x.shape[-1]
            proj = nn.Conv(c_in, (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                           feature_group_count=c_in, use_bias=False,
                           dtype=self.dtype)(x)
            proj = _bn(self.dtype, train)(proj)
            proj = nn.Conv(half, (1, 1), use_bias=False, dtype=self.dtype)(proj)
            proj = nn.relu(_bn(self.dtype, train)(proj))
            out = jnp.concatenate([proj, branch_main(x)], axis=-1)
        return channel_shuffle(out, 2)


class ShuffleNetV2Backbone(nn.Module):
    """stem conv (s1) -> stage2/3/4 (each s2) -> conv5 1x1. The reference's
    stem excludes torchvision's maxpool, so the pyramid sits at
    1, 1/2, 1/4, 1/8, 1/8 (hence decoder scales (4, 4, 2))."""
    stage_channels: Sequence[int]   # (stage2, stage3, stage4)
    stage_sizes: Sequence[int] = (4, 8, 4)
    conv5_channels: int = 1024
    stem_channels: int = 24
    meta_dim: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, metas=None, train: bool = False):
        x = nn.Conv(self.stem_channels, (3, 3), use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.relu(_bn(self.dtype, train)(x))
        feats = [x]
        for i, (ch, n) in enumerate(zip(self.stage_channels,
                                        self.stage_sizes)):
            if metas is not None and i > 0:
                x = _inject_meta(x, metas[i - 1], self.meta_dim)
            x = ShuffleUnit(ch, stride=2, dtype=self.dtype)(x, train)
            for _ in range(n - 1):
                x = ShuffleUnit(ch, stride=1, dtype=self.dtype)(x, train)
            feats.append(x)
        if metas is not None:
            x = _inject_meta(x, metas[2], self.meta_dim)
        x = nn.Conv(self.conv5_channels, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.relu(_bn(self.dtype, train)(x))
        feats.append(x)
        return feats


# ---------------------------------------------------------------------------
# RegNetY family
# ---------------------------------------------------------------------------

class SqueezeExcite(nn.Module):
    """Squeeze-excitation; `act` matches torchvision's per-family internal
    activation (relu for regnet_y, silu for efficientnet_v2)."""
    se_channels: int
    dtype: Dtype = jnp.float32
    act: str = "relu"

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.se_channels, (1, 1), dtype=self.dtype)(s)
        s = nn.relu(s) if self.act == "relu" else nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype)(s)
        return x * nn.sigmoid(s)


def _merged_group_count(width: int, groups: int, target: int = 128) -> int:
    """Pick an effective group count (a divisor of `groups`) whose merged
    group width is as close to `target` lanes as possible without exceeding
    it. Width-8 groups run the 128x128 MXU at ~6% lane utilization; merging
    16 of them into one 128-wide block-diagonal group costs 16x the MACs at
    ~16x the utilization, and in practice wins because XLA's many-tiny-group
    lowering is far below even the naive model (regnet_y_400mf forward
    measured 24.4 -> see docs/baselines.md)."""
    best, best_w = groups, width // groups
    for g in range(1, groups + 1):
        if groups % g:
            continue
        wm = width // g
        if wm <= target and wm > best_w:
            best, best_w = g, wm
    return best


# bf16 bytes of the largest grouped kernel we embed fully dense (all the
# shipped regnet widths qualify; tests shrink it to cover the fallbacks)
_DENSE_EMBED_MAX_BYTES = 64 * 1024 * 1024


def grouped_conv_merged(x, kernel, groups: int, stride: int, dtype):
    """Grouped 3x3 conv via block-diagonal embedding — function-identical
    to feature_group_count=groups (the embedded positions are exact
    zeros), lowered as a plain DENSE convolution.

    XLA's feature_group_count lowering is the bottleneck, not the MACs:
    at regnet_y_800mf's stage-2 shape ([1,32,512,144] bf16, 9 groups of
    16) the identical-shape dense conv runs 0.155 ms vs 0.52 ms for the
    128-lane merged-group form and 1.04 ms naive grouped
    (tools/bench_regnet_ops.py, v5e). The extra MACs of a full dense
    embedding are FLOP-trivial at these widths (<=1512), so the kernel is
    embedded all the way to one dense block-diagonal conv whenever it
    stays under 64 MB; beyond that the previous ~128-lane merged-group
    form is kept: divisor merge, or zero-group padding when no divisor
    reaches the lane target (regnet_y_3_2gf's prime-count stages)."""
    import jax

    kh, kw, gw, width = kernel.shape
    opg = width // groups
    if kh * kw * width * width * 2 <= _DENSE_EMBED_MAX_BYTES:
        kr = kernel.reshape(kh, kw, gw, groups, opg)
        eye = jnp.eye(groups, dtype=kernel.dtype)
        kdense = jnp.einsum("xyilc,ml->xymilc", kr, eye).reshape(
            kh, kw, width, width)
        return jax.lax.conv_general_dilated(
            x.astype(dtype), kdense.astype(dtype), (stride, stride),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    g_div = _merged_group_count(width, groups)
    k_pad = max(1, 128 // gw)
    if k_pad > 1 and groups % k_pad and k_pad * gw > width // g_div:
        g_eff = -(-groups // k_pad)
        gpad = g_eff * k_pad - groups
        kr = jnp.pad(kernel.reshape(kh, kw, gw, groups, opg),
                     ((0, 0), (0, 0), (0, 0), (0, gpad), (0, 0)))
        kr = kr.reshape(kh, kw, gw, g_eff, k_pad, opg)
        eye = jnp.eye(k_pad, dtype=kernel.dtype)
        kmerged = jnp.einsum("xyimjc,lj->xylimjc", kr, eye).reshape(
            kh, kw, k_pad * gw, g_eff * k_pad * opg)
        xp = jnp.pad(x.astype(dtype),
                     ((0, 0), (0, 0), (0, 0), (0, gpad * gw)))
        out = jax.lax.conv_general_dilated(
            xp, kmerged.astype(dtype), (stride, stride),
            padding=((1, 1), (1, 1)), feature_group_count=g_eff,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out[..., :width]
    if g_div != groups:
        k = groups // g_div
        kr = kernel.reshape(kh, kw, gw, g_div, k, opg)
        eye = jnp.eye(k, dtype=kernel.dtype)
        kernel = jnp.einsum("xyimjc,lj->xylimjc", kr, eye).reshape(
            kh, kw, k * gw, width)
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), (stride, stride),
        padding=((1, 1), (1, 1)), feature_group_count=g_div,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class YBlock(nn.Module):
    features: int
    stride: int = 1
    group_width: int = 8
    se_ratio: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        groups = max(1, self.features // self.group_width)
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="Conv_0")(x)
        y = nn.relu(_bn(self.dtype, train)(y))
        # param layout identical to nn.Conv's grouped kernel; applied via
        # the merged-group embedding (exact same function, MXU-friendly)
        gk = self.param(
            "Conv_1",
            lambda rng: {"kernel": nn.initializers.lecun_normal()(
                rng, (3, 3, self.features // groups, self.features))}
        )["kernel"]
        y = grouped_conv_merged(y, gk, groups, self.stride, self.dtype)
        y = nn.relu(_bn(self.dtype, train)(y))
        y = SqueezeExcite(max(1, int(in_ch * self.se_ratio)),
                          dtype=self.dtype)(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="Conv_2")(y)
        y = _bn(self.dtype, train)(y)
        if in_ch != self.features or self.stride != 1:
            residual = nn.Conv(self.features, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               dtype=self.dtype, name="Conv_3")(residual)
            residual = _bn(self.dtype, train)(residual)
        return nn.relu(y + residual)


class RegNetYBackbone(nn.Module):
    widths: Sequence[int]
    depths: Sequence[int]
    group_width: int
    stem_channels: int = 32
    meta_dim: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, metas=None, train: bool = False):
        x = nn.Conv(self.stem_channels, (3, 3), use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.relu(_bn(self.dtype, train)(x))
        feats = [x]
        for i, (w, d) in enumerate(zip(self.widths, self.depths)):
            if metas is not None and i > 0:
                x = _inject_meta(x, metas[i - 1], self.meta_dim)
            for j in range(d):
                x = YBlock(w, stride=2 if j == 0 else 1,
                           group_width=self.group_width,
                           dtype=self.dtype)(x, train)
            feats.append(x)
        return feats


# ---------------------------------------------------------------------------
# EfficientNetV2 family
# ---------------------------------------------------------------------------

class FusedMBConv(nn.Module):
    features: int
    expand: int = 4
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        y = nn.Conv(mid, (3, 3), (self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype)(x)
        y = nn.silu(_bn(self.dtype, train)(y))
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = _bn(self.dtype, train)(y)
        if self.stride == 1 and in_ch == self.features:
            y = y + x
        return y


class MBConv(nn.Module):
    features: int
    expand: int = 4
    stride: int = 1
    se_ratio: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.silu(_bn(self.dtype, train)(y))
        y = nn.Conv(mid, (3, 3), (self.stride, self.stride),
                    padding=((1, 1), (1, 1)), feature_group_count=mid,
                    use_bias=False, dtype=self.dtype)(y)
        y = nn.silu(_bn(self.dtype, train)(y))
        y = SqueezeExcite(max(1, int(in_ch * self.se_ratio)),
                          dtype=self.dtype, act="silu")(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = _bn(self.dtype, train)(y)
        if self.stride == 1 and in_ch == self.features:
            y = y + x
        return y


class EfficientNetV2Backbone(nn.Module):
    """Stem + the three stages the reference actually uses (features[2],
    features[3], features[4]); x4 is x3 with meta re-concatenated
    (semanticFCN_opt.py:396-404) — handled in the FPN wrapper via
    `layer4_is_meta_concat`."""
    stage_channels: Sequence[int]   # (f2, f3, f4)
    stage_sizes: Sequence[int]
    stem_channels: int
    meta_dim: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, metas=None, train: bool = False):
        x = nn.Conv(self.stem_channels, (3, 3), use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.silu(_bn(self.dtype, train)(x))
        feats = [x]
        kinds = ("fused", "fused", "mb")
        for i, (ch, n, kind) in enumerate(zip(self.stage_channels,
                                              self.stage_sizes, kinds)):
            if metas is not None and i > 0:
                x = _inject_meta(x, metas[i - 1], self.meta_dim)
            for j in range(n):
                blk = FusedMBConv if kind == "fused" else MBConv
                x = blk(ch, expand=4, stride=2 if j == 0 else 1,
                        dtype=self.dtype)(x, train)
            feats.append(x)
        # x4 = meta-reinjected x3 (reference quirk); the actual concat happens
        # in SemanticFPN because it owns the meta pyramid.
        feats.append(x)
        return feats


# ---------------------------------------------------------------------------
# SqueezeNet
# ---------------------------------------------------------------------------

class Fire(nn.Module):
    squeeze: int
    expand: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.squeeze, (1, 1), dtype=self.dtype)(x))
        e1 = nn.relu(nn.Conv(self.expand, (1, 1), dtype=self.dtype)(s))
        e3 = nn.relu(nn.Conv(self.expand, (3, 3), dtype=self.dtype)(s))
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNetBackbone(nn.Module):
    """torchvision squeezenet1_0 sliced per the reference (:210-215):
    stem = conv+pool+fire(128); layer1 = fire x2 (256); layer2 = pool+fire
    (256); layer3 = fire x2 (384->384... widths per fire table); layer4 =
    fire+pool+fire (512). Meta injected before layers 2 and 3 only."""
    meta_dim: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, metas=None, train: bool = False):
        d = self.dtype
        # torchvision's maxpools are MaxPool2d(3, 2, ceil_mode=True): no
        # leading pad, implicit trailing pad — ((0,1),(0,1)), not symmetric
        pool = dict(strides=(2, 2), padding=((0, 1), (0, 1)))
        # reference replaces the stem conv with a bias-free 3x3
        # (semanticFCN_opt.py:205-212)
        x = nn.relu(nn.Conv(96, (3, 3), use_bias=False, dtype=d)(x))
        x = nn.max_pool(x, (3, 3), **pool)
        x = Fire(16, 64, d)(x)                      # 128
        feats = [x]
        x = Fire(16, 64, d)(x)
        x = Fire(32, 128, d)(x)                     # 256
        feats.append(x)
        if metas is not None:
            x = _inject_meta(x, metas[0], self.meta_dim)
        x = nn.max_pool(x, (3, 3), **pool)
        x = Fire(32, 128, d)(x)                     # 256
        feats.append(x)
        if metas is not None:
            x = _inject_meta(x, metas[1], self.meta_dim)
        x = Fire(48, 192, d)(x)
        x = Fire(48, 192, d)(x)                     # 384
        feats.append(x)
        x = Fire(64, 256, d)(x)                     # 512
        x = nn.max_pool(x, (3, 3), **pool)
        x = Fire(64, 256, d)(x)
        feats.append(x)
        return feats


# ---------------------------------------------------------------------------
# specs (base_channels deepest-first, reference semanticFCN_opt.py:131-183;
# scales per is_shuffle / is_squeeze / default, :269-283)
# ---------------------------------------------------------------------------

BACKBONE_SPECS = {
    # Test/CI-grade tiny resnet (no reference analog): one basic block per
    # stage at width 16. Same FPN structure and code paths as resnet18 at a
    # fraction of the XLA compile cost — the test suite's orchestration-level
    # tests (mesh sharding, trainer loops, CLI smoke) use it so a cold run
    # compiles minutes, not tens of minutes, of train/eval programs.
    "resnet10t": dict(family="resnet", stage_sizes=(1, 1, 1, 1),
                      block="basic", width=16,
                      base_channels=(128, 64, 32, 16, 8), scales=(8, 4, 2)),
    "resnet18": dict(family="resnet", stage_sizes=(2, 2, 2, 2), block="basic",
                     base_channels=(512, 256, 128, 64, 32), scales=(8, 4, 2)),
    "resnet34": dict(family="resnet", stage_sizes=(3, 4, 6, 3), block="basic",
                     base_channels=(512, 256, 128, 64, 32), scales=(8, 4, 2)),
    "resnet50": dict(family="resnet", stage_sizes=(3, 4, 6, 3),
                     block="bottleneck",
                     base_channels=(2048, 1024, 512, 256, 128),
                     scales=(8, 4, 2)),
    "shufflenet_v2_x0_5": dict(family="shufflenet",
                               stage_channels=(48, 96, 192), stem=24,
                               conv5=1024,
                               base_channels=(1024, 192, 96, 48, 24),
                               scales=(4, 4, 2)),
    "shufflenet_v2_x1_0": dict(family="shufflenet",
                               stage_channels=(116, 232, 464), stem=24,
                               conv5=1024,
                               base_channels=(1024, 464, 232, 116, 24),
                               scales=(4, 4, 2)),
    "shufflenet_v2_x1_5": dict(family="shufflenet",
                               stage_channels=(176, 352, 704), stem=24,
                               conv5=1024,
                               base_channels=(1024, 704, 352, 176, 24),
                               scales=(4, 4, 2)),
    "shufflenet_v2_x2_0": dict(family="shufflenet",
                               stage_channels=(244, 488, 976), stem=24,
                               conv5=2048,
                               base_channels=(2048, 976, 488, 244, 112),
                               scales=(4, 4, 2)),
    "regnet_y_400mf": dict(family="regnet", widths=(48, 104, 208, 440),
                           depths=(1, 3, 6, 6), group_width=8,
                           base_channels=(440, 208, 104, 48, 32),
                           scales=(8, 4, 2)),
    "regnet_y_800mf": dict(family="regnet", widths=(64, 144, 320, 784),
                           depths=(1, 3, 8, 2), group_width=16,
                           base_channels=(784, 320, 144, 64, 32),
                           scales=(8, 4, 2)),
    "regnet_y_1_6gf": dict(family="regnet", widths=(48, 120, 336, 888),
                           depths=(2, 6, 17, 2), group_width=24,
                           base_channels=(888, 336, 120, 48, 32),
                           scales=(8, 4, 2)),
    "regnet_y_3_2gf": dict(family="regnet", widths=(72, 216, 576, 1512),
                           depths=(2, 5, 13, 1), group_width=24,
                           base_channels=(1512, 576, 216, 72, 32),
                           scales=(8, 4, 2)),
    "efficientnet_v2_s": dict(family="efficientnet",
                              stage_channels=(48, 64, 128),
                              stage_sizes=(4, 4, 6), stem=24,
                              base_channels=(128, 128, 64, 48, 168),
                              scales=(4, 4, 2), layer4_is_meta_concat=True),
    "efficientnet_v2_m": dict(family="efficientnet",
                              stage_channels=(48, 80, 160),
                              stage_sizes=(5, 5, 7), stem=24,
                              base_channels=(160, 160, 80, 48, 168),
                              scales=(4, 4, 2), layer4_is_meta_concat=True),
    "efficientnet_v2_l": dict(family="efficientnet",
                              stage_channels=(64, 96, 192),
                              stage_sizes=(7, 7, 10), stem=32,
                              base_channels=(192, 192, 96, 64, 168),
                              scales=(4, 4, 2), layer4_is_meta_concat=True),
    "squeezenet1_0": dict(family="squeezenet",
                          base_channels=(512, 384, 256, 256, 112),
                          scales=(4, 2, 2)),
}


def make_backbone(name: str, meta_dim: int, dtype=jnp.float32):
    """Returns (backbone_module, spec dict)."""
    if name not in BACKBONE_SPECS:
        raise ValueError(
            f"Unknown backbone '{name}'. Available: {sorted(BACKBONE_SPECS)}")
    spec = BACKBONE_SPECS[name]
    fam = spec["family"]
    if fam == "resnet":
        bb = ResNetBackbone(stage_sizes=spec["stage_sizes"],
                            block=spec["block"],
                            width=spec.get("width", 64), meta_dim=meta_dim,
                            dtype=dtype)
    elif fam == "shufflenet":
        bb = ShuffleNetV2Backbone(stage_channels=spec["stage_channels"],
                                  stem_channels=spec["stem"],
                                  conv5_channels=spec["conv5"],
                                  meta_dim=meta_dim, dtype=dtype)
    elif fam == "regnet":
        bb = RegNetYBackbone(widths=spec["widths"], depths=spec["depths"],
                             group_width=spec["group_width"],
                             meta_dim=meta_dim, dtype=dtype)
    elif fam == "efficientnet":
        bb = EfficientNetV2Backbone(stage_channels=spec["stage_channels"],
                                    stage_sizes=spec["stage_sizes"],
                                    stem_channels=spec["stem"],
                                    meta_dim=meta_dim, dtype=dtype)
    elif fam == "squeezenet":
        bb = SqueezeNetBackbone(meta_dim=meta_dim, dtype=dtype)
    else:
        raise AssertionError(fam)
    return bb, spec
