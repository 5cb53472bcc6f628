"""From-scratch flax backbones for the FPN segmentation net.

The reference wraps torchvision backbones and swaps the stem conv for a
stride-1 3x3 over `input_channels + meta_channel_dim` channels
(/root/reference/src/baselines/Reichert/semanticFCN_opt.py:122-247). Here the
backbones are implemented natively (NHWC, bf16-friendly); each returns the
five-stage feature pyramid (stem, x1..x4) and declares its stage channel
widths so the FPN head is backbone-agnostic.

Stage strides match the reference exactly: stem conv is stride 1 so the
pyramid sits at 1/2, 1/2, 1/4, 1/8, 1/16 of the input resolution.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn():
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype)
        residual = x
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(bn()(y))
        y = nn.Conv(self.features, (3, 3), use_bias=False, dtype=self.dtype)(y)
        y = bn()(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(self.features, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               dtype=self.dtype)(residual)
            residual = bn()(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int          # inner width; output is 4x this
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn():
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype)
        out_ch = self.features * 4
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(bn()(y))
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    use_bias=False, dtype=self.dtype)(y)
        y = nn.relu(bn()(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = bn()(y)
        if residual.shape[-1] != out_ch or self.stride != 1:
            residual = nn.Conv(out_ch, (1, 1), (self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(residual)
            residual = bn()(residual)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """ResNet-18/34/50-class trunk with the reference's stride-1 3x3 stem.

    `__call__(x, metas, train)` runs the encoder with multi-scale meta
    re-injection: before stages 2-4 the last `meta_dim` channels of the
    previous feature map are replaced by the down-scaled meta image
    (reference: semanticFCN_opt.py:405-414). Pass `metas=None` to disable.
    Returns [stem, x1, x2, x3, x4].
    """
    stage_sizes: Sequence[int]
    block: str = "basic"            # "basic" | "bottleneck"
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
            if metas is not None and i > 0 and self.meta_dim > 0:
                x = jnp.concatenate(
                    [x[..., : x.shape[-1] - self.meta_dim],
                     metas[i - 1].astype(x.dtype)], axis=-1)
            for j in range(n_blocks):
                stride = 2 if (j == 0 and i > 0) else 1
                x = blk(self.width * (2 ** i), stride=stride,
                        dtype=self.dtype)(x, train=train)
            feats.append(x)
        return feats


# name -> (constructor kwargs, stage output channels [c4, c3, c2, c1, stem])
# base_channels ordering follows the reference: [deepest ... shallowest]
# (semanticFCN_opt.py:131-142).
RESNET_SPECS = {
    "resnet18": dict(stage_sizes=(2, 2, 2, 2), block="basic",
                     base_channels=(512, 256, 128, 64, 32)),
    "resnet34": dict(stage_sizes=(3, 4, 6, 3), block="basic",
                     base_channels=(512, 256, 128, 64, 32)),
    "resnet50": dict(stage_sizes=(3, 4, 6, 3), block="bottleneck",
                     base_channels=(2048, 1024, 512, 256, 128)),
}


def make_backbone(name: str, meta_dim: int, dtype=jnp.float32):
    """Returns (backbone_module, base_channels)."""
    if name not in RESNET_SPECS:
        raise ValueError(
            f"Unknown backbone '{name}'. Available: {sorted(RESNET_SPECS)}")
    spec = RESNET_SPECS[name]
    bb = ResNetBackbone(stage_sizes=spec["stage_sizes"], block=spec["block"],
                        meta_dim=meta_dim, dtype=dtype)
    # reference base_channels[4] is the FPN's shallowest width; for resnets it
    # derives from the stem stage channels. We mirror the reference table:
    # base_channel // 16 for basic resnets (= 32), 2048 // 16 for resnet50.
    base = list(spec["base_channels"])
    base[4] = base[0] // 16
    return bb, tuple(base)
