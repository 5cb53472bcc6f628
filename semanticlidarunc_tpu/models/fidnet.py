"""FIDNet baseline: ResNet-34 trunk + ASPP + fully-interpolation SemanticHead.

Port of /root/reference/src/baselines/FIDNet/{FIDNet,ResNet}.py (ASPP_1
variant, the one FIDNet defaults to): 1x1 stem to 128ch at full resolution,
four leaky-ReLU BasicBlock stages (128/128/256/128, strides 1/2/2/2),
align-corners upsampling of every stage to full res, a 3-branch dilated ASPP
(rates 3/6/9) over the 768ch concat, and a 1x1 SemanticHead producing raw
logits over the 1152ch feature stack.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .cenet import LeakyBasicBlock, _leaky, resize_align_corners

Dtype = Any


class FIDNet(nn.Module):
    num_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, stochastic: bool | None = None):
        d = self.dtype

        def bn():
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=d)
        x = x.astype(d)
        x = nn.Conv(128, (1, 1), use_bias=True, dtype=d)(x)
        x = nn.Conv(128, (1, 1), use_bias=False, dtype=d)(x)
        x = _leaky(bn()(x))
        h, w = x.shape[1], x.shape[2]

        def stage(z, features, n, stride):
            z = LeakyBasicBlock(features, stride, d)(z, train)
            for _ in range(n - 1):
                z = LeakyBasicBlock(features, 1, d)(z, train)
            return z

        x1 = stage(x, 128, 3, 1)
        x2 = stage(x1, 128, 4, 2)
        x3 = stage(x2, 256, 6, 2)
        x4 = stage(x3, 128, 3, 2)
        res = jnp.concatenate([
            x,
            resize_align_corners(x1, h, w),
            resize_align_corners(x2, h, w),
            resize_align_corners(x3, h, w),
            resize_align_corners(x4, h, w),
        ], axis=-1)                                   # 768 ch

        def aspp(rate):
            z = nn.Conv(128, (3, 3), kernel_dilation=(rate, rate),
                        use_bias=False, dtype=d)(res)
            return _leaky(bn()(z))

        feats = jnp.concatenate([res, aspp(3), aspp(6), aspp(9)], -1)  # 1152

        # SemanticHead (reference ResNet.py:145-170)
        y = nn.Conv(512, (1, 1), dtype=d)(feats)
        y = _leaky(bn()(y))
        y = nn.Conv(128, (1, 1), dtype=d)(y)
        y = _leaky(bn()(y))
        return nn.Conv(self.num_classes, (1, 1),
                       dtype=d)(y).astype(jnp.float32)
