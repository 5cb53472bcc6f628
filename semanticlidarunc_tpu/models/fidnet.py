"""FIDNet baseline: ResNet-34 trunk + ASPP + fully-interpolation SemanticHead.

Port of /root/reference/src/baselines/FIDNet/{FIDNet,ResNet.py} (ASPP_1
variant, the one FIDNet defaults to): 1x1 stem to 128ch at full resolution,
four leaky-ReLU BasicBlock stages (128/128/256/128, strides 1/2/2/2),
align-corners upsampling of every stage to full res, a 3-branch dilated ASPP
(rates 3/6/9) over the 768ch concat, and a 1x1 SemanticHead producing raw
logits over the 1152ch feature stack.

Setup-style with explicit submodule names so the forward exposes
`pre_aspp` / `aspp` / `post_aspp` stages while the param tree stays
identical to the original compact layout (Conv_0..7, BatchNorm_0..5,
LeakyBasicBlock_0..15 — pinned by the converter + torch parity test).
The split exists for the TPU inference pipeline: the three full-resolution
dilated 768->128 convs are the model's dominant cost (~17 of ~30 ms on v5e)
and run as ONE fused Pallas kernel (`ops/pallas_aspp.py`) dispatched as its
own executable (a Mosaic call inside the big XLA program stalls ~25 ms —
see ops/pallas_mc_megatail.py header); `__call__` itself keeps the pure-XLA
path for training and CPU.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .cenet import LeakyBasicBlock, _leaky, resize_align_corners

Dtype = Any

ASPP_RATES = (3, 6, 9)
# (features, n_blocks, stride) per ResNet-34 stage (reference ResNet.py:184)
STAGES = ((128, 3, 1), (128, 4, 2), (256, 6, 2), (128, 3, 2))


class FIDNet(nn.Module):
    num_classes: int
    dtype: Dtype = jnp.float32

    def setup(self):
        d = self.dtype

        def bn(name):
            return nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=d,
                                name=name)

        self.stem_conv1 = nn.Conv(128, (1, 1), use_bias=True, dtype=d,
                                  name="Conv_0")
        self.stem_conv2 = nn.Conv(128, (1, 1), use_bias=False, dtype=d,
                                  name="Conv_1")
        self.stem_bn = bn("BatchNorm_0")
        blocks = []
        for features, n, stride in STAGES:
            for j in range(n):
                blocks.append(LeakyBasicBlock(
                    features, stride if j == 0 else 1, d,
                    name=f"LeakyBasicBlock_{len(blocks)}"))
        self.blocks = blocks
        self.aspp_convs = [
            nn.Conv(128, (3, 3), kernel_dilation=(r, r), use_bias=False,
                    dtype=d, name=f"Conv_{2 + i}")
            for i, r in enumerate(ASPP_RATES)]
        self.aspp_bns = [bn(f"BatchNorm_{1 + i}")
                         for i in range(len(ASPP_RATES))]
        self.head_conv1 = nn.Conv(512, (1, 1), dtype=d, name="Conv_5")
        self.head_bn1 = bn("BatchNorm_4")
        self.head_conv2 = nn.Conv(128, (1, 1), dtype=d, name="Conv_6")
        self.head_bn2 = bn("BatchNorm_5")
        self.out_conv = nn.Conv(self.num_classes, (1, 1), dtype=d,
                                name="Conv_7")

    def pre_aspp(self, x, train: bool = False):
        """Stem + 4 stages + align-corners upsampling -> the 768ch concat
        the ASPP consumes (reference ResNet.py:270-285)."""
        x = x.astype(self.dtype)
        x = self.stem_conv1(x)
        x = self.stem_conv2(x)
        x = _leaky(self.stem_bn(x, use_running_average=not train))
        h, w = x.shape[1], x.shape[2]

        feats, z, i = [x], x, 0
        for _, n, _ in STAGES:
            for _ in range(n):
                z = self.blocks[i](z, train)
                i += 1
            feats.append(z)
        return jnp.concatenate(
            [feats[0]] + [resize_align_corners(f, h, w) for f in feats[1:]],
            axis=-1)                                   # 768 ch

    def aspp(self, res, train: bool = False):
        """The three dilated branches (XLA path): [B,H,W,3*128]."""
        outs = []
        for conv, bnm in zip(self.aspp_convs, self.aspp_bns):
            z = conv(res)
            outs.append(_leaky(bnm(z, use_running_average=not train)))
        return jnp.concatenate(outs, axis=-1)

    def post_aspp(self, res, aspp_out, train: bool = False):
        """SemanticHead over [res, aspp] (reference ResNet.py:145-170)."""
        feats = jnp.concatenate([res, aspp_out], axis=-1)      # 1152 ch
        y = self.head_conv1(feats)
        y = _leaky(self.head_bn1(y, use_running_average=not train))
        y = self.head_conv2(y)
        y = _leaky(self.head_bn2(y, use_running_average=not train))
        return self.out_conv(y).astype(jnp.float32)

    def __call__(self, x, train: bool = False, stochastic: bool | None = None):
        res = self.pre_aspp(x, train)
        return self.post_aspp(res, self.aspp(res, train), train)
