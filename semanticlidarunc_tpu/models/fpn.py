"""FPN segmentation network ("Reichert" model family), rebuilt TPU-first.

Topology parity with /root/reference/src/baselines/Reichert/semanticFCN_opt.py:
- backbone with stride-1 3x3 stem over input+meta channels (:192)
- multi-scale meta re-injection at 1/2, 1/4, 1/8 before stages 2-4 (:380-414)
- four 3x3+BN+ReLU FPN blocks (:348-364)
- residual SpatialAttention per level (:254-257, 434-438)
- alias-free bilinear UpsampleBlocks to 1/2 resolution (:285-291, 442-444)
- channel-concat fused pyramid -> Dropout2d(0.1) — the ONLY dropout and the
  MC-dropout noise source (:266, 450)
- GroupNorm decoder -> raw logits with `num_classes` channels (:304-314)

TPU-first difference: the network is split into a deterministic `features`
trunk and a stochastic `head` (dropout + decoder). Because all stochasticity
lives after the fused pyramid, MC-dropout reruns ONLY the head T times
(vmapped over T dropout keys) instead of T full forwards — algebraically the
same sample distribution as the reference's sequential loop
(src/utils/mc_dropout.py:114-119) at a fraction of the FLOPs.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import backbones
from .layers import (ConvBN, Dropout2d, GNConv, QKVAttentionModule,
                     SpatialAttention,
                     UpsampleBlock, resize_nearest)

Dtype = Any


class SemanticFPN(nn.Module):
    """`SemanticNetworkWithFPN` equivalent.

    __call__(x, meta, train, stochastic) -> [B, H, W, num_classes] raw logits.
    `x` is the main input [B,H,W,input_channels] (range [+ reflectivity]),
    `meta` is [B,H,W,meta_channels] (xyz [+ normals]).
    """
    num_classes: int
    backbone: str = "resnet34"
    input_channels: int = 2
    meta_channels: int = 6
    attention: bool = True
    multi_scale_meta: bool = True
    pyramid_dropout: float = 0.1
    # "none" -> raw logits (semanticFCN_opt); "elu_plus_one" -> positive
    # outputs for direct alpha regression (legacy semanticFCN.py:237-246,352)
    head_activation: str = "none"
    attention_type: str = "spatial"    # "spatial" | "qkv" (legacy)
    dtype: Dtype = jnp.float32

    def setup(self):
        bb, spec = backbones.make_backbone(self.backbone, self.meta_channels,
                                           dtype=self.dtype)
        self.trunk = bb
        self.spec = spec
        base = spec["base_channels"]
        self.base_channels = base
        self.fpn_block4 = ConvBN(base[1], dtype=self.dtype)
        self.fpn_block3 = ConvBN(base[2], dtype=self.dtype)
        self.fpn_block2 = ConvBN(base[3], dtype=self.dtype)
        self.fpn_block1 = ConvBN(base[4], dtype=self.dtype)
        if self.attention:
            if self.attention_type == "qkv":
                # legacy tanh query-key attention (semanticFCN.py variant)
                self.attention4 = QKVAttentionModule(base[1], dtype=self.dtype)
                self.attention3 = QKVAttentionModule(base[2], dtype=self.dtype)
                self.attention2 = QKVAttentionModule(base[3], dtype=self.dtype)
                self.attention1 = QKVAttentionModule(base[4], dtype=self.dtype)
            else:
                self.attention4 = SpatialAttention(dtype=self.dtype)
                self.attention3 = SpatialAttention(dtype=self.dtype)
                self.attention2 = SpatialAttention(dtype=self.dtype)
                self.attention1 = SpatialAttention(dtype=self.dtype)
        scales = spec.get("scales", (8, 4, 2))
        out_chs = (base[1] // scales[0], base[2] // scales[1],
                   base[3] // scales[2])
        self.upsample_x4 = UpsampleBlock(out_chs[0], scale=scales[0], dtype=self.dtype)
        self.upsample_x3 = UpsampleBlock(out_chs[1], scale=scales[1], dtype=self.dtype)
        self.upsample_x2 = UpsampleBlock(out_chs[2], scale=scales[2], dtype=self.dtype)
        self.pyr_dropout = Dropout2d(self.pyramid_dropout)
        self.dec1 = GNConv(base[4], dtype=self.dtype)
        self.dec2 = GNConv(base[4], dtype=self.dtype)
        self.dec_up = UpsampleBlock(base[4] // 2, scale=2, dtype=self.dtype)
        self.logits_conv = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)

    def features(self, x, meta, train: bool = False):
        """Deterministic trunk: fused feature pyramid at 1/2 resolution."""
        if self.multi_scale_meta:
            metas = [resize_nearest(meta, 0.5), resize_nearest(meta, 0.25),
                     resize_nearest(meta, 0.125)]
        else:
            metas = None
        x_in = jnp.concatenate([x, meta], axis=-1).astype(self.dtype)
        _, x1, x2, x3, x4 = self.trunk(x_in, metas, train=train)
        if self.spec.get("layer4_is_meta_concat") and metas is not None:
            # efficientnet_v2 quirk: the deepest "stage" is x3 with the meta
            # image re-concatenated (reference semanticFCN_opt.py:396-404)
            x4 = jnp.concatenate(
                [x3[..., : x3.shape[-1] - self.meta_channels],
                 metas[2].astype(x3.dtype)], axis=-1)
        x4 = self.fpn_block4(x4, train=train)
        x3 = self.fpn_block3(x3, train=train)
        x2 = self.fpn_block2(x2, train=train)
        x1 = self.fpn_block1(x1, train=train)
        if self.attention:
            x4 = self.attention4(x4)
            x3 = self.attention3(x3)
            x2 = self.attention2(x2)
            x1 = self.attention1(x1)
        x4 = self.upsample_x4(x4)
        x3 = self.upsample_x3(x3)
        x2 = self.upsample_x2(x2)
        return jnp.concatenate([x1, x2, x3, x4], axis=-1)

    def head(self, fused, stochastic: bool = False):
        """Stochastic head: pyramid dropout + decoder -> raw logits."""
        y = self.pyr_dropout(fused, deterministic=not stochastic)
        y = self.dec1(y)
        y = self.dec2(y)
        y = self.dec_up(y)
        out = self.logits_conv(y).astype(jnp.float32)
        if self.head_activation == "elu_plus_one":
            out = jax.nn.elu(out) + 1.0
        return out

    def __call__(self, x, meta, train: bool = False, stochastic: bool | None = None):
        stochastic = train if stochastic is None else stochastic
        fused = self.features(x, meta, train=train)
        return self.head(fused, stochastic=stochastic)
