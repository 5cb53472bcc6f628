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
        # dec1's conv kernel is a raw param (not an nn.Conv) so the fused MC
        # head can fold per-sample dropout masks into the weights (head_mc)
        self.fused_channels = sum(out_chs) + base[4]
        self.dec1_kernel = self.param(
            "dec1_kernel", nn.initializers.lecun_normal(),
            (3, 3, self.fused_channels, base[4]), jnp.float32)
        self.dec1_gn = nn.GroupNorm(
            num_groups=__import__("math").gcd(min(32, base[4]), base[4]) or 1,
            dtype=self.dtype)
        self.dec2 = GNConv(base[4], dtype=self.dtype)
        self.dec_up = UpsampleBlock(base[4] // 2, scale=2, dtype=self.dtype)
        # raw params in the nn.Conv tree layout ("logits_conv/{kernel,bias}")
        # so the 1x1 head can run on phase-form tensors (see _head_tail_phase)
        # while torch converters and existing checkpoints load unchanged
        self.logits_params = self.param(
            "logits_conv",
            lambda rng: {
                "kernel": nn.initializers.lecun_normal()(
                    rng, (1, 1, base[4] // 2, self.num_classes)),
                "bias": jnp.zeros((self.num_classes,), jnp.float32),
            })

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
        # FPN upsample blocks: per-block "auto" choice between the fused
        # phase form and resize->conv (see UpsampleBlock docstring — fused
        # needs a small folded kernel AND a large grid; at the flagship's
        # 64x2048 every FPN block resolves to resize, at 128x2048 the
        # small-channel families keep their x2 block fused). Training
        # always uses resize->conv (faster backward).
        fpn_fused = False if train else "auto"
        x4 = self.upsample_x4(x4, use_fused=fpn_fused)
        x3 = self.upsample_x3(x3, use_fused=fpn_fused)
        x2 = self.upsample_x2(x2, use_fused=fpn_fused)
        return jnp.concatenate([x1, x2, x3, x4], axis=-1)

    def _dec1(self, y):
        y = jax.lax.conv_general_dilated(
            y.astype(self.dtype), self.dec1_kernel.astype(self.dtype),
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return nn.relu(self.dec1_gn(y))

    def _logits(self, y):
        """1x1 logits head on any [..., C'] layout (full-res or phase)."""
        k = self.logits_params["kernel"][0, 0].astype(self.dtype)
        b = self.logits_params["bias"].astype(self.dtype)
        out = (jnp.einsum("...c,co->...o", y, k) + b).astype(jnp.float32)
        if self.head_activation == "elu_plus_one":
            out = jax.nn.elu(out) + 1.0
        return out

    def _head_tail_phase(self, y):
        """dec2 -> fused dec_up (phase form) -> 1x1 logits: [B,h,w,2,2,ncls].

        Phase form keeps every per-pixel op (logits matmul, and downstream
        softmax/entropy in the MC engine) at 1/2-resolution layout; a single
        depth_to_space at the very end replaces a full-resolution round-trip
        per op. Values are identical to the full-res chain.
        """
        y = self.dec2(y)
        y = self.dec_up(y, phase_form=True)       # [B, h, w, 2, 2, C']
        return self._logits(y)

    def _head_tail(self, y, train: bool = False):
        if train:
            # resize->conv composition: faster BACKWARD (see UpsampleBlock)
            y = self.dec2(y)
            y = self.dec_up(y, use_fused=False)
            return self._logits(y)
        from ..ops.upconv import depth_to_space
        return depth_to_space(self._head_tail_phase(y))

    def head(self, fused, stochastic: bool = False, train: bool = False):
        """Stochastic head: pyramid dropout + decoder -> raw logits."""
        y = self.pyr_dropout(fused, deterministic=not stochastic)
        return self._head_tail(self._dec1(y), train=train)

    def head_mc(self, fused, rng, n_samples: int):
        """All T MC samples in one pass: [T, B, H, W, num_classes] logits.

        Channel dropout commutes into dec1's weights (conv(m*x, W) ==
        conv(x, W*m) for per-input-channel masks), so the T samples become a
        SINGLE wide convolution [..., C_in] -> [..., T*C_dec] — one large
        MXU matmul instead of T small ones — and only the cheap tail
        (GN/dec2/upsample/logits) runs per (sample, batch) element.
        """
        y = self.head_mc_pre(fused, rng, n_samples)    # [T, B, H, W, cout]
        t, b, h, w, c = y.shape
        # GN/convs/resize are batch-parallel: fold (T, B) into one batch dim
        out = self._head_tail(nn.relu(self.dec1_gn(y.reshape(t * b, h, w, c))))
        return out.reshape((t, b) + out.shape[1:])     # [T, B, H, W, ncls]

    def head_mc_pre(self, fused, rng, n_samples: int):
        """Fused-dec1 half of head_mc: [T, B, H, W, C_dec] pre-norm
        activations. Pair with `head_post` per sample (see prob.mc_dropout.
        mc_fused_summaries) so the memory-bound full-resolution tail runs one
        sample at a time while dec1 still executes as a single wide conv.

        The T channel masks are shared across the batch (folding per-element
        masks into shared weights is impossible). Every per-element MC
        statistic (p_bar, entropy, MI, ...) depends only on that element's
        own T iid masks, so sharing masks across elements changes nothing
        observable — only the (never used) cross-element sample correlation.
        """
        b, h, w, _ = fused.shape
        cout = self.dec1_kernel.shape[-1]
        y = self.head_mc_pre_flat(fused, rng, n_samples)
        return jnp.moveaxis(y.reshape(b, h, w, n_samples, cout), 3, 0)

    def head_mc_pre_flat(self, fused, rng, n_samples: int):
        """`head_mc_pre` in the wide conv's NATIVE layout: [B, H, W, T*C]
        with sample t's activations in lane block [t*C, (t+1)*C). The
        Pallas mega-tail (ops/pallas_mc_megatail.py) consumes this layout
        directly, skipping head_mc_pre's 167 MB-at-bench-scale transpose."""
        b, h, w, cin = fused.shape
        t = n_samples
        p = self.pyramid_dropout
        keep = jax.random.bernoulli(rng, 1.0 - p, (t, cin))
        scale = 1.0 / (1.0 - p)
        cout = self.dec1_kernel.shape[-1]
        wmask = (self.dec1_kernel[None] *
                 (keep.astype(self.dec1_kernel.dtype) * scale)[:, None, None,
                                                               :, None])
        wbig = jnp.moveaxis(wmask, 0, 3).reshape(3, 3, cin, t * cout)
        return jax.lax.conv_general_dilated(
            fused.astype(self.dtype), wbig.astype(self.dtype),
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def head_post(self, y1):
        """Per-sample tail after head_mc_pre: [B, H, W, C_dec] -> logits."""
        return self._head_tail(nn.relu(self.dec1_gn(y1)))

    def head_mc_tail_raw(self, y1):
        """MC tail up to (but excluding) dec_up's normalization, for the
        fused Pallas reduction (ops/pallas_mc_tail.py): [TB, h, w, C_dec] ->
        (phase_raw [TB, h, w, 2, 2, C'], gn_scale [TB, C'], gn_bias [TB, C'])
        where the affine folds dec_up's GroupNorm. The remaining per-sample
        math (affine, relu, 1x1 logits, softmax, entropy, sum over T) runs
        inside the kernel without touching HBM."""
        z = nn.relu(self.dec1_gn(y1))
        z = self.dec2(z)
        return self.dec_up(z, raw_affine=True)

    def head_post_phase(self, y1):
        """head_post in phase form: [B, h, w, C_dec] -> [B, h, w, 2, 2, ncls]
        logits, where full-res pixel (2i+dr, 2j+dc) lives at [i, j, dr, dc].
        The MC engine accumulates summaries in this layout and converts once
        at the end (prob.mc_dropout.mc_fused_summaries)."""
        return self._head_tail_phase(nn.relu(self.dec1_gn(y1)))

    def __call__(self, x, meta, train: bool = False, stochastic: bool | None = None):
        stochastic = train if stochastic is None else stochastic
        fused = self.features(x, meta, train=train)
        return self.head(fused, stochastic=stochastic, train=train)
