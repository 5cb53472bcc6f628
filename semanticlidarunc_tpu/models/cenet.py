"""CENet baseline (HarDNet or ResNet-34 trunk, optional aux heads).

Port of /root/reference/src/baselines/CENet/{CENet,CENet_ResNet34,
CENet_HardDNet}.py in flax/NHWC. Both trunks keep full resolution through the
stem, downsample 3x, upsample all scales back with align-corners bilinear,
and emit softmax PROBABILITIES (the reference applies softmax in-model);
with aux=True the forward returns [out, res_a, res_b, res_c] for the
multi-scale auxiliary loss (CENet trainer.py:104-110).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.01)


def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) align-corners bilinear interpolation matrix: each row
    holds the <=2 taps of torch F.interpolate(align_corners=True)."""
    if n_out == 1 or n_in == 1:
        t = np.zeros((n_out,), np.float64)
    else:
        t = np.linspace(0.0, n_in - 1.0, n_out)
    i0 = np.clip(np.floor(t).astype(np.int64), 0, n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    w1 = (t - i0).astype(np.float32)
    r = np.zeros((n_out, n_in), np.float32)
    np.add.at(r, (np.arange(n_out), i0), 1.0 - w1)
    np.add.at(r, (np.arange(n_out), i1), w1)
    return r


def resize_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize with torch align_corners=True semantics (corner pixels
    map exactly; jax.image.resize only offers half-pixel centers).

    TPU-first formulation: a separable pair of dense matmuls against
    compile-time-constant interpolation matrices (2 taps/row). Gathers at
    128x2048 full resolution serialize on TPU; the matmul form rides the
    MXU instead — the extra MACs over a 2-tap gather are FLOP-trivial
    next to the convs that consume the result.
    """
    b, h, w, c = x.shape
    if h == out_h and w == out_w:
        return x
    # In f32, keep the 2-tap interpolation exact: default matmul precision on
    # TPU runs einsum operands through bf16 passes (~2^-8 relative rounding).
    # bf16 inference keeps the fast default path.
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None)
    out = x
    if h != out_h:
        ry = jnp.asarray(_resize_matrix(h, out_h), x.dtype)
        out = jnp.einsum("oh,bhwc->bowc", ry, out, precision=prec)
    if w != out_w:
        rx = jnp.asarray(_resize_matrix(w, out_w), x.dtype)
        out = jnp.einsum("pw,bhwc->bhpc", rx, out, precision=prec)
    return out


class BasicConv(nn.Module):
    features: int
    kernel: int = 3
    dilation: int = 1
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return _leaky(x) if self.relu else x


class LeakyBasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn():
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype)
        identity = x
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype)(x)
        y = _leaky(bn()(y))
        y = nn.Conv(self.features, (3, 3), use_bias=False, dtype=self.dtype)(y)
        y = bn()(y)
        if self.stride != 1 or identity.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               dtype=self.dtype)(identity)
            identity = bn()(identity)
        return _leaky(y + identity)


class CENetResNet34(nn.Module):
    """ResNet_34 trunk (reference CENet_ResNet34.py:91-198)."""
    num_classes: int
    aux: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, stochastic: bool | None = None):
        d = self.dtype
        x = x.astype(d)
        x = BasicConv(64, dtype=d)(x, train)
        x = BasicConv(128, dtype=d)(x, train)
        x = BasicConv(128, dtype=d)(x, train)
        h, w = x.shape[1], x.shape[2]

        def stage(z, n, stride):
            z = LeakyBasicBlock(128, stride, d)(z, train)
            for _ in range(n - 1):
                z = LeakyBasicBlock(128, 1, d)(z, train)
            return z

        x1 = stage(x, 3, 1)
        x2 = stage(x1, 4, 2)
        x3 = stage(x2, 6, 2)
        x4 = stage(x3, 3, 2)
        r2 = resize_align_corners(x2, h, w)
        r3 = resize_align_corners(x3, h, w)
        r4 = resize_align_corners(x4, h, w)
        out = jnp.concatenate([x, x1, r2, r3, r4], axis=-1)
        out = BasicConv(256, dtype=d)(out, train)
        out = BasicConv(128, dtype=d)(out, train)
        out = nn.Conv(self.num_classes, (1, 1), dtype=d)(out)
        out = jax.nn.softmax(out.astype(jnp.float32), axis=-1)
        if not self.aux:
            return out
        heads = [jax.nn.softmax(nn.Conv(self.num_classes, (1, 1),
                                        dtype=d)(r).astype(jnp.float32), -1)
                 for r in (r2, r3, r4)]
        return [out] + heads


def hard_link(layer: int, base_ch: int, growth: int, grmul: float):
    """(out_ch, in_ch, links) for a HarDBlock layer (CENet_HardDNet.py:
    124-143) — pure static arithmetic evaluated at trace time."""
    if layer == 0:
        return base_ch, 0, []
    out_channels = float(growth)
    link = []
    for i in range(10):
        dv = 2 ** i
        if layer % dv == 0:
            link.append(layer - dv)
            if i > 0:
                out_channels *= grmul
    out_channels = int(int(out_channels + 1) / 2) * 2
    in_channels = sum(hard_link(i, base_ch, growth, grmul)[0] for i in link)
    return out_channels, in_channels, link


class _ConvKernel(nn.Module):
    """Bare conv-kernel param holder, path-compatible with nn.Conv (param
    `<name>/kernel`, lecun-normal init, f32 params, no bias)."""
    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class HarDLayer(nn.Module):
    """One HarDBlock layer (conv3x3 + BN + leaky), parameter-tree-identical
    to BasicConv (`Conv_0/kernel`, `BatchNorm_0`), applied in SPLIT form.

    TPU motivation: on the MXU a conv costs ~ceil(cin/128)*ceil(cout/128)
    lane-tile passes regardless of the real widths, so the reference's
    conv(concat(..., x)) layers (cin 144/170/210 -> 2 cin tiles each) waste
    half their passes on the 128-wide base input. The HarDBlock instead
    computes ALL base-input contributions in ONE merged conv (see
    `HarDBlock.__call__`) and hands each layer its pre-BN additive term;
    the layer then convolves only its narrow non-base inputs. Exact math:
    conv(concat(a, x), k) == conv(a, k[..., :ca, :]) + conv(x, k[..., ca:, :]).
    Measured on v5e 128x2048: HarDBlock1 10.0 -> 6.1 ms.
    """
    features: int
    in_features: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self._k = _ConvKernel((3, 3, self.in_features, self.features),
                              name="Conv_0")
        self._bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                                name="BatchNorm_0")

    def base_kernel(self):
        """Kernel slice acting on the base input x — always the LAST piece
        of the reference concat (hard_link appends j in descending order,
        so j=0 comes last)."""
        return self._k()

    def nonbase_kernel(self, base_ch: int):
        return self._k()[:, :, :self.in_features - base_ch, :]

    def __call__(self, parts, pre=None, base_ch: int = 0,
                 train: bool = False):
        y = None
        if parts:
            z = parts[0] if len(parts) == 1 else jnp.concatenate(parts, -1)
            k = (self.nonbase_kernel(base_ch) if base_ch
                 else self._k()).astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                z.astype(self.dtype), k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if pre is not None:
            y = pre if y is None else y + pre
        y = self._bn(y, use_running_average=not train)
        return _leaky(y)


class HarDBlock(nn.Module):
    in_channels: int
    growth: int = 16
    grmul: float = 1.6
    n_layers: int = 8
    dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        total = 0
        for i in range(self.n_layers):
            outch, _, _ = hard_link(i + 1, self.in_channels, self.growth,
                                    self.grmul)
            if (i % 2 == 0) or (i == self.n_layers - 1):
                total += outch
        return total

    @nn.compact
    def __call__(self, x, train: bool = False):
        base = self.in_channels
        specs = [hard_link(i + 1, base, self.growth, self.grmul)
                 for i in range(self.n_layers)]
        mods = [HarDLayer(outch, inch, dtype=self.dtype,
                          name=f"BasicConv_{i}")
                for i, (outch, inch, _) in enumerate(specs)]

        # merged base-input conv: every layer linking to x contributes its
        # kernel slice; one wide conv replaces n narrow concat-with-x convs
        base_idx = [i for i, (_, _, link) in enumerate(specs) if 0 in link]
        kx = jnp.concatenate(
            [mods[i].base_kernel()[:, :, -base:, :] for i in base_idx],
            axis=-1).astype(self.dtype)
        xc = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kx, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        offs = np.cumsum([0] + [specs[i][0] for i in base_idx])
        pre_of = {i: (int(offs[n]), int(offs[n + 1]))
                  for n, i in enumerate(base_idx)}

        layers = [x]
        for i, (outch, inch, link) in enumerate(specs):
            parts = [layers[j] for j in link if j != 0]
            pre = None
            if i in pre_of:
                lo, hi = pre_of[i]
                pre = xc[..., lo:hi]
            z = mods[i](parts, pre=pre, base_ch=base if pre is not None
                        else 0, train=train)
            layers.append(z)
        keep = [layers[i] for i in range(len(layers))
                if i == len(layers) - 1 or i % 2 == 1]
        return jnp.concatenate(keep, axis=-1)


class CENetHarDNet(nn.Module):
    """HarDNet trunk (reference CENet_HardDNet.py:188-330)."""
    num_classes: int
    aux: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, stochastic: bool | None = None):
        d = self.dtype
        x = x.astype(d)
        first_ch = (64, 128, 128)
        ch_list = (128, 128, 128, 128)
        down = (0, 1, 1, 1)
        x = BasicConv(first_ch[0], dtype=d)(x, train)
        x = BasicConv(first_ch[1], dtype=d)(x, train)
        x = BasicConv(first_ch[2], dtype=d)(x, train)
        h, w = x.shape[1], x.shape[2]
        shortcuts = [x]
        ch = first_ch[2]
        for i in range(4):
            if down[i]:
                x = nn.avg_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                                count_include_pad=True)
            blk = HarDBlock(ch, 16, 1.6, 8, dtype=d)
            x = blk(x, train)
            if i < 3:
                shortcuts.append(x)
            ch = blk.out_channels
            x = BasicConv(ch_list[i], kernel=1, dtype=d)(x, train)
            ch = ch_list[i]
        r1, r2 = shortcuts[0], shortcuts[1]
        r3 = resize_align_corners(shortcuts[2], h, w)
        r4 = resize_align_corners(shortcuts[3], h, w)
        r5 = resize_align_corners(x, h, w)
        out = jnp.concatenate([r1, r2, r3, r4, r5], axis=-1)
        out = BasicConv(256, dtype=d)(out, train)
        out = BasicConv(128, dtype=d)(out, train)
        out = nn.Conv(self.num_classes, (1, 1), dtype=d)(out)
        out = jax.nn.softmax(out.astype(jnp.float32), axis=-1)
        if not self.aux:
            return out
        heads = [jax.nn.softmax(nn.Conv(self.num_classes, (1, 1),
                                        dtype=d)(r).astype(jnp.float32), -1)
                 for r in (r3, r4, r5)]
        return [out] + heads


class CENet(nn.Module):
    """Wrapper choosing the trunk (reference CENet.py:7-26)."""
    num_classes: int
    aux: bool = True
    model: str = "HarDNet"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, stochastic: bool | None = None):
        if self.model == "HarDNet":
            net = CENetHarDNet(self.num_classes, self.aux, self.dtype)
        elif self.model == "ResNet_34":
            net = CENetResNet34(self.num_classes, self.aux, self.dtype)
        else:
            raise ValueError(f"Unknown CENet trunk: {self.model}")
        return net(x, train=train)
