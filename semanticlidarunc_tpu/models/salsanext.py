"""SalsaNext baseline, rebuilt in flax (NHWC).

Topology parity with /root/reference/src/baselines/SalsaNext/SalsaNext.py
(itself verbatim upstream SalsaNext): three ResContext blocks, five dilated
ResBlocks with AvgPool downsampling and Dropout2d(0.2), PixelShuffle UpBlocks,
1x1 logits head with the final softmax removed (:197-215). Its many dropout
layers make it the dropout-rich model for MC sampling, so unlike the FPN model
the whole network is stochastic — MC-dropout vmaps the full forward.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.01)


class _BN(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype)(x)


def pixel_shuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """NHWC PixelShuffle matching torch channel ordering (c*r^2 -> c)."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)         # b, h, r1, w, r2, c
    return x.reshape(b, h * r, w * r, c)


class ResContextBlock(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = _leaky(nn.Conv(self.features, (1, 1), dtype=self.dtype)(x))
        y = _leaky(nn.Conv(self.features, (3, 3), dtype=self.dtype)(shortcut))
        y1 = _BN(self.dtype)(y, train)
        y = _leaky(nn.Conv(self.features, (3, 3), kernel_dilation=(2, 2),
                           dtype=self.dtype)(y1))
        y2 = _BN(self.dtype)(y, train)
        return shortcut + y2


class ResBlock(nn.Module):
    features: int
    dropout_rate: float = 0.2
    pooling: bool = True
    drop_out: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, stochastic: bool = False):
        shortcut = _leaky(nn.Conv(self.features, (1, 1), dtype=self.dtype)(x))
        y = _leaky(nn.Conv(self.features, (3, 3), dtype=self.dtype)(x))
        y1 = _BN(self.dtype)(y, train)
        y = _leaky(nn.Conv(self.features, (3, 3), kernel_dilation=(2, 2),
                           dtype=self.dtype)(y1))
        y2 = _BN(self.dtype)(y, train)
        y = _leaky(nn.Conv(self.features, (2, 2), kernel_dilation=(2, 2),
                           padding=((1, 1), (1, 1)), dtype=self.dtype)(y2))
        y3 = _BN(self.dtype)(y, train)
        y = _leaky(nn.Conv(self.features, (1, 1), dtype=self.dtype)(
            jnp.concatenate([y1, y2, y3], axis=-1)))
        y = _BN(self.dtype)(y, train)
        res = shortcut + y
        if self.drop_out:
            res_d = nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2),
                               deterministic=not stochastic)(res)
        else:
            res_d = res
        if self.pooling:
            pooled = nn.avg_pool(res_d, (3, 3), strides=(2, 2),
                                 padding=((1, 1), (1, 1)),
                                 count_include_pad=True)
            return pooled, res
        return res_d


class UpBlock(nn.Module):
    features: int
    dropout_rate: float = 0.2
    drop_out: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool = False, stochastic: bool = False):
        def drop(z):
            if not self.drop_out:
                return z
            return nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2),
                              deterministic=not stochastic)(z)
        up = drop(pixel_shuffle(x, 2))
        up = drop(jnp.concatenate([up, skip], axis=-1))
        y = _leaky(nn.Conv(self.features, (3, 3), dtype=self.dtype)(up))
        y1 = _BN(self.dtype)(y, train)
        y = _leaky(nn.Conv(self.features, (3, 3), kernel_dilation=(2, 2),
                           dtype=self.dtype)(y1))
        y2 = _BN(self.dtype)(y, train)
        y = _leaky(nn.Conv(self.features, (2, 2), kernel_dilation=(2, 2),
                           padding=((1, 1), (1, 1)), dtype=self.dtype)(y2))
        y3 = _BN(self.dtype)(y, train)
        y = _leaky(nn.Conv(self.features, (1, 1), dtype=self.dtype)(
            jnp.concatenate([y1, y2, y3], axis=-1)))
        y = _BN(self.dtype)(y, train)
        return drop(y)


class SalsaNext(nn.Module):
    num_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, stochastic: bool | None = None):
        stochastic = train if stochastic is None else stochastic
        x = x.astype(self.dtype)
        c = ResContextBlock(32, self.dtype)(x, train)
        c = ResContextBlock(32, self.dtype)(c, train)
        c = ResContextBlock(32, self.dtype)(c, train)

        d0c, d0b = ResBlock(64, 0.2, pooling=True, drop_out=False,
                            dtype=self.dtype)(c, train, stochastic)
        d1c, d1b = ResBlock(128, 0.2, dtype=self.dtype)(d0c, train, stochastic)
        d2c, d2b = ResBlock(256, 0.2, dtype=self.dtype)(d1c, train, stochastic)
        d3c, d3b = ResBlock(256, 0.2, dtype=self.dtype)(d2c, train, stochastic)
        d5c = ResBlock(256, 0.2, pooling=False,
                       dtype=self.dtype)(d3c, train, stochastic)

        u4 = UpBlock(128, 0.2, dtype=self.dtype)(d5c, d3b, train, stochastic)
        u3 = UpBlock(128, 0.2, dtype=self.dtype)(u4, d2b, train, stochastic)
        u2 = UpBlock(64, 0.2, dtype=self.dtype)(u3, d1b, train, stochastic)
        u1 = UpBlock(32, 0.2, drop_out=False,
                     dtype=self.dtype)(u2, d0b, train, stochastic)
        return nn.Conv(self.num_classes, (1, 1),
                       dtype=self.dtype)(u1).astype(jnp.float32)
