"""Fused bilinear-upsample + 3x3 conv via phase decomposition.

The reference UpsampleBlock (semanticFCN_opt.py:10-28) interpolates by an
integer scale s and then runs a 3x3 conv — materializing the (s*h, s*w, Cin)
upsampled tensor only to immediately contract it. Because x2 bilinear
upsampling (half-pixel centers, clamped edges) is a fixed 2-tap linear map,
`conv3x3(upsample_s(x))` is ALGEBRAICALLY equal to a 3x3 convolution at the
LOW resolution with s*s phase-specific kernels followed by depth-to-space:

    out[si+dr, sj+dc] = sum_{u,v in {-1,0,1}} K[dr,dc][u,v] . x_pad[i+u, j+v]

where x_pad is the edge-replicated input (replication == coordinate clamping)
and K folds the bilinear weights into the conv kernel. For every integer
s >= 2 the support collapses to 3x3 because each upsampled tap is a 2-tap
combination of adjacent input pixels.

This removes the (s^2-1)/s^2 of HBM traffic spent writing+reading the
upsampled intermediate and gives the MXU one dense (9*Cin x s^2*Cout)
contraction instead of a strided mess at full resolution. FLOPs are
identical.

Boundary semantics: inside the image the identity is exact. The reference
conv zero-pads at the FULL-resolution border while the fused form behaves as
if the border were edge-replicated, so exactly the outermost output row/col
on each side differs — those four 1-pixel frames are recomputed exactly from
2-row/2-col strips and patched in (`_border_fix`). The result is bit-exact
(up to dot-product reassociation) with resize->conv; tests/test_upconv.py
asserts <=1e-5 agreement against jax.image.resize + lax.conv.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _phase_matrix(scale: int) -> np.ndarray:
    """M[d, a, u]: weight of low-res tap u in up[s*i + d + a].

    d in [0, s): output phase; a in {-1, 0, 1}: conv tap offset at full res
    (indexed 0..2); u in {-1, 0, 1}: low-res neighbor offset (indexed 0..2).
    Half-pixel bilinear: up[o] sits at input coordinate o/s - (s-1)/(2s).
    """
    s = scale
    m = np.zeros((s, 3, 3), np.float64)
    for d in range(s):
        for ai, a in enumerate((-1, 0, 1)):
            c = (d + a) / s - (s - 1) / (2 * s)
            f = int(np.floor(c))
            frac = c - f
            for off, wt in ((f, 1.0 - frac), (f + 1, frac)):
                if wt != 0.0:
                    assert -1 <= off <= 1, (scale, d, a, off)
                    m[d, ai, off + 1] += wt
    return m


def fold_kernel(kernel: jnp.ndarray, scale: int) -> jnp.ndarray:
    """(3,3,Cin,Cout) conv kernel -> (3,3,Cin,s,s,Cout) phase kernels."""
    m = jnp.asarray(_phase_matrix(scale), kernel.dtype)
    # K[u,v,i,dr,dc,o] = sum_{a,b} W[a,b,i,o] M[dr,a,u] M[dc,b,v]
    return jnp.einsum("abio,dau,ebv->uvideo", kernel, m, m)


def _conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def upsample_conv_phase_noborder(x: jnp.ndarray, kernel: jnp.ndarray,
                                 scale: int) -> jnp.ndarray:
    """Phase-form fused upsample+conv WITHOUT the border correction: the
    outermost full-res output row/col on each side behaves as if the border
    were edge-replicated (instead of the reference's zero padding). Interior
    values are exact; `upsample_conv_phase` pairs this with `border_strips`
    for exactness.

    Degenerate grids (h<2 or w<2) fall back to exact resize+conv (the
    caller sees border_strips() return None for them)."""
    b, h, w, cin = x.shape
    s = scale
    cout = kernel.shape[-1]
    if h < 2 or w < 2:
        # degenerate grids (e.g. the deepest FPN stage of a tiny test image)
        # have no interior for the border assembly; use plain resize+conv
        up = jax.image.resize(x, (b, h * s, w * s, cin), method="bilinear")
        y = jax.lax.conv_general_dilated(
            up, kernel.astype(x.dtype), (1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.reshape(b, h, s, w, s, cout).transpose(0, 1, 3, 2, 4, 5)
    kf = fold_kernel(kernel, s).reshape(3, 3, cin, s * s * cout)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = _conv(xp.astype(x.dtype), kf.astype(x.dtype))
    return y.reshape(b, h, w, s, s, cout)


def upsample_conv_phase(x: jnp.ndarray, kernel: jnp.ndarray,
                        scale: int) -> jnp.ndarray:
    """conv3x3(bilinear_up_s(x)) in PHASE FORM: [B,h,w,s,s,Cout].

    Phase form holds out_full[b, s*i+dr, s*j+dc, c] at [b, i, j, dr, dc, c];
    use `depth_to_space` to lay it out at full resolution. Per-pixel ops
    (1x1 convs, normalizations with phase folded into the reduction axes,
    softmax over channels) can run directly on phase form, skipping the
    full-resolution round-trip entirely.
    """
    b, h, w, cin = x.shape
    y = upsample_conv_phase_noborder(x, kernel, scale)
    if h < 2 or w < 2:
        return y
    return _border_fix(y, x, kernel, scale)


def upsample_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                  scale: int) -> jnp.ndarray:
    """Drop-in for `conv3x3(jax.image.resize(x, s*hw, "bilinear"))`."""
    return depth_to_space(upsample_conv_phase(x, kernel, scale))


def depth_to_space(y_phase: jnp.ndarray) -> jnp.ndarray:
    """[B,h,w,s,s,C] phase form -> [B,s*h,s*w,C] full resolution."""
    b, h, w, s, s2, c = y_phase.shape
    return y_phase.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * s, w * s2, c)


def _upsample1d(x: jnp.ndarray, scale: int, axis: int, out_len: int,
                take: slice) -> jnp.ndarray:
    """Exact half-pixel bilinear upsample along one axis (clamped edges)."""
    n = x.shape[axis]
    if scale == 2 and out_len == 2 * n:
        # static-slice fast path (TPU gathers are slow): out[2i] =
        # 0.25*x[i-1] + 0.75*x[i], out[2i+1] = 0.75*x[i] + 0.25*x[i+1],
        # edges clamped — same multiplier order and exactly-representable
        # weights as the gather form below (interior bit-identical; clamped
        # edge rows agree to 1 ulp: 0.25a+0.75a vs a*1+b*0).
        def shift(lo: bool):
            idx = [slice(None)] * x.ndim
            idx[axis] = slice(None, -1) if lo else slice(1, None)
            edge = [slice(None)] * x.ndim
            edge[axis] = slice(None, 1) if lo else slice(-1, None)
            parts = ([x[tuple(edge)], x[tuple(idx)]] if lo
                     else [x[tuple(idx)], x[tuple(edge)]])
            return jnp.concatenate(parts, axis)
        even = shift(True) * 0.25 + x * 0.75
        odd = x * 0.75 + shift(False) * 0.25
        out = jnp.stack([even, odd], axis=axis + 1)
        shp = list(x.shape)
        shp[axis] = 2 * n
        out = out.reshape(shp)
        idx = [slice(None)] * x.ndim
        idx[axis] = take
        return out[tuple(idx)]
    coord = jnp.arange(out_len) / scale - (scale - 1) / (2 * scale)
    coord = jnp.clip(coord, 0.0, n - 1.0)
    lo = jnp.floor(coord).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n - 1)
    frac = (coord - lo).astype(x.dtype)
    shape = [1] * x.ndim
    shape[axis] = out_len
    frac = frac.reshape(shape)
    xl = jnp.take(x, lo, axis=axis)
    xh = jnp.take(x, hi, axis=axis)
    out = xl * (1 - frac) + xh * frac
    idx = [slice(None)] * x.ndim
    idx[axis] = take
    return out[tuple(idx)]


def border_strips(x: jnp.ndarray, kernel: jnp.ndarray, s: int):
    """TRUE zero-pad border values of conv3x3(upsample_s(x)) as 4 full-res
    strips: (row0, rowl [B,s,ws,C], col0, coll [B,hs,s,C]).

    The row strips cover full-res rows [0,s) / [hs-s,hs) across ALL
    columns; the col strips cover cols [0,s) / [ws-s,ws) across ALL rows —
    corner values appear in both and are identical (doubly-zero-padded).
    Returns None for degenerate grids (h<2 or w<2, where
    upsample_conv_phase_noborder already fell back to the exact path).
    """
    b, h, w, cin = x.shape
    if h < 2 or w < 2:
        return None
    ws, hs = w * s, h * s
    k = kernel.astype(x.dtype)
    dn = ("NHWC", "HWIO", "NHWC")

    # -- top / bottom strips: all s phases of output rows [0, s) and
    # [hs-s, hs), i.e. true `up` rows [-1, s] and [hs-s-1, hs] with the
    # out-of-range rows zero (conv padding) --------------------------------
    def row_strip(rows_x, lo_pad: bool):
        # `up` rows touching the strip: s+2 rows; build from the 2 boundary
        # input rows (every needed up row depends on at most those two)
        st = _upsample1d(rows_x, s, 1, 2 * s,
                         slice(0, s + 1) if lo_pad else
                         slice(s - 1, 2 * s))                # s+1 real rows
        st = _upsample1d(st, s, 2, ws, slice(None))          # all up cols
        zero = jnp.zeros_like(st[:, :1])
        return (jnp.concatenate([zero, st], 1) if lo_pad
                else jnp.concatenate([st, zero], 1))         # [B,s+2,ws,Cin]

    top = row_strip(x[:, :2], True)
    bot = row_strip(x[:, -2:], False)
    row0 = jax.lax.conv_general_dilated(
        top, k, (1, 1), padding=((0, 0), (1, 1)), dimension_numbers=dn)
    rowl = jax.lax.conv_general_dilated(
        bot, k, (1, 1), padding=((0, 0), (1, 1)), dimension_numbers=dn)

    # -- left / right strips (over ALL hs rows, so corners come out with
    # the true doubly-zero-padded values) ----------------------------------
    def col_strip(cols_x, lo_pad: bool):
        st = _upsample1d(cols_x, s, 2, 2 * s,
                         slice(0, s + 1) if lo_pad else slice(s - 1, 2 * s))
        st = _upsample1d(st, s, 1, hs, slice(None))          # [B,hs,s+1,Cin]
        zero = jnp.zeros_like(st[:, :, :1])
        return (jnp.concatenate([zero, st], 2) if lo_pad
                else jnp.concatenate([st, zero], 2))

    left = col_strip(x[:, :, :2], True)
    right = col_strip(x[:, :, -2:], False)
    col0 = jax.lax.conv_general_dilated(
        left, k, (1, 1), padding=((1, 1), (0, 0)), dimension_numbers=dn)
    coll = jax.lax.conv_general_dilated(
        right, k, (1, 1), padding=((1, 1), (0, 0)), dimension_numbers=dn)
    return row0, rowl, col0, coll


def _border_fix(y_phase: jnp.ndarray, x: jnp.ndarray, kernel: jnp.ndarray,
                s: int) -> jnp.ndarray:
    """Patch the 4 one-pixel output frames where conv zero-padding at the
    UPSAMPLED border differs from the fused form's implicit replication.

    Assembled with axis-aligned concatenations (first/last i-slab along
    axis 1, then first/last j-slab along axis 2) rather than scattered
    `.at[].set` updates: a multi-axis scatter into the [B,h,w,s,s,C] tensor
    measured +4 ms at the MC-20 bench scale, while two concats fold into the
    consumer's layout for ~0.1 ms. (Carrying the strips separately through
    the MC reduction and pasting once per scan was also tried — the ~25
    extra small ops per sample measured FAR worse, 41.5 -> 17.4 scans/s
    e2e; per-op overhead beats the two concats. Do not retry.)
    """
    b, h, w, cin = x.shape
    cout = y_phase.shape[-1]
    row0, rowl, col0, coll = border_strips(x, kernel, s)

    # [B, s, ws, C] -> phase slab [B, 1, w, s(dr), s(dc), C]
    def to_slab_i(r):
        return r.reshape(b, s, w, s, cout).transpose(0, 2, 1, 3, 4)[:, None]

    y_phase = jnp.concatenate(
        [to_slab_i(row0), y_phase[:, 1:-1], to_slab_i(rowl)], axis=1)

    # [B, hs, s, C] -> phase slab [B, h, 1, s(dr), s(dc), C]
    def to_slab_j(r):
        return r.reshape(b, h, s, s, cout)[:, :, None]

    return jnp.concatenate(
        [to_slab_j(col0), y_phase[:, :, 1:-1], to_slab_j(coll)], axis=2)
