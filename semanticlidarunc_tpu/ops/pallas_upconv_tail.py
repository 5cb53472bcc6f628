"""Pallas TPU kernel: fused phase-form upsample+conv for the MC tail.

The MC-20 tail spends most of its time in the dec_up span: XLA runs the
folded upsample+conv (ops/upconv.py), assembles the zero-pad border fix with
two full-tensor concatenations, computes GroupNorm statistics over the 6-D
phase tensor, and materializes every intermediate in HBM. Measured on v5e at
bench scale (resnet50, T=20, 64x2048) that span costs ~5.5 ms of the ~10 ms
tail (tools/exp_mc_tail.py).

This kernel replaces the whole span with ONE pass per (sample, row-chunk):

  z chunk (+1-row halo, DMA'd from HBM with clamped row indices == edge
  padding) -> im2col slab [R*W, 3C] per row-tap u -> 3 MXU matmuls
  [R*W, 3C] @ [3C, P*C'] accumulated in f32 -> border strips patched in by
  lane/row masks (no concats) -> bf16 act chunk + per-lane GroupNorm
  partial sums.

The act tensor comes out in the FLAT [TB, N, P*C'] layout that
ops/pallas_mc_tail.mc_tail_reduce consumes, so the remaining tail
(GroupNorm affine + ReLU + 1x1 logits + softmax/entropy accumulation over T)
runs in the existing fused reduction kernel and the 6-D phase tensor never
exists anywhere.

GroupNorm statistics: the kernel only reduces over ROWS (pixels), emitting
per-lane (sum, sum-of-squares) — lane-local, no cross-lane work on the VPU.
The host-side wrapper folds lanes -> groups (a [2, P*C'] -> [2, G] reduction
on a tiny tensor) and builds the affine exactly like models/layers.
_groupnorm_affine does (f32 stats of the bf16 tensor, eps 1e-6).

Reference semantics being reproduced: bilinear-resize -> 3x3 conv -> GN
(src/baselines/Reichert/semanticFCN_opt.py:10-28) with zero-pad conv borders
(ops/upconv.py border_strips); bit-compatibility is asserted by
tests/test_pallas_upconv_tail.py against the XLA production path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(h2, w2, c, pc, zero_pad, with_border, with_affine, *refs):
    """Unified conv-stage kernel: [GN affine + ReLU] -> 3x3 conv (as three
    [R*W, 3C] @ [3C, PC] row-tap matmuls) -> [additive border corrections]
    -> act chunk + per-lane GroupNorm partials.

    zero_pad=True  : conv zero-pads at image edges (nn.Conv SAME — dec2)
    zero_pad=False : edge replication (the folded upsample+conv — dec_up)
    """
    refs = list(refs)
    z_hbm = refs.pop(0)
    wu_ref = refs.pop(0)
    a_ref = refs.pop(0) if with_affine else None
    b_ref = refs.pop(0) if with_affine else None
    if with_border:
        row0_ref, rowl_ref, col0_ref, coll_ref = refs[:4]
        refs = refs[4:]
    act_ref, st_ref, z_scr, sem = refs
    ci = pl.program_id(1)
    r = act_ref.shape[1] // w2                     # rows per chunk
    r0 = ci * r

    # --- haloed chunk DMA: rows [r0-1, r0+r] with clamped row indices ------
    tb = pl.program_id(0)
    top = jnp.maximum(r0 - 1, 0)
    bot = jnp.minimum(r0 + r, h2 - 1)
    cp_main = pltpu.make_async_copy(
        z_hbm.at[tb, pl.ds(r0, r)], z_scr.at[pl.ds(1, r)], sem.at[0])
    cp_top = pltpu.make_async_copy(
        z_hbm.at[tb, pl.ds(top, 1)], z_scr.at[pl.ds(0, 1)], sem.at[1])
    cp_bot = pltpu.make_async_copy(
        z_hbm.at[tb, pl.ds(bot, 1)], z_scr.at[pl.ds(r + 1, 1)], sem.at[2])
    cp_main.start()
    cp_top.start()
    cp_bot.start()
    cp_main.wait()
    cp_top.wait()
    cp_bot.wait()

    # --- folded GroupNorm affine + ReLU (f32 affine, cast, then ReLU —
    # same op order as models/layers) --------------------------------------
    if with_affine:
        za = jnp.maximum(
            (z_scr[:].astype(jnp.float32) * a_ref[0] + b_ref[0]),
            0.0).astype(z_scr.dtype)
    else:
        za = z_scr[:]
    if zero_pad:
        # halo rows outside the image are conv ZERO padding (post-ReLU
        # activations are zero-padded by nn.Conv SAME)
        hrow = jax.lax.broadcasted_iota(jnp.int32, (r + 2, 1, 1), 0) + r0 - 1
        za = jnp.where((hrow >= 0) & (hrow < h2), za, 0.0)

    # --- conv: 3 row-taps, each an [R*W, 3C] @ [3C, PC] matmul -------------
    acc = jnp.zeros((r * w2, pc), jnp.float32)
    for u in range(3):
        zu = za[u:u + r]                           # [R, W, C]
        if zero_pad:
            left = right = jnp.zeros_like(zu[:, :1])
        else:
            left, right = zu[:, :1], zu[:, -1:]
        slab = jnp.concatenate(
            [jnp.concatenate([left, zu[:, :-1]], axis=1),
             zu,
             jnp.concatenate([zu[:, 1:], right], axis=1)],
            axis=-1).reshape(r * w2, 3 * c)        # [R*W, 3C] (v-major, C)
        acc += jnp.dot(slab, wu_ref[u], preferred_element_type=jnp.float32)
    y = acc.reshape(r, w2, pc)

    if with_border:
        # additive zero-pad border corrections (row 0 / H-1, col 0 / W-1);
        # slabs from border_correction_slabs carry zeros on unaffected lanes
        rows = jax.lax.broadcasted_iota(jnp.int32, (r, w2, 1), 0) + r0
        cols = jax.lax.broadcasted_iota(jnp.int32, (r, w2, 1), 1)
        zero = jnp.float32(0.0)
        y = y + jnp.where(rows == 0, row0_ref[0].astype(jnp.float32), zero)
        y = y + jnp.where(rows == h2 - 1, rowl_ref[0].astype(jnp.float32),
                          zero)
        y = y + jnp.where(cols == 0,
                          col0_ref[0, :, 0][:, None].astype(jnp.float32),
                          zero)
        y = y + jnp.where(cols == w2 - 1,
                          coll_ref[0, :, 0][:, None].astype(jnp.float32),
                          zero)

    ybf = y.astype(act_ref.dtype)
    act_ref[0] = ybf.reshape(r * w2, pc)

    # --- per-lane GroupNorm partials over the stored tensor ----------------
    yf = ybf.astype(jnp.float32).reshape(r * w2, pc)
    s1 = jnp.sum(yf, axis=0, keepdims=True)        # [1, PC]
    s2 = jnp.sum(yf * yf, axis=0, keepdims=True)

    @pl.when(ci == 0)
    def _():
        st_ref[0] = jnp.zeros_like(st_ref[0])
    st_ref[0, 0:1] += s1
    st_ref[0, 1:2] += s2


def _pick_rows(h2: int, target: int = 4) -> int:
    """Largest divisor of h2 <= target. Measured on v5e at bench scale
    (tools/exp_mc_tail.py `rows`): dec2 stage best at 16 rows/chunk, the
    wider dec_up stage best at 8 (its f32 accumulator doubles the VMEM
    footprint per row)."""
    for r in range(min(h2, target), 0, -1):
        if h2 % r == 0:
            return r
    return 1


def _conv_stage_call(z, wu, a, b, slabs, pc, zero_pad, interpret, rows):
    """Shared pallas_call plumbing for both conv stages. a/b None = no
    input affine+ReLU (z is consumed as-is)."""
    tb, h2, w2, c = z.shape
    r = _pick_rows(h2) if rows is None else rows
    grid = (tb, h2 // r)
    with_border = slabs is not None
    with_affine = a is not None

    # affine carried as [TB, 1, C] — a (1, 1, C) block satisfies Mosaic's
    # last-two-dims constraint (dim == full array dim)
    affine_specs = [] if not with_affine else [
        pl.BlockSpec((1, 1, c), lambda tb_, ci: (tb_, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c), lambda tb_, ci: (tb_, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    border_specs = [] if not with_border else [
        pl.BlockSpec((1, 1, w2, pc), lambda tb_, ci: (tb_, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, w2, pc), lambda tb_, ci: (tb_, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, r, 1, pc), lambda tb_, ci: (tb_, ci, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, r, 1, pc), lambda tb_, ci: (tb_, ci, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    affine_args = () if not with_affine else (
        a.astype(jnp.float32).reshape(a.shape[0], 1, c),
        b.astype(jnp.float32).reshape(b.shape[0], 1, c))
    return pl.pallas_call(
        functools.partial(_kernel, h2, w2, c, pc, zero_pad, with_border,
                          with_affine),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                 # z (HBM)
            pl.BlockSpec((3, 3 * c, pc), lambda tb_, ci: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + affine_specs + border_specs,
        out_specs=[
            pl.BlockSpec((1, r * w2, pc), lambda tb_, ci: (tb_, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, pc), lambda tb_, ci: (tb_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tb, h2 * w2, pc), z.dtype),
            jax.ShapeDtypeStruct((tb, 2, pc), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((r + 2, w2, c), z.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        # v5e has 128 MB of VMEM; the default Mosaic limit (~16 MB) blocks
        # row chunks bigger than 4 (tools/exp_mc_tail.py VMEM probe)
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(z, wu, *affine_args, *(slabs if with_border else ()))


@functools.partial(jax.jit, static_argnames=("interpret", "rows"))
def upconv_act_pallas(z, kernel, row0, rowl, col0, coll, a=None, b=None,
                      interpret: bool = False, rows: int | None = None):
    """Fused dec_up conv stage for the MC tail.

    Args:
      z:      [TB, H2, W2, C] dec2 output — post-GN2 activations when a/b
              are None (consumed as-is), or the RAW dec2 conv output with
              the folded GN2 affine passed as a/b [TB, C] (affine + ReLU
              run inside the kernel).
      kernel: [3, 3, C, C'] f32 dec_up conv kernel (pre-fold)
      row0/rowl: [TB, 1, W2, P*C'] additive border slabs (rows)
      col0/coll: [TB, H2, 1, P*C'] additive border slabs (cols)
    Returns:
      act:        [TB, H2*W2, P*C'] in z.dtype — patched pre-GN3 output
      lane_stats: [TB, 2, P*C'] f32 — (sum, sum^2) per lane over pixels
    """
    from .upconv import fold_kernel

    tb, h2, w2, c = z.shape
    pc = 4 * kernel.shape[-1]
    wu = fold_kernel(kernel, 2).reshape(3, 3 * c, pc).astype(z.dtype)
    if rows is None:
        rows = _pick_rows(h2, target=8)
    return _conv_stage_call(z, wu, a, b, (row0, rowl, col0, coll), pc,
                            zero_pad=False, interpret=interpret, rows=rows)


@functools.partial(jax.jit, static_argnames=("interpret", "rows"))
def dec2_act_pallas(y1, kernel, a, b, interpret: bool = False,
                    rows: int | None = None):
    """Fused dec2 stage: GN1 affine + ReLU + 3x3 zero-pad conv (GNConv's
    nn.Conv SAME) in one pass.

    Args:
      y1:     [TB, H2, W2, C] raw dec1 output (pre-GN1)
      kernel: [3, 3, C, C2] dec2 conv kernel
      a, b:   [TB, C] folded GN1 affine (models/layers._groupnorm_affine)
    Returns:
      z2raw:      [TB, H2*W2, C2] in y1.dtype — raw dec2 conv output
      lane_stats: [TB, 2, C2] f32 — (sum, sum^2) per lane over pixels
    """
    tb, h2, w2, c = y1.shape
    c2 = kernel.shape[-1]
    wu = kernel.reshape(3, 3 * c, c2).astype(y1.dtype)
    if rows is None:
        rows = _pick_rows(h2, target=16)
    return _conv_stage_call(y1, wu, a, b, None, c2, zero_pad=True,
                            interpret=interpret, rows=rows)


def upconv_act_reference(z, kernel, row0, rowl, col0, coll):
    """Pure-JAX oracle with identical semantics (tests + non-TPU path):
    noborder folded conv + ADDITIVE border-correction slabs."""
    from .upconv import fold_kernel

    tb, h2, w2, c = z.shape
    cout = kernel.shape[-1]
    pc = 4 * cout
    kf = fold_kernel(kernel, 2).reshape(3, 3, c, pc)
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        zp, kf.astype(z.dtype), (1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
    rows = jnp.arange(h2)[None, :, None, None]
    cols = jnp.arange(w2)[None, None, :, None]
    y = y + jnp.where(rows == 0, row0.astype(jnp.float32), 0.0)
    y = y + jnp.where(rows == h2 - 1, rowl.astype(jnp.float32), 0.0)
    y = y + jnp.where(cols == 0, col0.astype(jnp.float32), 0.0)
    y = y + jnp.where(cols == w2 - 1, coll.astype(jnp.float32), 0.0)
    ybf = y.astype(z.dtype)
    yf = ybf.astype(jnp.float32)
    s1 = jnp.sum(yf, axis=(1, 2))
    s2 = jnp.sum(yf * yf, axis=(1, 2))
    return (ybf.reshape(tb, h2 * w2, pc),
            jnp.stack([s1, s2], axis=1))


def border_correction_slabs(kernel, z_top, z_bot, z_left, z_right):
    """ADDITIVE zero-pad corrections for the noborder folded conv.

    The folded phase conv over edge-padded z behaves as if the UPSAMPLED
    image were edge-replicated; the reference conv zero-pads at full
    resolution instead. For s=2 the out-of-range up rows the folded form
    implicitly reads collapse to clamped blends of a single boundary
    row/col (up[-1] == up[0] == z[0] exactly), so

        true = noborder - K_edge_tap . up(boundary)        per border,
             + K_corner . z[corner]                        at the 4 corners
                                                (the doubly-counted tap).

    That makes each correction ONE 1-row/1-col conv over the W-/H-upsampled
    boundary — ~1% of the cost of recomputing true border strips
    (ops/upconv.border_strips: 2.4 ms of the MC-20 tail at bench scale,
    dominated by the tall-narrow strip convolutions).

    Takes the four post-GN2 boundary slices of z (top/bot [TB, W2, C],
    left/right [TB, H2, C]) rather than the full tensor, so the caller can
    supply them from the raw dec2 output + folded affine without ever
    materializing the normalized z.

    Returns phase-layout slabs with zeros on unaffected lanes:
      top, bot  [TB, 1, W2, P*C']  — added at phase rows (i=0, dr=0) /
                                     (i=H2-1, dr=1)
      left, right [TB, H2, 1, P*C'] — added at phase cols (j=0, dc=0) /
                                      (j=W2-1, dc=1)
    """
    from .upconv import _upsample1d

    tb, w2, c = z_top.shape
    h2 = z_left.shape[1]
    cout = kernel.shape[-1]
    s = 2
    hs, ws = h2 * s, w2 * s
    k = kernel.astype(z_top.dtype)
    dn = ("NHWC", "HWIO", "NHWC")

    def row_corr(boundary_row, k_tap):          # [TB, W2, C], [1,3,C,C']
        up = _upsample1d(boundary_row, s, 1, ws, slice(None))  # [TB, ws, C]
        up = jnp.pad(up[:, None], ((0, 0), (0, 0), (1, 1), (0, 0)),
                     mode="edge")
        out = jax.lax.conv_general_dilated(
            up, k_tap, (1, 1), padding="VALID", dimension_numbers=dn)
        return -out.reshape(tb, 1, w2, s * cout)     # lanes (dc, c)

    def col_corr(boundary_col, k_tap):          # [TB, H2, C], [3,1,C,C']
        up = _upsample1d(boundary_col, s, 1, hs, slice(None))  # [TB, hs, C]
        up = jnp.pad(up[:, :, None], ((0, 0), (1, 1), (0, 0), (0, 0)),
                     mode="edge")
        out = jax.lax.conv_general_dilated(
            up, k_tap, (1, 1), padding="VALID", dimension_numbers=dn)
        return -out.reshape(tb, h2, s, cout)         # [TB, H2, dr, C']

    zeros_row = jnp.zeros((tb, 1, w2, s * cout), z_top.dtype)
    top = jnp.concatenate(
        [row_corr(z_top, k[0:1]), zeros_row], axis=-1)         # dr=0 lanes
    bot = jnp.concatenate(
        [zeros_row, row_corr(z_bot, k[2:3])], axis=-1)         # dr=1 lanes

    lv = col_corr(z_left, k[:, 0:1])                           # [TB,H2,2,C']
    rv = col_corr(z_right, k[:, 2:3])
    # corner add-backs: the shared out-of-range tap (row AND col edge) is
    # subtracted twice by (top|bot) + (left|right); add it back once.
    lv = lv.at[:, 0, 0].add(jnp.einsum("bc,co->bo", z_top[:, 0], k[0, 0]))
    lv = lv.at[:, -1, 1].add(jnp.einsum("bc,co->bo", z_bot[:, 0], k[2, 0]))
    rv = rv.at[:, 0, 0].add(jnp.einsum("bc,co->bo", z_top[:, -1], k[0, 2]))
    rv = rv.at[:, -1, 1].add(jnp.einsum("bc,co->bo", z_bot[:, -1], k[2, 2]))
    zc = jnp.zeros((tb, h2, 1, cout), z_top.dtype)
    # lane layout (dr, dc, c): left fills (dr, 0, c), right fills (dr, 1, c)
    left = jnp.concatenate([lv[:, :, None, 0], zc, lv[:, :, None, 1], zc],
                           axis=-1)
    right = jnp.concatenate([zc, rv[:, :, None, 0], zc, rv[:, :, None, 1]],
                            axis=-1)
    return top, bot, left, right


def lane_stats_to_affine(lane_stats, n_pixels: int, groups: int,
                         scale, bias, eps: float = 1e-6, phases: int = 4):
    """[TB, 2, P*C'] per-lane partials -> per-(TB, C') GroupNorm affine.

    Pools (pixels, phases, channels-in-group) exactly like models/layers.
    _groupnorm_affine over the 6-D phase tensor (phases=4), or plain
    GroupNorm over a [TB, N, C] tensor (phases=1 — the dec2 stage).
    """
    from ..models.layers import _gn_stats_to_affine

    tb, _, pc = lane_stats.shape
    cout = pc // phases
    cpg = cout // groups
    per_ch = lane_stats.reshape(tb, 2, phases, cout).sum(axis=2)
    per_g = per_ch.reshape(tb, 2, groups, cpg).sum(axis=3)     # [TB, 2, G]
    n = n_pixels * phases * cpg
    mean = per_g[:, 0] / n
    var = jnp.maximum(per_g[:, 1] / n - mean * mean, 0.0)
    return _gn_stats_to_affine(mean, var, groups, cout, scale, bias, eps)
