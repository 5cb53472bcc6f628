"""Pallas TPU mega-kernel: the ENTIRE per-sample MC tail in one program.

The 3-kernel pipeline (ops/pallas_upconv_tail.py + ops/pallas_mc_tail.py)
still round-trips dec2's output (167 MB) and the phase activations (335 MB)
through HBM and pays XLA glue between kernels. A whole half-resolution
sample (32x1024) with every intermediate fits comfortably in the 128 MB of
v5e VMEM, so this kernel runs, per (batch-element, sample) grid step:

  DMA y1[t]  ->  GN1 stats+affine+ReLU          (in VMEM, in-kernel stats)
             ->  dec2 3x3 conv (zero-pad)        row-tap im2col matmuls
             ->  GN2 stats+affine+ReLU
             ->  border corrections               1-row/col conv matmuls
             ->  folded upsample+conv (edge-pad) + corrections
             ->  GN3 stats+affine+ReLU
             ->  1x1 logits -> per-phase softmax/entropy
             ->  p/h accumulators  (output block revisited across t:
                                    resident in VMEM for the whole T loop)

HBM traffic per sample: read y1 (8.4 MB) — everything else lives and dies
in VMEM; the p/h accumulator spills once at the end. GroupNorm statistics
are computed in-kernel (the whole sample is resident), so no XLA passes
exist between stages at all.

Numerics mirror prob/mc_dropout.mc_pallas_tail_summaries (same folded-
affine op order, same additive border-correction algebra, same per-phase
softmax with true per-group maxes); tests/test_pallas_megatail.py pins the
kernel against that pipeline and the XLA production tail.

IMPORTANT: call from a SMALL jit (inference.py split pipeline) — a Mosaic
custom call embedded in the large trunk program stalls ~25 ms/iteration in
this runtime (tools/exp_mc_tail.py compose2).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _group_affine(s1, s2, n, sel, scale, bias, eps=1e-6):
    """Per-lane (sum, sumsq) [1, C] -> folded affine lanes ([1,C], [1,C]).

    sel [G, C] is the 0/1 lane->group indicator; math matches
    models/layers._groupnorm_affine (single-pass moments, f32)."""
    sg = jnp.dot(sel, s1.reshape(-1, 1),
                 preferred_element_type=jnp.float32)        # [G, 1]
    sq = jnp.dot(sel, s2.reshape(-1, 1),
                 preferred_element_type=jnp.float32)
    mean_g = sg / n
    var_g = jnp.maximum(sq / n - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)                      # [G, 1]
    inv = jnp.dot(inv_g.reshape(1, -1), sel,
                  preferred_element_type=jnp.float32)       # [1, C]
    mean = jnp.dot(mean_g.reshape(1, -1), sel,
                   preferred_element_type=jnp.float32)
    a = inv * scale
    b = bias - mean * a
    return a, b


def _lane_moments(x2d):
    """[N, C] f32 -> per-lane (sum, sumsq) [1, C]."""
    s1 = jnp.sum(x2d, axis=0, keepdims=True)
    s2 = jnp.sum(x2d * x2d, axis=0, keepdims=True)
    return s1, s2


def _row_slab(za, lo, hi, w2, c, zero_cols):
    """[rows, w, C] -> [(hi-lo)*w, 3C] with column shifts (v-major)."""
    zu = za[lo:hi]
    if zero_cols:
        edge_l = edge_r = jnp.zeros_like(zu[:, :1])
    else:
        edge_l, edge_r = zu[:, :1], zu[:, -1:]
    return jnp.concatenate(
        [jnp.concatenate([edge_l, zu[:, :-1]], axis=1),
         zu,
         jnp.concatenate([zu[:, 1:], edge_r], axis=1)],
        axis=-1).reshape((hi - lo) * w2, 3 * c)


def _up2(x):
    """scale-2 half-pixel bilinear along axis 0 of [N, C]: returns
    (even [N, C], odd [N, C]) where up[2i]=even[i], up[2i+1]=odd[i]."""
    prev = jnp.concatenate([x[:1], x[:-1]], axis=0)
    nxt = jnp.concatenate([x[1:], x[-1:]], axis=0)
    even = prev * 0.25 + x * 0.75
    odd = x * 0.75 + nxt * 0.25
    return even, odd


def _edge_corr(even, odd, k_flat):
    """Border correction in phase form along the upsampled axis.

    up taps for full-res position 2j+dc with offsets b in {-1,0,1}:
      dc=0: [odd[j-1], even[j], odd[j]]
      dc=1: [even[j], odd[j], even[j+1]]
    (out-of-range up positions are edge-replicated). Returns
    [-(slab @ k_flat)] per dc, concatenated: [n, 2*Cout] lanes (dc, c)."""
    odd_m1 = jnp.concatenate([even[:1], odd[:-1]], axis=0)
    even_p1 = jnp.concatenate([even[1:], odd[-1:]], axis=0)
    c = even.shape[-1]
    km, k0, kp = k_flat[0:c], k_flat[c:2 * c], k_flat[2 * c:3 * c]

    def tap3(xm, x0, xp):
        # per-tap matmuls (a lane-concat after sublane shifts trips a
        # Mosaic relayout limitation; three K=C matmuls are tiny anyway)
        return -(jnp.dot(xm, km, preferred_element_type=jnp.float32)
                 + jnp.dot(x0, k0, preferred_element_type=jnp.float32)
                 + jnp.dot(xp, kp, preferred_element_type=jnp.float32))

    c0 = tap3(odd_m1, even, odd)
    c1 = tap3(even, odd, even_p1)
    return jnp.concatenate([c0, c1], axis=-1)       # [n, 2*Cout]


def _kernel(h2, w2, c1, c2, cout, k, g1, g2, g3, rg, t_total, flat, cf,
            elu, *refs):
    if cf is not None:
        # fused-dec1 mode: the trunk's fused pyramid comes in instead of
        # y1; dec1 (the folded-dropout wide conv) runs IN-KERNEL, so the
        # T*C1 pre-GN1 activations never exist in HBM (168 MB at bench
        # scale) and the executable boundary carries only the pyramid
        (x_hbm, wd1_ref, mask_ref, wu2_ref, wuup_ref, kup_ref,
         sc1_ref, bi1_ref, sc2_ref, bi2_ref, sc3_ref, bi3_ref,
         sel1_ref, sel2_ref, sel3_ref,
         wbig_ref, bbig_ref, gsel_ref, it_ref,
         out_ref, f_scr, y_scr, z2_scr, act_scr, sem) = refs
    else:
        (y1_hbm, wu2_ref, wuup_ref, kup_ref,
         sc1_ref, bi1_ref, sc2_ref, bi2_ref, sc3_ref, bi3_ref,
         sel1_ref, sel2_ref, sel3_ref,
         wbig_ref, bbig_ref, gsel_ref, it_ref,
         out_ref, y_scr, z2_scr, act_scr, sem) = refs
    bi = pl.program_id(0)
    t = pl.program_id(1)
    pc = 4 * cout
    pk = 4 * k
    n = h2 * w2

    @pl.when(t == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    # ---- 1. fetch the sample / run dec1 in-kernel ------------------------
    if cf is not None:
        @pl.when(t == 0)
        def _():
            cp = pltpu.make_async_copy(x_hbm.at[bi], f_scr, sem)
            cp.start()
            cp.wait()
        # mask-fold dec1's kernel for sample t in f32 (bit-identical to
        # head_mc_pre_flat's wmask fold) and cast once
        m = mask_ref[pl.ds(t, 1), :].reshape(cf, 1)        # [cf, 1] f32
        zero_row = jnp.zeros((1, w2, cf), f_scr.dtype)
        for r0 in range(0, h2, rg):
            acc = jnp.zeros((rg * w2, c1), jnp.float32)
            for u in range(3):
                lo = r0 + u - 1
                hi = lo + rg
                if lo < 0:
                    rows = jnp.concatenate([zero_row, f_scr[0:hi]], axis=0)
                elif hi > h2:
                    rows = jnp.concatenate([f_scr[lo:h2], zero_row], axis=0)
                else:
                    rows = f_scr[lo:hi]
                zero_col = jnp.zeros_like(rows[:, :1])
                for v in range(3):
                    if v == 0:
                        win = jnp.concatenate([zero_col, rows[:, :-1]], 1)
                    elif v == 2:
                        win = jnp.concatenate([rows[:, 1:], zero_col], 1)
                    else:
                        win = rows
                    kt = (wd1_ref[u * 3 + v] * m).astype(f_scr.dtype)
                    acc += jnp.dot(win.reshape(rg * w2, cf), kt,
                                   preferred_element_type=jnp.float32)
            y_scr[r0:r0 + rg] = acc.reshape(rg, w2, c1).astype(y_scr.dtype)
    elif flat:      # y1 [B, h, w, T*C1]: sample t = lane block t*C1
        cp = pltpu.make_async_copy(
            y1_hbm.at[bi, :, :, pl.ds(t * c1, c1)], y_scr, sem)
        cp.start()
        cp.wait()
    else:           # y1 [T, B, h, w, C1]
        cp = pltpu.make_async_copy(y1_hbm.at[t, bi], y_scr, sem)
        cp.start()
        cp.wait()

    # ---- 2. GN1 (in-kernel stats) + affine + ReLU -----------------------
    yf = y_scr[:].astype(jnp.float32).reshape(n, c1)
    s1, s2 = _lane_moments(yf)
    a1, b1 = _group_affine(s1, s2, n * (c1 // g1), sel1_ref[:],
                           sc1_ref[0], bi1_ref[0])
    za = jnp.maximum(yf * a1 + b1, 0.0).astype(y_scr.dtype)
    y_scr[:] = za.reshape(h2, w2, c1)

    # ---- 3. dec2 3x3 conv (zero padding), row groups --------------------
    ls1 = jnp.zeros((1, c2), jnp.float32)
    ls2 = jnp.zeros((1, c2), jnp.float32)
    zero_row = jnp.zeros((1, w2, c1), y_scr.dtype)
    for r0 in range(0, h2, rg):
        acc = jnp.zeros((rg * w2, c2), jnp.float32)
        for u in range(3):
            lo = r0 + u - 1
            hi = lo + rg
            if lo < 0:
                rows = jnp.concatenate([zero_row, y_scr[0:hi]], axis=0)
            elif hi > h2:
                rows = jnp.concatenate([y_scr[lo:h2], zero_row], axis=0)
            else:
                rows = y_scr[lo:hi]
            slab = _row_slab(rows, 0, rg, w2, c1, zero_cols=True)
            acc += jnp.dot(slab, wu2_ref[u],
                           preferred_element_type=jnp.float32)
        zbf = acc.astype(z2_scr.dtype)
        z2_scr[r0:r0 + rg] = zbf.reshape(rg, w2, c2)
        zf = zbf.astype(jnp.float32)
        s1c, s2c = _lane_moments(zf)
        ls1 += s1c
        ls2 += s2c

    # ---- 4. GN2 affine --------------------------------------------------
    a2, b2 = _group_affine(ls1, ls2, n * (c2 // g2), sel2_ref[:],
                           sc2_ref[0], bi2_ref[0])

    def gn2(x2d):
        return jnp.maximum(x2d.astype(jnp.float32) * a2 + b2,
                           0.0).astype(z2_scr.dtype)

    # ---- 5. border corrections (1-row/col conv matmuls) -----------------
    kup = kup_ref[:]                                  # [3, 3, C2, Cout]
    zt = gn2(z2_scr[0:1].reshape(w2, c2))             # top row, post-GN2
    zb = gn2(z2_scr[h2 - 1:h2].reshape(w2, c2))
    zl = gn2(z2_scr[:, 0:1].reshape(h2, c2))
    zr = gn2(z2_scr[:, w2 - 1:w2].reshape(h2, c2))
    corr_top = _edge_corr(*_up2(zt),
                          kup[0:1].reshape(3 * c2, cout))    # [w2, 2Cout]
    corr_bot = _edge_corr(*_up2(zb),
                          kup[2:3].reshape(3 * c2, cout))
    kl = kup[:, 0:1].reshape(3 * c2, cout)
    kr = kup[:, 2:3].reshape(3 * c2, cout)
    corr_l = _edge_corr(*_up2(zl), kl)                       # [h2, 2Cout]
    corr_r = _edge_corr(*_up2(zr), kr)
    # corner add-backs (the doubly-subtracted shared tap), into the col
    # corrections at their end rows: lanes (dr, c) with dr = 0 at row 0 /
    # dr = 1 at row h2-1
    k00 = kup[0:1, 0:1].reshape(c2, cout)
    k20 = kup[2:3, 0:1].reshape(c2, cout)
    k02 = kup[0:1, 2:3].reshape(c2, cout)
    k22 = kup[2:3, 2:3].reshape(c2, cout)
    cc00 = jnp.dot(zt[0:1], k00, preferred_element_type=jnp.float32)
    cch0 = jnp.dot(zb[0:1], k20, preferred_element_type=jnp.float32)
    cc0w = jnp.dot(zt[w2 - 1:w2], k02,
                   preferred_element_type=jnp.float32)
    cchw = jnp.dot(zb[w2 - 1:w2], k22,
                   preferred_element_type=jnp.float32)
    rows_h = jax.lax.broadcasted_iota(jnp.int32, (h2, 1), 0)
    corr_l = corr_l + jnp.where(
        rows_h == 0, jnp.concatenate([cc00, jnp.zeros_like(cc00)], -1), 0.0)
    corr_l = corr_l + jnp.where(
        rows_h == h2 - 1,
        jnp.concatenate([jnp.zeros_like(cch0), cch0], -1), 0.0)
    corr_r = corr_r + jnp.where(
        rows_h == 0, jnp.concatenate([cc0w, jnp.zeros_like(cc0w)], -1), 0.0)
    corr_r = corr_r + jnp.where(
        rows_h == h2 - 1,
        jnp.concatenate([jnp.zeros_like(cchw), cchw], -1), 0.0)
    # lane (dr, dc, c) layout: col corrections hit dc=0 / dc=1 lanes
    zc = jnp.zeros((h2, cout), jnp.float32)
    left_full = jnp.concatenate(
        [corr_l[:, :cout], zc, corr_l[:, cout:], zc], axis=-1)   # [h2, PC]
    right_full = jnp.concatenate(
        [zc, corr_r[:, :cout], zc, corr_r[:, cout:]], axis=-1)
    zw = jnp.zeros((w2, 2 * cout), jnp.float32)
    top_full = jnp.concatenate([corr_top, zw], axis=-1)          # [w2, PC]
    bot_full = jnp.concatenate([zw, corr_bot], axis=-1)

    # ---- 6. folded upsample+conv (edge pad) + corrections + GN3 partials
    ls1p = jnp.zeros((1, pc), jnp.float32)
    ls2p = jnp.zeros((1, pc), jnp.float32)
    for r0 in range(0, h2, rg):
        acc = jnp.zeros((rg * w2, pc), jnp.float32)
        for u in range(3):
            lo = r0 + u - 1
            hi = lo + rg
            if lo < 0:
                rows = jnp.concatenate(
                    [z2_scr[0:1], z2_scr[0:hi]], axis=0)
            elif hi > h2:
                rows = jnp.concatenate(
                    [z2_scr[lo:h2], z2_scr[h2 - 1:h2]], axis=0)
            else:
                rows = z2_scr[lo:hi]
            za2 = gn2(rows.reshape(-1, c2)).reshape(rg, w2, c2)
            slab = _row_slab(za2, 0, rg, w2, c2, zero_cols=False)
            acc += jnp.dot(slab, wuup_ref[u],
                           preferred_element_type=jnp.float32)
        y3 = acc.reshape(rg, w2, pc)
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (rg, w2, 1), 0) + r0
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (rg, w2, 1), 1)
        y3 = y3 + jnp.where(rows_i == 0, top_full.reshape(1, w2, pc), 0.0)
        y3 = y3 + jnp.where(rows_i == h2 - 1,
                            bot_full.reshape(1, w2, pc), 0.0)
        y3 = y3 + jnp.where(
            cols_i == 0, left_full[r0:r0 + rg].reshape(rg, 1, pc), 0.0)
        y3 = y3 + jnp.where(
            cols_i == w2 - 1, right_full[r0:r0 + rg].reshape(rg, 1, pc),
            0.0)
        abf = y3.astype(act_scr.dtype)
        act_scr[r0:r0 + rg] = abf
        af = abf.astype(jnp.float32).reshape(rg * w2, pc)
        s1c, s2c = _lane_moments(af)
        ls1p += s1c
        ls2p += s2c

    # ---- 7. GN3 affine (pools phases x channels-in-group) ---------------
    a3, b3 = _group_affine(ls1p, ls2p, n * 4 * (cout // g3), sel3_ref[:],
                           sc3_ref[0], bi3_ref[0])

    # ---- 8. logits -> per-phase softmax/entropy -> accumulate -----------
    gsel = gsel_ref[:].astype(jnp.float32)            # [PK, 4]
    mask = gsel.T[:, None, :]                         # [4, 1, PK]
    for r0 in range(0, h2, rg):
        af = act_scr[r0:r0 + rg].astype(jnp.float32).reshape(rg * w2, pc)
        y4 = jnp.maximum(af * a3 + b3, 0.0)
        lg = jnp.dot(y4.astype(wbig_ref.dtype), wbig_ref[:],
                     preferred_element_type=jnp.float32) + bbig_ref[:]
        if elu:
            # elu_plus_one head epilogue (reference semanticFCN.py:237-246),
            # calibration temperature applied post-activation (nonlinear —
            # cannot fold into wl/bl); order matches models/fpn.py _logits
            lg = (jnp.where(lg > 0, lg, jnp.exp(lg) - 1.0)
                  + 1.0) * it_ref[0, 0]
        m_b = jnp.zeros_like(lg)
        m_q = []
        for q in range(4):
            mq = jnp.max(jnp.where(mask[q] > 0, lg, -jnp.inf), axis=-1,
                         keepdims=True)
            m_q.append(mq)
            m_b = m_b + mq * mask[q]
        e = jnp.exp(lg - m_b)
        s = jnp.dot(e, gsel, preferred_element_type=jnp.float32)  # [R, 4]
        s_b = jnp.dot(s, gsel.T, preferred_element_type=jnp.float32)
        p = e / s_b
        lse = jnp.concatenate(m_q, axis=-1) + jnp.log(s)
        pl_sum = jnp.dot(p * lg, gsel, preferred_element_type=jnp.float32)
        h = lse - pl_sum                                          # [R, 4]
        pad = jnp.zeros((rg * w2, 128 - pk - 4), jnp.float32)
        out_ref[0, r0 * w2:(r0 + rg) * w2] += jnp.concatenate(
            [p, h, pad], axis=-1)


def _pick_rg(h2: int, target: int = 8) -> int:
    """Largest divisor of h2 <= target (8 measured best on v5e at bench
    scale: 5.68 ms vs 5.76 at 4 and 5.84 at 16 — tools/exp_mc_tail.py)."""
    for r in range(min(h2, target), 0, -1):
        if h2 % r == 0:
            return r
    return 1


@functools.partial(jax.jit, static_argnames=("interpret", "row_group",
                                             "n_samples", "elu"))
def mc_megatail(y1, params: dict, wl, bl, interpret: bool = False,
                row_group: int | None = None, n_samples: int | None = None,
                masks=None, elu: bool = False, inv_temp=None):
    """(p_sum [B, h, w, 2, 2, K], h_sum [B, h, w, 2, 2]) summed over T.

    y1: the raw dec1 output (pre-GN1) — either [T, B, h, w, C1], or the
    wide conv's native [B, h, w, T*C1] layout (head_mc_pre_flat) when
    `n_samples` is given (the kernel then DMAs each sample's lane block
    directly, skipping the big transpose). With `masks` [T, C_fused]
    (the already-scaled dropout masks), y1 is instead the TRUNK's fused
    pyramid [B, h, w, C_fused] and dec1 itself runs IN-KERNEL per sample
    with the mask folded into its weights — the T*C1 activations never
    exist in HBM (168 MB at bench scale) and the split-pipeline boundary
    carries only the pyramid. params: the model's variables["params"] FPN
    subtree (dec1_kernel / dec1_gn / dec2 / dec_up). wl [C', K] / bl [K]:
    the 1x1 logits head with class slice (and, for raw-logit heads,
    temperature) already folded in by the caller; `elu=True` applies the
    elu_plus_one head epilogue in-kernel with `inv_temp` post-activation.
    """
    from ..models.layers import gn_groups
    from .upconv import fold_kernel

    fused_dec1 = masks is not None
    flat = n_samples is not None and not fused_dec1
    if fused_dec1:
        t = masks.shape[0]
        b, h2, w2, cf = y1.shape
        c1 = params["dec1_kernel"].shape[-1]
    else:
        cf = None
        if flat:
            t = n_samples
            b, h2, w2, tc1 = y1.shape
            c1 = tc1 // t
        else:
            t, b, h2, w2, c1 = y1.shape
    k2 = params["dec2"]["Conv_0"]["kernel"]
    kup = params["dec_up"]["Conv_0"]["kernel"]
    c2 = k2.shape[-1]
    cout = kup.shape[-1]
    pc = 4 * cout
    k = wl.shape[1]
    pk = 4 * k
    if pk + 4 > 128:
        raise ValueError(f"num_classes {k} too large for the packed "
                         f"accumulator (4*K+4 must be <= 128)")
    g1 = math.gcd(min(32, c1), c1) or 1
    g2 = gn_groups(c2, 32)
    g3 = gn_groups(cout, 8)
    rg = _pick_rg(h2) if row_group is None else row_group
    n = h2 * w2

    def sel(groups, c, per_phase=1):
        lane = jnp.arange(c * per_phase) % c
        return (lane // (c // groups) == jnp.arange(groups)[:, None]
                ).astype(jnp.float32)

    wu2 = k2.reshape(3, 3 * c1, c2).astype(y1.dtype)
    wuup = fold_kernel(kup, 2).reshape(3, 3 * c2, pc).astype(y1.dtype)
    eye = jnp.eye(4, dtype=wl.dtype)
    wbig = jnp.einsum("pq,ck->pcqk", eye, wl).reshape(pc, pk)
    bbig = jnp.tile(bl.reshape(1, k), (1, 4)).reshape(1, pk)
    gsel = jnp.repeat(jnp.eye(4, dtype=jnp.float32), k, axis=0)

    def v1(x):          # [C] -> [1, C] f32
        return x.astype(jnp.float32).reshape(1, -1)

    gnp1, gnp2 = params["dec1_gn"], params["dec2"]["GroupNorm_0"]
    gnp3 = params["dec_up"]["GroupNorm_0"]
    sc3 = jnp.tile(gnp3["scale"].reshape(1, cout), (1, 4))
    bi3 = jnp.tile(gnp3["bias"].reshape(1, cout), (1, 4))

    full = lambda shape: pl.BlockSpec(shape, lambda bi_, ti: (0,) * len(
        shape), memory_space=pltpu.VMEM)

    dec1_specs, dec1_args, dec1_scratch = [], [], []
    if fused_dec1:
        wd1 = params["dec1_kernel"].astype(jnp.float32).reshape(
            9, cf, c1)                       # taps (u, v) major, f32 pre-fold
        dec1_specs = [full((9, cf, c1)), full((t, cf))]
        dec1_args = [wd1, masks.astype(jnp.float32)]
        dec1_scratch = [pltpu.VMEM((h2, w2, cf), y1.dtype)]

    it = jnp.asarray(1.0 if inv_temp is None else inv_temp,
                     jnp.float32).reshape(1, 1)
    out = pl.pallas_call(
        functools.partial(_kernel, h2, w2, c1, c2, cout, k, g1, g2, g3,
                          rg, t, flat, cf, elu),
        grid=(b, t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # y1 / fused
            *dec1_specs,
            full((3, 3 * c1, c2)), full((3, 3 * c2, pc)),
            full((3, 3, c2, cout)),
            full((1, c1)), full((1, c1)), full((1, c2)), full((1, c2)),
            full((1, pc)), full((1, pc)),
            full((g1, c1)), full((g2, c2)), full((g3, pc)),
            full((pc, pk)), full((1, pk)), full((pk, 4)), full((1, 1)),
        ],
        out_specs=[
            pl.BlockSpec((1, n, 128), lambda bi_, ti: (bi_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, n, 128), jnp.float32)],
        scratch_shapes=[
            *dec1_scratch,
            pltpu.VMEM((h2, w2, c1), y1.dtype),
            pltpu.VMEM((h2, w2, c2), y1.dtype),
            pltpu.VMEM((h2, w2, pc), y1.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(y1, *dec1_args, wu2, wuup, kup.astype(y1.dtype),
      v1(gnp1["scale"]), v1(gnp1["bias"]), v1(gnp2["scale"]),
      v1(gnp2["bias"]), v1(sc3[0]).reshape(1, pc),
      v1(bi3[0]).reshape(1, pc),
      sel(g1, c1), sel(g2, c2), sel(g3, cout, per_phase=4),
      wbig.astype(y1.dtype), bbig.astype(jnp.float32), gsel, it)[0]

    p_sum = out[:, :, :pk].reshape(b, h2, w2, 2, 2, k)
    h_sum = out[:, :, pk:pk + 4].reshape(b, h2, w2, 2, 2)
    return p_sum, h_sum
