"""Pallas TPU kernel: fused MC-dropout tail reduction.

Closes the memory-bound gap at the end of the MC-20 inference path
(reference semantics: src/utils/mc_dropout.py:98-133 + trainer.py:1143-1152
— per-sample softmax probabilities averaged over T, plus mean per-sample
entropy for mutual information). The XLA path materializes, per sample,
full logits / probabilities in HBM and round-trips the f32 accumulators
every scan step. This kernel instead:

  for each spatial tile (grid outer), for each sample t (grid inner):
    y      = relu(act[t, tile] * a[t] + b[t])        # folded GroupNorm
    logits = y_q @ Wl + bl          per phase q       # 1x1 conv
    p      = softmax(logits);  h = entropy(logits)
    p_acc += p;  h_acc += h          # accumulated IN VMEM (out block is
                                     # revisited while the tile index is
                                     # unchanged -> never leaves the chip)

Inputs are the PHASE-FORM dec_up activations (see ops/upconv.py): logits,
probabilities and per-sample entropies never exist in HBM at all. The
sequential TPU grid makes the revision-accumulation pattern exact.

Layouts:
  act:  [T, B, N, P*C]  bf16/f32 — pre-GroupNorm phase conv output,
        N = h*w pixels, P = s*s phases, C = channels per phase.
  a, b: [T, B, P*C] f32 — folded GroupNorm scale/shift (models/layers.py
        `_groupnorm_affine`, tiled over phases).
  wl:   [C, K] f32, bl: [K] f32 — 1x1 logits head (temperature and
        class-slice folded in by the caller).
Outputs:
  p_sum [B, N, P*K] f32, h_sum [B, N, P] f32 (summed over T).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(elu, act_ref, a_ref, b_ref, wbig_ref, bbig_ref, gsel_ref,
            it_ref, p_ref, h_ref):
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        p_ref[:] = jnp.zeros_like(p_ref)
        h_ref[:] = jnp.zeros_like(h_ref)

    x = act_ref[0, 0].astype(jnp.float32)            # [R, P*C]
    y = jnp.maximum(x * a_ref[0, 0] + b_ref[0, 0], 0.0)
    # one block-diagonal matmul for all phases: [R, P*C] @ [P*C, P*K] in
    # the activation dtype (bf16 in production — matches the XLA tail's
    # einsum precision).
    lg = jnp.dot(y.astype(wbig_ref.dtype), wbig_ref[:],
                 preferred_element_type=jnp.float32) + bbig_ref[:]
    if elu:
        # elu_plus_one head epilogue (reference semanticFCN.py:237-246):
        # softmax runs over elu(lg)+1, with the calibration temperature
        # applied post-activation (it cannot fold into wl/bl — elu is
        # nonlinear). Matches models/fpn.py _logits + the XLA tail's
        # temperature division order.
        lg = (jnp.where(lg > 0, lg, jnp.exp(lg) - 1.0) + 1.0) * it_ref[0, 0]
    # per-phase softmax WITHOUT any lane regrouping: a TRUE per-group max
    # (so a group whose max sits far below the row max cannot underflow —
    # extreme calibration temperatures fold a 100-1000x spread into wl/bl),
    # computed with lane-masked full-row reductions: each phase group q gets
    # max(where(mask_q, lg, -inf)) broadcast back through mask_q. The lane
    # layout never changes, so no Mosaic relayouts appear in the body.
    gsel = gsel_ref[:].astype(jnp.float32)           # [P*K, P]
    phases = gsel.shape[1]
    mask = gsel.T[:, None, :]                        # [P, 1, P*K] 0/1
    m_b = jnp.zeros_like(lg)                         # per-lane group max
    m_q = []
    for q in range(phases):
        mq = jnp.max(jnp.where(mask[q] > 0, lg, -jnp.inf), axis=-1,
                     keepdims=True)                  # [R, 1]
        m_q.append(mq)
        m_b = m_b + mq * mask[q]
    e = jnp.exp(lg - m_b)                            # pads -> exactly 0
    s = jnp.dot(e, gsel, preferred_element_type=jnp.float32)   # [R, P]
    s_b = jnp.dot(s, gsel.T, preferred_element_type=jnp.float32)
    p = e / s_b
    lse = jnp.concatenate(m_q, axis=-1) + jnp.log(s)           # [R, P]
    pl_sum = jnp.dot(p * lg, gsel, preferred_element_type=jnp.float32)
    h = lse - pl_sum                                 # [R, P]
    p_ref[0] += p
    h_ref[0] += h


def _pick_rows(n: int, target: int = 2048) -> int:
    for r in range(min(n, target), 0, -1):
        if n % r == 0:
            return r
    return n


@functools.partial(jax.jit, static_argnames=("interpret", "rows", "elu"))
def mc_tail_reduce(act: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                   wl: jnp.ndarray, bl: jnp.ndarray,
                   interpret: bool = False, rows: int | None = None,
                   elu: bool = False, inv_temp=None):
    """(p_sum [B,N,P*K], h_sum [B,N,P]) accumulated over the T axis.

    `elu=True` applies the elu_plus_one head epilogue in-kernel (with the
    calibration temperature as `inv_temp`, applied post-activation)."""
    t, bsz, n, pc = act.shape
    cin, k = wl.shape
    phases = pc // cin
    rows = _pick_rows(n) if rows is None else rows
    grid = (bsz, n // rows, t)
    it = jnp.asarray(1.0 if inv_temp is None else inv_temp,
                     jnp.float32).reshape(1, 1)

    # block-diagonal logits weights: [P*C, P*K], phase q's block = wl;
    # gsel [P*K, P] is the 0/1 per-phase group-sum indicator
    eye = jnp.eye(phases, dtype=wl.dtype)
    wbig = jnp.einsum("pq,ck->pcqk", eye, wl).reshape(phases * cin,
                                                      phases * k)
    bbig = jnp.tile(bl.reshape(1, k), (1, phases)).reshape(1, phases * k)
    gsel = jnp.repeat(jnp.eye(phases, dtype=jnp.float32), k, axis=0)

    p_sum, h_sum = pl.pallas_call(
        functools.partial(_kernel, elu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, rows, pc), lambda bi, i, ti: (ti, bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pc), lambda bi, i, ti: (ti, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pc), lambda bi, i, ti: (ti, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((phases * cin, phases * k),
                         lambda bi, i, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, phases * k), lambda bi, i, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((phases * k, phases), lambda bi, i, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda bi, i, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, phases * k), lambda bi, i, ti: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, phases), lambda bi, i, ti: (bi, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n, phases * k), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n, phases), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(act, a.astype(jnp.float32), b.astype(jnp.float32),
      wbig.astype(act.dtype), bbig.astype(jnp.float32), gsel, it)
    return p_sum, h_sum


def mc_tail_reduce_reference(act, a, b, wl, bl, elu=False, inv_temp=None):
    """Pure-JAX oracle with identical math (tests + non-TPU fallback)."""
    t, bsz, n, pc = act.shape
    cin, k = wl.shape
    phases = pc // cin
    x = act.astype(jnp.float32)
    y = jnp.maximum(x * a[:, :, None, :].astype(jnp.float32)
                    + b[:, :, None, :].astype(jnp.float32), 0.0)
    y = y.reshape(t, bsz, n, phases, cin)
    logits = jnp.einsum("tbnpc,ck->tbnpk", y, wl.astype(jnp.float32)) + bl
    if elu:
        logits = (jax.nn.elu(logits) + 1.0) * (
            1.0 if inv_temp is None else inv_temp)
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    h = -jnp.sum(p * logp, axis=-1)
    return (p.sum(0).reshape(bsz, n, phases * k), h.sum(0))
