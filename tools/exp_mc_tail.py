"""Round-3 experiments: where do the MC-tail milliseconds go, and is the
Pallas custom-call stall an environment artifact?

Measures (chained-slope methodology, see bench.py):
  1. trivial-pallas probes: a do-nothing add-1 Pallas kernel chained alone
     vs chained together with the resnet50 trunk in one jit. If the big-jit
     version costs ~trunk + 25 ms, the custom-call stall is a property of
     the tunneled runtime, not of ops/pallas_mc_tail.py.
  2. XLA tail variants from a fixed y1 = head_mc_pre output:
     - samples_per_step k in {1, 2, 4, 5} (current production default k=1)
     - gn-hoist: dec1_gn applied ONCE batched over [T*B] before the scan
     - convs-only (head_mc_tail_raw scan, no pointwise chain)
     - pointwise-only XLA (from a pre-stacked act buffer)
     - pointwise-only Pallas (mc_tail_reduce standalone, reconfirm 1.6 ms)

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_mc_tail.py
Prints one line per experiment (flushed) so a timeout loses nothing.
"""
from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("SLU_JAX_CACHE",
                                 "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

MC_SAMPLES = 20
H, W = 64, 2048
N_POINTS = 1 << 17
N_ITERS = 20


def timed_slope(fn, n_iters=N_ITERS):
    def timed(n):
        t0 = time.perf_counter()
        int(fn(jnp.asarray(n)))
        return time.perf_counter() - t0
    timed(1)
    t1 = min(timed(1) for _ in range(3))
    tn = min(timed(n_iters + 1) for _ in range(3))
    return (tn - t1) / n_iters


def report(name, secs):
    print(f"  {name:>24}: {secs * 1e3:8.3f} ms/scan", flush=True)


def chain(body, init):
    @jax.jit
    def fn(n):
        out = jax.lax.fori_loop(0, n, body, init)
        return jax.tree_util.tree_reduce(
            lambda a, l: a + (l.sum() if l.dtype != jnp.bool_ else 0),
            out, jnp.float32(0)).astype(jnp.int32)
    return fn


# ---- trivial pallas kernel --------------------------------------------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _triv_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


def trivial_pallas(x):
    return pl.pallas_call(
        _triv_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def main():
    from semanticlidarunc_tpu import inference
    from semanticlidarunc_tpu.dataset.synthetic import make_scan
    from semanticlidarunc_tpu.models import registry
    from semanticlidarunc_tpu.ops.projection import pad_points
    from semanticlidarunc_tpu.ops import pallas_mc_tail as pmt
    from semanticlidarunc_tpu.utils import config as cfg_util
    import flax.linen as nn
    import numpy as np

    which = set(sys.argv[1:]) or {"probe", "tailk", "split", "pallas"}

    cfg = cfg_util.with_extras({
        "dataset_name": "SemanticKitti",
        "model_settings": {
            "baseline": "Reichert", "model_type": "resnet50",
            "loss_function": "CE", "attention": True,
            "multi_scale_meta": True, "normals": True, "reflectivity": True,
            "projection": [H, W],
        },
        "train_params": {},
    })
    model = registry.build_model(cfg, dtype=jnp.bfloat16)
    pc = make_scan(seed=0, n_beams=64, n_azimuth=2048)
    pts_np, valid_np = pad_points(pc, N_POINTS)
    points = jnp.asarray(pts_np[:, :4])
    valid = jnp.asarray(valid_np)
    key = jax.random.PRNGKey(0)
    inputs0, _ = inference.preprocess_scan(points, valid, H, W, cfg)
    variables = model.init({"params": key, "dropout": key}, *inputs0,
                           train=False)
    x0, meta0 = inputs0
    fused0 = jax.jit(lambda v, x, m: model.apply(v, x, m, train=False,
                                                 method=model.features)
                     )(variables, x0, meta0)
    y10 = jax.jit(lambda v, f, k: model.apply(v, f, k, MC_SAMPLES,
                                              method=model.head_mc_pre)
                  )(variables, fused0, key)
    print(f"dev={jax.devices()[0].platform} y1={y10.shape} {y10.dtype}",
          flush=True)

    if "probe" in which:
        # trivial pallas alone (small program)
        z0 = jnp.zeros((256, 512), jnp.float32)

        def body_triv(i, z):
            return trivial_pallas(z) * 0.999
        report("triv_pallas_alone", timed_slope(chain(body_triv, z0)))

        # trunk alone
        def body_trunk(i, carry):
            x, meta = carry
            fused = model.apply(variables, x, meta, train=False,
                                method=model.features)
            return (x + fused.sum().astype(x.dtype) * 1e-12, meta)
        report("trunk_alone", timed_slope(chain(body_trunk, (x0, meta0))))

        # trunk + trivial pallas in the same body
        def body_both(i, carry):
            x, meta, z = carry
            fused = model.apply(variables, x, meta, train=False,
                                method=model.features)
            z = trivial_pallas(z + fused[0, 0, 0, 0].astype(jnp.float32))
            return (x + z[0, 0].astype(x.dtype) * 1e-12, meta, z * 0.999)
        report("trunk_plus_triv_pallas",
               timed_slope(chain(body_both, (x0, meta0, z0))))

    # ---- XLA tail variants from fixed y1 ------------------------------------
    from semanticlidarunc_tpu.prob import mc_dropout as mc

    if "tailk" in which:
        for k in (1, 2, 4, 5):
            def body_tail(i, y1, k=k):
                p_bar, h_norm, mi_norm = _tail_from_y1(model, variables, y1,
                                                       k)
                dep = (h_norm.sum() + mi_norm.sum()).astype(y10.dtype)
                return y1 + dep * 1e-12
            report(f"tail_k{k}", timed_slope(chain(body_tail, y10)))

        # gn-hoist: dec1_gn once batched, scan body starts at dec2
        def body_gnh(i, y1):
            t, b = y1.shape[0], y1.shape[1]
            z = model.apply(
                variables, y1.reshape((t * b,) + y1.shape[2:]),
                method=lambda m, y: nn.relu(m.dec1_gn(y)))
            z = z.reshape((t, b) + z.shape[1:])

            def sbody(carry, z_t):
                p_sum, h_sum = carry
                logits = model.apply(variables, z_t,
                                     method=model._head_tail_phase)
                logp = jax.nn.log_softmax(logits, axis=-1)
                p = jnp.exp(logp)
                h = -jnp.sum(p * logp, axis=-1)
                return (p_sum + p, h_sum + h), None
            probe = jax.eval_shape(
                lambda v, zz: model.apply(v, zz[0],
                                          method=model._head_tail_phase),
                variables, z)
            init = (jnp.zeros(probe.shape, jnp.float32),
                    jnp.zeros(probe.shape[:-1], jnp.float32))
            (p_sum, h_sum), _ = jax.lax.scan(sbody, init, z)
            return y1 + (p_sum.sum() + h_sum.sum()).astype(y1.dtype) * 1e-12
        report("tail_gn_hoist", timed_slope(chain(body_gnh, y10)))

    if "split" in which:
        # convs-only: head_mc_tail_raw scan, consuming sums
        def body_convs(i, y1):
            def sbody(carry, y_t):
                raw, a, b = model.apply(variables, y_t,
                                        method=model.head_mc_tail_raw)
                return (carry[0] + raw.sum(), carry[1] + a.sum() + b.sum()), \
                    None
            (s1, s2), _ = jax.lax.scan(
                sbody, (jnp.float32(0), jnp.float32(0)), y1)
            return y1 + (s1 + s2).astype(y1.dtype) * 1e-12
        report("tail_convs_only", timed_slope(chain(body_convs, y10)))

        # pointwise-only (XLA) from a fixed stacked act buffer
        def stack_act(y1):
            def sbody(_, y_t):
                raw_t, a_t, b_t = model.apply(variables, y_t,
                                              method=model.head_mc_tail_raw)
                return None, (raw_t, a_t, b_t)
            _, (raw, ga, gb) = jax.lax.scan(sbody, None, y1)
            t, b = y1.shape[0], y1.shape[1]
            h, w, s, s2, cp = raw.shape[2:]
            act = raw.reshape(t, b, h * w, s * s2 * cp)
            return act, ga.reshape(t, b, cp), gb.reshape(t, b, cp)
        act0, ga0, gb0 = jax.jit(stack_act)(y10)
        wl = variables["params"]["logits_conv"]["kernel"][0, 0]
        bl = variables["params"]["logits_conv"]["bias"]

        def body_pw_xla(i, act):
            p_sum, h_sum = pmt.mc_tail_reduce_reference(
                act, jnp.tile(ga0, (1, 1, 4)), jnp.tile(gb0, (1, 1, 4)), wl,
                bl)
            return act + (p_sum.sum() + h_sum.sum()).astype(act.dtype) * 1e-12
        report("tail_pointwise_xla", timed_slope(chain(body_pw_xla, act0)))

    if "pallas" in which:
        def stack_act(y1):
            def sbody(_, y_t):
                raw_t, a_t, b_t = model.apply(
                    variables, y_t, method=model.head_mc_tail_raw)
                return None, (raw_t, a_t, b_t)
            _, (raw, ga, gb) = jax.lax.scan(sbody, None, y1)
            t, b = y1.shape[0], y1.shape[1]
            h, w, s, s2, cp = raw.shape[2:]
            act = raw.reshape(t, b, h * w, s * s2 * cp)
            return act, ga.reshape(t, b, cp), gb.reshape(t, b, cp)
        act0, ga0, gb0 = jax.jit(stack_act)(y10)
        wl = variables["params"]["logits_conv"]["kernel"][0, 0]
        bl = variables["params"]["logits_conv"]["bias"]
        ga4 = jnp.tile(ga0, (1, 1, 4))
        gb4 = jnp.tile(gb0, (1, 1, 4))

        def body_pw_pls(i, act):
            p_sum, h_sum = pmt.mc_tail_reduce(act, ga4, gb4, wl, bl)
            return act + (p_sum.sum() + h_sum.sum()).astype(act.dtype) * 1e-12
        report("tail_pointwise_pallas",
               timed_slope(chain(body_pw_pls, act0)))

    if "v2" in which:
        # flat-layout XLA tail: everything stays in [R, lanes>=80] 2-D
        # layouts; per-phase softmax via group-selector matmuls (the Pallas
        # kernel's math as plain XLA ops).
        wl = variables["params"]["logits_conv"]["kernel"][0, 0]
        bl = variables["params"]["logits_conv"]["bias"]

        def v2_tail(y1):
            return _flat_tail(model, variables, y1, wl, bl)

        def body_v2(i, y1):
            p_sum, h_sum = v2_tail(y1)
            return y1 + (p_sum.sum() + h_sum.sum()).astype(y1.dtype) * 1e-12
        report("tail_v2_flat", timed_slope(chain(body_v2, y10)))


def _flat_tail(model, variables, y1, wl, bl):
    """Per-sample scan; all tail tensors in flat [B, h, w, P*C] layout."""
    import flax.linen as nn
    from semanticlidarunc_tpu.models.layers import gn_groups
    from semanticlidarunc_tpu.ops import upconv

    t, b = y1.shape[0], y1.shape[1]
    k = wl.shape[1]
    dec_up_kernel = variables["params"]["dec_up"]["Conv_0"]["kernel"]
    gnp = variables["params"]["dec_up"]["GroupNorm_0"]
    cp = dec_up_kernel.shape[-1]                  # 64 for resnet50
    s = 2
    phases = s * s
    g = gn_groups(cp, 8)
    cpg = cp // g
    # block-diagonal logits weights [P*C, P*K]
    eye = jnp.eye(phases, dtype=wl.dtype)
    wbig = jnp.einsum("pq,ck->pcqk", eye, wl).reshape(phases * cp, phases * k)
    bbig = jnp.tile(bl.reshape(1, k), (1, phases)).reshape(phases * k)
    # group-stat selector [P*C, G] and scatter-back [G, P*C]
    lane_group = (jnp.arange(phases * cp) % cp) // cpg
    sel = jax.nn.one_hot(lane_group, g, dtype=jnp.float32)      # [P*C, G]
    gsel = jnp.repeat(jnp.eye(phases, dtype=jnp.float32), k, axis=0)  # PK,P
    lane_ch = jnp.arange(phases * cp) % cp
    gn_scale = gnp["scale"][lane_ch]
    gn_bias = gnp["bias"][lane_ch]
    kf = upconv.fold_kernel(dec_up_kernel, s).reshape(
        3, 3, dec_up_kernel.shape[2], phases * cp)

    def flat_upconv(z):
        """upsample_conv_phase in FLAT [B, h, w, P*C] layout (with the
        zero-pad border fix applied as flat slab concats)."""
        bb, hh, ww, cin = z.shape
        zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        y = jax.lax.conv_general_dilated(
            zp.astype(z.dtype), kf.astype(z.dtype), (1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [B,h,w,P*C]
        strips = upconv.border_strips(z, dec_up_kernel.astype(z.dtype), s)
        if strips is None:
            return y
        row0, rowl, col0, coll = strips

        def slab_i(rr):        # [B, s, ws, C] -> [B, 1, w, P*C]
            return rr.reshape(bb, s, ww, s, cp).transpose(
                0, 2, 1, 3, 4).reshape(bb, 1, ww, phases * cp)

        def slab_j(rr):        # [B, hs, s, C] -> [B, h, 1, P*C]
            return rr.reshape(bb, hh, s, s, cp).reshape(
                bb, hh, 1, phases * cp)

        y = jnp.concatenate([slab_i(row0), y[:, 1:-1], slab_i(rowl)], axis=1)
        return jnp.concatenate([slab_j(col0), y[:, :, 1:-1], slab_j(coll)],
                               axis=2)

    def sbody(carry, y_t):
        p_acc, h_acc = carry
        z = model.apply(variables, y_t,
                        method=lambda m, y: m.dec2(nn.relu(m.dec1_gn(y))))
        y = flat_upconv(z)
        bb, hh, ww, pc = y.shape
        r = hh * ww
        yf = y.reshape(bb, r, pc).astype(jnp.float32)
        # GroupNorm stats via selector matmuls (per sample, per group over
        # pixels x phases x channels-in-group)
        cnt = r * phases * cpg
        ssum = jnp.einsum("brc,cg->bg", yf, sel)
        ssq = jnp.einsum("brc,cg->bg", yf * yf, sel)
        mu = ssum / cnt
        var = ssq / cnt - mu * mu
        a_g = jax.lax.rsqrt(var + 1e-6)                         # [B, G]
        a_l = jnp.einsum("bg,cg->bc", a_g, sel) * gn_scale      # [B, P*C]
        b_l = gn_bias - jnp.einsum("bg,cg->bc", mu * a_g, sel) * gn_scale
        zn = jnp.maximum(yf * a_l[:, None, :] + b_l[:, None, :], 0.0)
        lg = jnp.einsum("brc,cj->brj", zn.astype(model.dtype),
                        wbig.astype(model.dtype),
                        preferred_element_type=jnp.float32) + bbig
        # per-group max via 4 masked reductions (robust to group-max skew)
        mask = gsel.T                                            # [P, P*K]
        m_b = jnp.zeros_like(lg)
        m_q = []
        for q in range(phases):
            mq = jnp.max(jnp.where(mask[q] > 0, lg, -jnp.inf), axis=-1,
                         keepdims=True)
            m_q.append(mq)
            m_b = m_b + mq * mask[q]
        e = jnp.exp(lg - m_b)
        ssum_p = jnp.einsum("brj,jp->brp", e, gsel)              # [B,R,P]
        s_b = jnp.einsum("brp,jp->brj", ssum_p, gsel)
        p = e / s_b
        lse = jnp.concatenate(m_q, axis=-1) + jnp.log(ssum_p)
        pl_sum = jnp.einsum("brj,jp->brp", p * lg, gsel)
        h = lse - pl_sum
        return (p_acc + p, h_acc + h), None

    r_tot = y1.shape[2] * y1.shape[3]
    init = (jnp.zeros((b, r_tot, phases * k), jnp.float32),
            jnp.zeros((b, r_tot, phases), jnp.float32))
    (p_sum, h_sum), _ = jax.lax.scan(sbody, init, y1)
    return p_sum, h_sum


def _tail_from_y1(model, variables, y1, k):
    """mc_fused_summaries' XLA tail, inlined, from a fixed y1."""
    from semanticlidarunc_tpu.prob.mc_dropout import _mc_epilogue
    t, b = y1.shape[0], y1.shape[1]
    post = getattr(model, "head_post_phase", None) or model.head_post

    def summarize(y_chunk):
        logits = model.apply(
            variables, y_chunk.reshape((k * b,) + y_chunk.shape[2:]),
            method=post)
        logp = jax.nn.log_softmax(logits, axis=-1)
        p = jnp.exp(logp)
        h = -jnp.sum(p * logp, axis=-1)
        shape = (k, b) + logits.shape[1:]
        return (p.reshape(shape).sum(0, dtype=jnp.float32),
                h.reshape(shape[:-1]).sum(0, dtype=jnp.float32))

    if k == t:
        p_sum, h_sum = summarize(y1)
    else:
        def body(carry, y_chunk):
            p_sum, h_sum = carry
            dp, dh = summarize(y_chunk)
            return (p_sum + dp, h_sum + dh), None
        probe = jax.eval_shape(summarize, y1[:k])
        init = (jnp.zeros(probe[0].shape, jnp.float32),
                jnp.zeros(probe[1].shape, jnp.float32))
        (p_sum, h_sum), _ = jax.lax.scan(
            body, init, y1.reshape((t // k, k) + y1.shape[1:]))
    return _mc_epilogue(p_sum, h_sum, t, 1e-12)


if __name__ == "__main__":
    main()
