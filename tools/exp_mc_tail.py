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
import sys
import time

import jax
import jax.numpy as jnp

from semanticlidarunc_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

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
    # init is passed as a jit ARGUMENT (a closure capture would embed the
    # array as an HLO constant — a >300 MB act buffer then blows the
    # tunneled remote-compile request with HTTP 413)
    @jax.jit
    def fn(n, init):
        out = jax.lax.fori_loop(0, n, body, init)
        return jax.tree_util.tree_reduce(
            lambda a, l: a + (l.sum() if l.dtype != jnp.bool_ else 0),
            out, jnp.float32(0)).astype(jnp.int32)
    return functools.partial(fn, init=init)


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

    if "split2" in which:
        # finer breakdown of the conv tail: which span owns the 9.6 ms?
        from semanticlidarunc_tpu.models.layers import (_groupnorm_affine,
                                                        gn_groups)
        from semanticlidarunc_tpu.ops import upconv

        dec_up_kernel = variables["params"]["dec_up"]["Conv_0"]["kernel"]
        gnp = variables["params"]["dec_up"]["GroupNorm_0"]
        g3 = gn_groups(dec_up_kernel.shape[-1], 8)

        def scan_of(fn, name):
            def body(i, y1):
                def sbody(carry, y_t):
                    return carry + fn(y_t), None
                s1, _ = jax.lax.scan(sbody, jnp.float32(0), y1)
                return y1 + s1.astype(y1.dtype) * 1e-12
            report(name, timed_slope(chain(body, y10)))

        scan_of(lambda y_t: model.apply(
            variables, y_t,
            method=lambda m, y: nn.relu(m.dec1_gn(y)).sum().astype(
                jnp.float32)), "gn1_only")

        scan_of(lambda y_t: model.apply(
            variables, y_t,
            method=lambda m, y: m.dec2(nn.relu(m.dec1_gn(y))).sum().astype(
                jnp.float32)), "gn1_dec2")

        def noborder(y_t):
            def go(m, y):
                z = m.dec2(nn.relu(m.dec1_gn(y)))
                yp = upconv.upsample_conv_phase_noborder(
                    z.astype(m.dtype), dec_up_kernel, 2)
                a, bb = _groupnorm_affine(yp, g3, gnp["scale"], gnp["bias"])
                return (yp.sum() + a.sum() + bb.sum()).astype(jnp.float32)
            return model.apply(variables, y_t, method=go)
        scan_of(noborder, "convs_noborder")

        # sanity: full production convs in this same process
        def body_convs(i, y1):
            def sbody(carry, y_t):
                raw, a, b = model.apply(variables, y_t,
                                        method=model.head_mc_tail_raw)
                return (carry[0] + raw.sum(), carry[1] + a.sum() + b.sum()), \
                    None
            (s1, s2), _ = jax.lax.scan(
                sbody, (jnp.float32(0), jnp.float32(0)), y1)
            return y1 + (s1 + s2).astype(y1.dtype) * 1e-12
        report("convs_full_again", timed_slope(chain(body_convs, y10)))

        # noborder variants: flat output (no 6D reshape), no GN3
        kf = upconv.fold_kernel(dec_up_kernel, 2).reshape(
            3, 3, dec_up_kernel.shape[2], 4 * dec_up_kernel.shape[-1])

        def noborder_flat(y_t):
            def go(m, y):
                z = m.dec2(nn.relu(m.dec1_gn(y)))
                zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)),
                             mode="edge")
                yy = jax.lax.conv_general_dilated(
                    zp, kf.astype(z.dtype), (1, 1), padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return yy.sum().astype(jnp.float32)
            return model.apply(variables, y_t, method=go)
        scan_of(noborder_flat, "convs_noborder_flat")

        # border strips alone, batched over T*B in ONE shot (no scan)
        def body_strips(i, y1):
            t, b = y1.shape[0], y1.shape[1]
            z = model.apply(
                variables, y1.reshape((t * b,) + y1.shape[2:]),
                method=lambda m, y: m.dec2(nn.relu(m.dec1_gn(y))))
            strips = upconv.border_strips(
                z, dec_up_kernel.astype(z.dtype), 2)
            s = sum(r.sum() for r in strips).astype(jnp.float32)
            return y1 + s.astype(y1.dtype) * 1e-12
        report("gn1_dec2_plus_strips_batched",
               timed_slope(chain(body_strips, y10)))

    if "v3" in which:
        # the fully-Pallas tail now wired into mc_fused_summaries
        def body_v3(i, y1):
            p_bar, h_norm, mi = _pallas_tail_from_y1(model, variables, y1)
            dep = (h_norm.sum() + mi.sum()).astype(y1.dtype)
            return y1 + dep * 1e-12
        report("tail_v3_pallas", timed_slope(chain(body_v3, y10)))

        def body_tail1(i, y1):
            p_bar, h_norm, mi_norm = _tail_from_y1(model, variables, y1, 1)
            dep = (h_norm.sum() + mi_norm.sum()).astype(y10.dtype)
            return y1 + dep * 1e-12
        report("tail_k1_again", timed_slope(chain(body_tail1, y10)))

    if "v3split" in which:
        from semanticlidarunc_tpu.models.layers import gn_groups
        from semanticlidarunc_tpu.ops import pallas_mc_tail as pmt
        from semanticlidarunc_tpu.ops import pallas_upconv_tail as put

        t, b = y10.shape[0], y10.shape[1]

        def mkz(y1):
            return model.apply(
                variables, y1.reshape((t * b,) + y1.shape[2:]),
                method=lambda m, y: m.dec2(jax.nn.relu(m.dec1_gn(y))))

        def mkz_scan(y1):
            def sb(_, y_t):
                return None, model.apply(
                    variables, y_t,
                    method=lambda m, y: m.dec2(jax.nn.relu(m.dec1_gn(y))))
            _, z = jax.lax.scan(sb, None, y1)
            return z.reshape((t * b,) + z.shape[2:])

        def body_z(i, y1):
            return y1 + mkz(y1).sum().astype(y1.dtype) * 1e-12
        report("v3_z_batched", timed_slope(chain(body_z, y10)))

        def body_zs(i, y1):
            return y1 + mkz_scan(y1).sum().astype(y1.dtype) * 1e-12
        report("v3_z_scanned", timed_slope(chain(body_zs, y10)))

        kernel = variables["params"]["dec_up"]["Conv_0"]["kernel"]
        gnp = variables["params"]["dec_up"]["GroupNorm_0"]
        z0 = jax.jit(mkz)(y10)

        def mkslabs(z):
            return put.border_correction_slabs(
                kernel, z[:, 0], z[:, -1], z[:, :, 0], z[:, :, -1])

        def body_slabs(i, z):
            slabs = mkslabs(z)
            s = sum(r.sum() for r in slabs).astype(jnp.float32)
            return z + s.astype(z.dtype) * 1e-12
        report("v3_slabs_only", timed_slope(chain(body_slabs, z0)))

        slabs0 = jax.jit(mkslabs)(z0)

        for rr in (4, 8, 16, 32):
            def body_kb(i, z, rr=rr):
                act, st = put.upconv_act_pallas(z, kernel, *slabs0, rows=rr)
                return z + (act.sum(dtype=jnp.float32)
                            + st.sum()).astype(z.dtype) * 1e-12
            try:
                report(f"v3_kernelB_r{rr}", timed_slope(chain(body_kb, z0)))
            except Exception as e:
                print(f"  v3_kernelB_r{rr}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

        act0, st0 = jax.jit(
            lambda z: put.upconv_act_pallas(z, kernel, *slabs0))(z0)
        cp = kernel.shape[-1]
        h, w = z0.shape[1], z0.shape[2]
        g3 = gn_groups(cp, 8)
        ga0, gb0 = put.lane_stats_to_affine(
            st0, h * w, g3, gnp["scale"], gnp["bias"])
        ga0 = jnp.tile(ga0, (1, 4)).reshape(t, b, 4 * cp)
        gb0 = jnp.tile(gb0, (1, 4)).reshape(t, b, 4 * cp)
        wl = variables["params"]["logits_conv"]["kernel"][0, 0]
        bl = variables["params"]["logits_conv"]["bias"]
        act0r = act0.reshape(t, b, h * w, 4 * cp)

        # kernel A (dec2 stage) on the real y1
        from semanticlidarunc_tpu.models.layers import _groupnorm_affine
        import math as _math
        params = variables["params"]
        y1f0 = y10.reshape((y10.shape[0] * y10.shape[1],) + y10.shape[2:])
        c1 = y1f0.shape[-1]
        g1 = _math.gcd(min(32, c1), c1) or 1
        a10, b10 = jax.jit(lambda y: _groupnorm_affine(
            y, g1, params["dec1_gn"]["scale"], params["dec1_gn"]["bias"])
        )(y1f0)
        k2 = params["dec2"]["Conv_0"]["kernel"]

        def body_ka(i, y1f):
            z2, ls = put.dec2_act_pallas(y1f, k2, a10, b10)
            return y1f + (z2.sum(dtype=jnp.float32)
                          + ls.sum()).astype(y1f.dtype) * 1e-12
        report("v3_kernelA", timed_slope(chain(body_ka, y1f0)))

        def body_gn1stats(i, y1f):
            aa, bb = _groupnorm_affine(
                y1f, g1, params["dec1_gn"]["scale"],
                params["dec1_gn"]["bias"])
            return y1f + (aa.sum() + bb.sum()).astype(y1f.dtype) * 1e-12
        report("v3_gn1stats", timed_slope(chain(body_gn1stats, y1f0)))

        # kernel B without border corrections (isolate the where-add cost)
        from semanticlidarunc_tpu.ops.upconv import fold_kernel as _fk
        wu_up = _fk(kernel, 2).reshape(3, 3 * z0.shape[-1], 256).astype(
            z0.dtype)
        ones_a = jnp.ones((z0.shape[0], z0.shape[-1]), jnp.float32)
        zeros_b = jnp.zeros_like(ones_a)

        def body_kbn(i, z):
            act, st = put._conv_stage_call(
                z, wu_up, ones_a, zeros_b, None, 256, zero_pad=False,
                interpret=False, rows=4)
            return z + (act.sum(dtype=jnp.float32)
                        + st.sum()).astype(z.dtype) * 1e-12
        report("v3_kernelB_noborder", timed_slope(chain(body_kbn, z0)))

        for rr in (1024, 2048, 4096, 8192):
            def body_kc(i, act, rr=rr):
                p_sum, h_sum = pmt.mc_tail_reduce(act, ga0, gb0, wl, bl,
                                                  rows=rr)
                return act + (p_sum.sum()
                              + h_sum.sum()).astype(act.dtype) * 1e-12
            try:
                report(f"v3_kernelC_r{rr}", timed_slope(chain(body_kc,
                                                              act0r)))
            except Exception as e:
                print(f"  v3_kernelC_r{rr}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)

    if "compose" in which:
        # bisect the full-composition stall: trunk+dec1 feeding the tail
        def body_full_pallas(i, carry):
            xx, acc = carry
            p_bar, h_norm, mi_norm = mc.mc_predictive_summaries(
                model, variables, (xx, meta0), jax.random.fold_in(key, i),
                MC_SAMPLES)
            dep = (h_norm.sum() + mi_norm.sum()) * 1e-12
            return xx + dep.astype(xx.dtype), acc + p_bar.sum()
        report("compose_model_pallas",
               timed_slope(chain(body_full_pallas, (x0, jnp.float32(0)))))

        def body_full_xla(i, carry):
            xx, acc = carry
            p_bar, h_norm, mi_norm = mc.mc_fused_summaries(
                model, variables, (xx, meta0), jax.random.fold_in(key, i),
                MC_SAMPLES, use_pallas=False)
            dep = (h_norm.sum() + mi_norm.sum()) * 1e-12
            return xx + dep.astype(xx.dtype), acc + p_bar.sum()
        report("compose_model_xla",
               timed_slope(chain(body_full_xla, (x0, jnp.float32(0)))))

        def body_pre_only(i, carry):
            xx, acc = carry
            fused = model.apply(variables, xx, meta0, train=False,
                                method=model.features)
            y1 = model.apply(variables, fused, jax.random.fold_in(key, i),
                             MC_SAMPLES, method=model.head_mc_pre)
            dep = y1.sum(dtype=jnp.float32) * 1e-12
            return xx + dep.astype(xx.dtype), acc + dep
        report("compose_trunk_dec1_only",
               timed_slope(chain(body_pre_only, (x0, jnp.float32(0)))))

        def body_barrier(i, carry):
            xx, acc = carry
            fused = model.apply(variables, xx, meta0, train=False,
                                method=model.features)
            y1 = model.apply(variables, fused, jax.random.fold_in(key, i),
                             MC_SAMPLES, method=model.head_mc_pre)
            y1 = jax.lax.optimization_barrier(y1)
            p_bar, h_norm, mi = _pallas_tail_from_y1(model, variables, y1)
            dep = (h_norm.sum() + mi.sum()) * 1e-12
            return xx + dep.astype(xx.dtype), acc + p_bar.sum()
        report("compose_pallas_barrier",
               timed_slope(chain(body_barrier, (x0, jnp.float32(0)))))

    if "rows" in which:
        # per-kernel row-chunk sweep with the raised VMEM limit, plus a
        # pipeline variant that keeps dec2 in XLA (drops kernel A)
        from semanticlidarunc_tpu.models.layers import (_groupnorm_affine,
                                                        gn_groups)
        from semanticlidarunc_tpu.ops import pallas_upconv_tail as put
        import math as _math

        params = variables["params"]
        t, b = y10.shape[0], y10.shape[1]
        y1f0 = y10.reshape((t * b,) + y10.shape[2:])
        c1 = y1f0.shape[-1]
        g1 = _math.gcd(min(32, c1), c1) or 1
        a10, b10 = jax.jit(lambda y: _groupnorm_affine(
            y, g1, params["dec1_gn"]["scale"], params["dec1_gn"]["bias"])
        )(y1f0)
        k2 = params["dec2"]["Conv_0"]["kernel"]
        kernel = params["dec_up"]["Conv_0"]["kernel"]

        for rr in (4, 8, 16):
            def body_ka(i, y1f, rr=rr):
                z2, ls = put.dec2_act_pallas(y1f, k2, a10, b10, rows=rr)
                return y1f + (z2.sum(dtype=jnp.float32)
                              + ls.sum()).astype(y1f.dtype) * 1e-12
            try:
                report(f"rows_kernelA_r{rr}",
                       timed_slope(chain(body_ka, y1f0)))
            except Exception as e:
                print(f"  rows_kernelA_r{rr}: FAILED {str(e)[:90]}",
                      flush=True)

        def mkz(y1):
            return model.apply(
                variables, y1.reshape((t * b,) + y1.shape[2:]),
                method=lambda m, y: m.dec2(jax.nn.relu(m.dec1_gn(y))))
        z0 = jax.jit(mkz)(y10)

        def mkslabs(z):
            return put.border_correction_slabs(
                kernel, z[:, 0], z[:, -1], z[:, :, 0], z[:, :, -1])
        slabs0 = jax.jit(mkslabs)(z0)

        for rr in (4, 8, 16):
            def body_kb(i, z, rr=rr):
                act, st = put.upconv_act_pallas(z, kernel, *slabs0, rows=rr)
                return z + (act.sum(dtype=jnp.float32)
                            + st.sum()).astype(z.dtype) * 1e-12
            try:
                report(f"rows_kernelB_r{rr}", timed_slope(chain(body_kb,
                                                                z0)))
            except Exception as e:
                print(f"  rows_kernelB_r{rr}: FAILED {str(e)[:90]}",
                      flush=True)

        # full tail WITHOUT kernel A: XLA gn1+dec2 -> B (no affine) -> C
        gnp = params["dec_up"]["GroupNorm_0"]
        wl = params["logits_conv"]["kernel"][0, 0]
        bl = params["logits_conv"]["bias"]
        from semanticlidarunc_tpu.prob.mc_dropout import _mc_epilogue

        def body_noA(i, y1):
            z = mkz(y1)
            slabs = mkslabs(z)
            act, ls3 = put.upconv_act_pallas(z, kernel, *slabs)
            cp = kernel.shape[-1]
            h, w = z.shape[1], z.shape[2]
            ga, gb = put.lane_stats_to_affine(
                ls3, h * w, gn_groups(cp, 8), gnp["scale"], gnp["bias"])
            ga = jnp.tile(ga, (1, 4)).reshape(t, b, 4 * cp)
            gb = jnp.tile(gb, (1, 4)).reshape(t, b, 4 * cp)
            actr = act.reshape(t, b, h * w, 4 * cp)
            p_sum, h_sum = pmt.mc_tail_reduce(actr, ga, gb, wl, bl)
            p_sum = p_sum.reshape(b, h, w, 2, 2, wl.shape[1])
            h_sum = h_sum.reshape(b, h, w, 2, 2)
            p_bar, h_n, mi = _mc_epilogue(p_sum, h_sum, t, 1e-12)
            dep = (h_n.sum() + mi.sum()).astype(y1.dtype)
            return y1 + dep * 1e-12
        report("rows_tail_noA", timed_slope(chain(body_noA, y10)))

        def body_v3(i, y1):
            p_bar, h_norm, mi = _pallas_tail_from_y1(model, variables, y1)
            dep = (h_norm.sum() + mi.sum()).astype(y1.dtype)
            return y1 + dep * 1e-12
        report("rows_tail_withA", timed_slope(chain(body_v3, y10)))

    if "mega" in which:
        from semanticlidarunc_tpu.ops import pallas_mc_megatail as pmm
        from semanticlidarunc_tpu.prob.mc_dropout import _mc_epilogue
        params = variables["params"]
        wl = params["logits_conv"]["kernel"][0, 0]
        bl = params["logits_conv"]["bias"]

        for rgx in (4, 8, 16):
            def body_mega(i, y1, rgx=rgx):
                p_sum, h_sum = pmm.mc_megatail(y1, params, wl, bl,
                                               row_group=rgx)
                p_bar, h_n, mi = _mc_epilogue(p_sum, h_sum, y1.shape[0],
                                              1e-12)
                dep = (h_n.sum() + mi.sum()).astype(y1.dtype)
                return y1 + dep * 1e-12
            try:
                report(f"mega_tail_rg{rgx}",
                       timed_slope(chain(body_mega, y10)))
            except Exception as e:
                print(f"  mega_tail_rg{rgx}: FAILED {str(e)[:90]}",
                      flush=True)

        def body_v3(i, y1):
            p_bar, h_norm, mi = _pallas_tail_from_y1(model, variables, y1)
            dep = (h_norm.sum() + mi.sum()).astype(y1.dtype)
            return y1 + dep * 1e-12
        report("tail_3kernel", timed_slope(chain(body_v3, y10)))

    if "compose2" in which:
        # which kernel feature causes the in-composition stall?
        from semanticlidarunc_tpu.ops import pallas_upconv_tail as put
        from semanticlidarunc_tpu.models.layers import _groupnorm_affine
        import math as _math

        def trunk_y1(xx, i):
            fused = model.apply(variables, xx, meta0, train=False,
                                method=model.features)
            return model.apply(variables, fused, jax.random.fold_in(key, i),
                               MC_SAMPLES, method=model.head_mc_pre)

        # (a) gridded trivial pallas (block specs, no ANY/DMA) on y1
        def _grid_triv_kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 1.0001

        def grid_triv(y1):
            blk = (1, 1, 4) + y1.shape[3:]
            return pl.pallas_call(
                _grid_triv_kernel,
                grid=(y1.shape[0], y1.shape[2] // 4),
                in_specs=[pl.BlockSpec(
                    blk, lambda t, rr: (t, 0, rr, 0, 0),
                    memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(
                    blk, lambda t, rr: (t, 0, rr, 0, 0),
                    memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(y1.shape, y1.dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(y1)

        def body_gt(i, carry):
            xx, acc = carry
            y1 = trunk_y1(xx, i)
            out = grid_triv(y1)
            dep = out.sum(dtype=jnp.float32) * 1e-12
            return xx + dep.astype(xx.dtype), acc + dep
        report("compose2_grid_trivial",
               timed_slope(chain(body_gt, (x0, jnp.float32(0)))))

        # (a2) gridded trivial on a SMALL input
        def grid_triv_small(z):
            return pl.pallas_call(
                _grid_triv_kernel,
                grid=(z.shape[0],),
                in_specs=[pl.BlockSpec((1, 256, 512), lambda t: (t, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 256, 512), lambda t: (t, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(z.shape, z.dtype),
            )(z)

        def body_gts(i, carry):
            xx, acc = carry
            y1 = trunk_y1(xx, i)
            small = y1[:, 0, :16, :64, :].reshape(20, 256, 512).astype(
                jnp.float32)
            out = grid_triv_small(small)
            dep = out.sum() * 1e-12 + y1.sum(dtype=jnp.float32) * 1e-12
            return xx + dep.astype(xx.dtype), acc + dep
        report("compose2_grid_small",
               timed_slope(chain(body_gts, (x0, jnp.float32(0)))))

        # (a3) UNgridded trivial on a small input (round-2 no-stall repro)
        def body_ungrid(i, carry):
            xx, acc = carry
            y1 = trunk_y1(xx, i)
            small = y1[0, 0, :8, :256, :].reshape(256, 1024).astype(
                jnp.float32)
            out = trivial_pallas(small)
            dep = out.sum() * 1e-12 + y1.sum(dtype=jnp.float32) * 1e-12
            return xx + dep.astype(xx.dtype), acc + dep
        report("compose2_ungrid_small",
               timed_slope(chain(body_ungrid, (x0, jnp.float32(0)))))

        # (b) kernel A only (manual DMA from ANY + revisited stats out)
        params = variables["params"]
        k2 = params["dec2"]["Conv_0"]["kernel"]

        def body_ka(i, carry):
            xx, acc = carry
            y1 = trunk_y1(xx, i)
            y1f = y1.reshape((y1.shape[0] * y1.shape[1],) + y1.shape[2:])
            c1 = y1f.shape[-1]
            g1 = _math.gcd(min(32, c1), c1) or 1
            a1, b1 = _groupnorm_affine(
                y1f, g1, params["dec1_gn"]["scale"],
                params["dec1_gn"]["bias"])
            z2, ls = put.dec2_act_pallas(y1f, k2, a1, b1)
            dep = (z2.sum(dtype=jnp.float32) + ls.sum()) * 1e-12
            return xx + dep.astype(xx.dtype), acc + dep
        report("compose2_kernelA_only",
               timed_slope(chain(body_ka, (x0, jnp.float32(0)))))

        # (c) kernel C only, fed by a cheap reshape of y1 (no ANY, no DMA;
        # revisited accumulator out)
        wl = params["logits_conv"]["kernel"][0, 0]
        bl = params["logits_conv"]["bias"]

        def body_kc(i, carry):
            xx, acc = carry
            y1 = trunk_y1(xx, i)
            t_, b_ = y1.shape[0], y1.shape[1]
            n_ = y1.shape[2] * y1.shape[3] // 2
            act = y1.reshape(t_, b_, n_, 256)
            ga = jnp.ones((t_, b_, 256), jnp.float32)
            gb = jnp.zeros((t_, b_, 256), jnp.float32)
            p_sum, h_sum = pmt.mc_tail_reduce(act, ga, gb, wl, bl)
            dep = (p_sum.sum() + h_sum.sum()) * 1e-12
            return xx + dep.astype(xx.dtype), acc + dep
        report("compose2_kernelC_only",
               timed_slope(chain(body_kc, (x0, jnp.float32(0)))))

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


def _pallas_tail_from_y1(model, variables, y1):
    """mc_fused_summaries' fully-Pallas tail (A->B->C), from a fixed y1."""
    import math as _math

    import jax.numpy as jnp
    from semanticlidarunc_tpu.models.layers import (_groupnorm_affine,
                                                    gn_groups)
    from semanticlidarunc_tpu.ops import pallas_mc_tail as pmt
    from semanticlidarunc_tpu.ops import pallas_upconv_tail as put
    from semanticlidarunc_tpu.prob.mc_dropout import _mc_epilogue

    t, b = y1.shape[0], y1.shape[1]
    params = variables["params"]
    y1f = y1.reshape((t * b,) + y1.shape[2:])
    h, w, c1 = y1f.shape[1:]
    g1 = _math.gcd(min(32, c1), c1) or 1
    a1, b1 = _groupnorm_affine(y1f, g1, params["dec1_gn"]["scale"],
                               params["dec1_gn"]["bias"])
    k2 = params["dec2"]["Conv_0"]["kernel"]
    c2 = k2.shape[-1]
    z2raw, ls2 = put.dec2_act_pallas(y1f, k2, a1, b1)
    z2raw = z2raw.reshape(t * b, h, w, c2)
    gn2 = params["dec2"]["GroupNorm_0"]
    a2, b2 = put.lane_stats_to_affine(
        ls2, h * w, gn_groups(c2, 32), gn2["scale"], gn2["bias"], phases=1)

    def gn2row(x):
        return jnp.maximum(
            x.astype(jnp.float32) * a2[:, None] + b2[:, None],
            0.0).astype(x.dtype)

    kernel = params["dec_up"]["Conv_0"]["kernel"]
    slabs = put.border_correction_slabs(
        kernel, gn2row(z2raw[:, 0]), gn2row(z2raw[:, -1]),
        gn2row(z2raw[:, :, 0]), gn2row(z2raw[:, :, -1]))
    act, ls3 = put.upconv_act_pallas(z2raw, kernel, *slabs, a=a2, b=b2)
    cp = kernel.shape[-1]
    gnp = params["dec_up"]["GroupNorm_0"]
    ga, gb = put.lane_stats_to_affine(
        ls3, h * w, gn_groups(cp, 8), gnp["scale"], gnp["bias"])
    ga = jnp.tile(ga, (1, 4)).reshape(t, b, 4 * cp)
    gb = jnp.tile(gb, (1, 4)).reshape(t, b, 4 * cp)
    act = act.reshape(t, b, h * w, 4 * cp)
    wl = params["logits_conv"]["kernel"][0, 0]
    bl = params["logits_conv"]["bias"]
    p_sum, h_sum = pmt.mc_tail_reduce(act, ga, gb, wl, bl)
    ncls = wl.shape[1]
    p_sum = p_sum.reshape(b, h, w, 2, 2, ncls)
    h_sum = h_sum.reshape(b, h, w, 2, 2)
    return _mc_epilogue(p_sum, h_sum, t, 1e-12)


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
