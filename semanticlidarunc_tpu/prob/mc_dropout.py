"""MC-dropout inference as vmapped stochastic forwards.

The reference runs T sequential full forwards with only dropout layers
flipped to train mode (BatchNorm frozen on running stats;
/root/reference/src/utils/mc_dropout.py:13-34, 98-119). The JAX equivalents:

- `mc_forward`: vmap the full stochastic forward over T dropout keys
  (train=False keeps BN on running averages; stochastic=True enables dropout
  only — exactly the reference's dropout_sampling semantics).
- `mc_forward_split`: for models exposing a deterministic `features` trunk and
  stochastic `head` (the FPN family, where the ONLY dropout sits on the fused
  pyramid), run the trunk ONCE and vmap just the head over T keys. Sample
  distribution is identical; compute drops from T full forwards to
  1 trunk + T small heads.

Entropy / mutual-information reductions are fused in the same jit so the
[T, B, H, W, C] sample stack never leaves the device.
"""
from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp


def _constrain(x, sharding):
    """Apply a GSPMD sharding constraint (None = no-op). Used to shard the
    MC SAMPLE axis over the mesh's data axis inside the jitted eval step —
    the third parallelism axis (parallel/mesh.py:shard_mc_summaries), now
    reachable from the product eval path for small-batch MC evaluation."""
    if sharding is None:
        return x
    return jax.lax.with_sharding_constraint(x, sharding)


def _temp(temperature) -> jnp.ndarray:
    """Clamped temperature as a (possibly traced) f32 scalar.

    Accepts a python float OR a traced jnp scalar — the Trainer threads the
    post-hoc calibration temperature through the jitted eval step as a
    traced argument so setting it after the first trace takes effect."""
    return jnp.maximum(jnp.asarray(temperature, jnp.float32), 1e-3)


def mc_forward(apply_fn: Callable, variables: Any, inputs: tuple,
               rng: jax.Array, n_samples: int) -> jnp.ndarray:
    """[T, ..., C] stochastic logits via vmap over dropout keys."""
    keys = jax.random.split(rng, n_samples)

    def one(key):
        return apply_fn(variables, *inputs, train=False, stochastic=True,
                        rngs={"dropout": key})

    return jax.vmap(one)(keys)


def mc_forward_split(features_fn: Callable, head_fn: Callable, variables: Any,
                     inputs: tuple, rng: jax.Array,
                     n_samples: int) -> jnp.ndarray:
    """Trunk-once / head-T-times MC forward for trunk-head models."""
    fused = features_fn(variables, *inputs, train=False)
    keys = jax.random.split(rng, n_samples)

    def one(key):
        return head_fn(variables, fused, stochastic=True,
                       rngs={"dropout": key})

    return jax.vmap(one)(keys)


def mc_split_summaries(features_fn: Callable, head_fn: Callable,
                       variables: Any, inputs: tuple, rng: jax.Array,
                       n_samples: int, temperature: float | None = None,
                       class_slice: int | None = None, eps: float = 1e-12,
                       sample_sharding=None):
    """Trunk-once MC with scan-accumulated summaries: (p_bar, H_norm, MI_norm).

    Mathematically identical to `mc_forward_split` + `mc_summaries`, but the
    [T, ..., C] sample stack is never materialized — each head invocation
    folds into running (sum p, sum H) accumulators inside a lax.scan, saving
    ~GBs of HBM traffic at large T (measured ~7% end-to-end on the bench).
    `class_slice` optionally drops trailing channels (the Dirichlet scale
    head) before the summaries.

    With `sample_sharding` (a NamedSharding over the mesh data axis) the
    scan is replaced by a vmap over the sharded sample axis so each device
    runs T/n_data heads — same per-key dropout streams, identical math.
    """
    fused = features_fn(variables, *inputs, train=False)
    keys = jax.random.split(rng, n_samples)
    if sample_sharding is not None:
        keys = _constrain(keys, sample_sharding)

        def one(key):
            logits = head_fn(variables, fused, rngs={"dropout": key})
            if class_slice is not None:
                logits = logits[..., :class_slice]
            return logits

        logits = _constrain(jax.vmap(one)(keys), sample_sharding)
        return mc_summaries(logits, temperature=temperature, eps=eps)

    def body(carry, key):
        p_sum, h_sum = carry
        logits = head_fn(variables, fused, rngs={"dropout": key})
        if class_slice is not None:
            logits = logits[..., :class_slice]
        if temperature is not None:
            logits = logits / _temp(temperature)
        logp = jax.nn.log_softmax(logits, axis=-1)
        p = jnp.exp(logp)
        h = -jnp.sum(p * logp, axis=-1)
        return (p_sum + p, h_sum + h), None

    probe = jax.eval_shape(
        lambda v, f: head_fn(v, f, rngs={"dropout": keys[0]}),
        variables, fused)
    c = probe.shape[-1] if class_slice is None else class_slice
    shape = probe.shape[:-1]
    init = (jnp.zeros(shape + (c,), jnp.float32),
            jnp.zeros(shape, jnp.float32))
    (p_sum, h_sum), _ = jax.lax.scan(body, init, keys)
    p_bar = p_sum / n_samples
    h_bar = -jnp.sum(jnp.clip(p_bar, eps) * jnp.log(jnp.clip(p_bar, eps)),
                     axis=-1)
    mi = h_bar - h_sum / n_samples
    log_c = math.log(c)
    return p_bar, h_bar / log_c, mi / log_c


def mc_fused_summaries(model, variables: Any, inputs: tuple, rng: jax.Array,
                       n_samples: int, temperature: float | None = None,
                       class_slice: int | None = None, eps: float = 1e-12,
                       use_pallas: bool | None = None,
                       samples_per_step: int = 1,
                       sample_sharding=None):
    """(p_bar, H_norm, MI_norm) via the model's weight-folded MC head.

    For models exposing `head_mc_pre`/`head_post` (the FPN family, any batch
    size): the trunk runs once, all T dropout masks fold into dec1's
    weights so the T samples execute as ONE wide convolution, and the
    memory-bound tail runs per sample inside a scan with running
    (sum p, sum H) accumulators. Same sampling law as the vmapped head
    (masks come from a different RNG stream).

    When the model additionally exposes `head_post_phase` (fused
    upsample+conv in phase layout, models/fpn.py), the whole tail runs at
    1/2 resolution in [B, h, w, 2, 2, C] phase form — no full-resolution
    tensor exists until the single depth_to_space on the final summaries.

    The tail processes `samples_per_step` samples per lax.scan step, folded
    into the batch dimension (GroupNorm statistics are per batch element, so
    per-sample normalization is preserved exactly). Measured on v5e resnet50
    T=20 at 64x2048 the scan-of-1 wins (12.3 ms tail vs 14.5 fully batched):
    per-sample phase-form tensors stay small enough for XLA to fuse the
    normalize/softmax/accumulate chain without spilling.

    `use_pallas=True` routes the post-dec2 math through the fused Pallas
    reduction (ops/pallas_mc_tail.py) — bit-compatible (tests), currently
    opt-in: the kernel itself is fast (1.6 ms for all 20 samples) but
    requires the batched upstream convs, which XLA schedules poorly.
    """
    fused = model.apply(variables, *inputs, train=False,
                        method=model.features)
    y1 = model.apply(variables, fused, rng, n_samples,
                     method=model.head_mc_pre)        # [T, B, H, W, C_dec]
    y1 = _constrain(y1, sample_sharding)
    post = getattr(model, "head_post_phase", None) or model.head_post
    t, b = y1.shape[0], y1.shape[1]

    can_pallas = (hasattr(model, "head_mc_tail_raw")
                  and getattr(model, "head_activation", "none")
                  in ("none", "elu_plus_one")
                  and y1.shape[2] >= 2 and y1.shape[3] >= 2)
    if use_pallas is None:
        # default OFF inside a caller's jit: a Mosaic custom call embedded
        # in a LARGE XLA program (the trunk) stalls ~25 ms/iteration in
        # this runtime regardless of kernel content (tools/exp_mc_tail.py
        # compose2: even a trivial kernel). The Pallas tail wins only when
        # the tail runs as its own executable — inference.py's split
        # pipeline does exactly that (measured 7.0 ms tail vs 9.6 ms XLA).
        use_pallas = False
    if use_pallas and not can_pallas:
        import warnings
        warnings.warn(
            "use_pallas=True requested but the model does not qualify "
            "(needs head_mc_tail_raw and a raw-logit or elu_plus_one "
            "head) — running the XLA tail instead.",
            RuntimeWarning, stacklevel=2)
    if use_pallas and can_pallas:
        return mc_pallas_tail_summaries(model, variables, y1, n_samples,
                                        temperature=temperature,
                                        class_slice=class_slice, eps=eps)

    # sample-sharded: run the tail fully batched over T so the per-sample
    # work partitions across the mesh's data axis instead of serializing
    # in a scan (each device processes T/n_data samples)
    k = t if sample_sharding is not None \
        else _chunk_size(n_samples, samples_per_step)

    def summarize(y_chunk):                     # [k, B, h, w, C_dec]
        logits = model.apply(
            variables, y_chunk.reshape((k * b,) + y_chunk.shape[2:]),
            method=post)
        if class_slice is not None:
            logits = logits[..., :class_slice]
        if temperature is not None:
            logits = logits / _temp(temperature)
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

    return _mc_epilogue(p_sum, h_sum, n_samples, eps)


def can_pallas_tail(model, height: int, width: int) -> bool:
    """True when `mc_pallas_tail_summaries` supports the model at this
    input resolution (the FPN family with raw-logit or elu_plus_one heads;
    the tail runs at half resolution, so the phase grid needs >= 2
    rows/cols). elu_plus_one runs as an in-kernel epilogue after the 1x1
    head (reference semanticFCN.py:237-246 ELU+1), with the calibration
    temperature applied post-activation instead of weight-folded."""
    return (hasattr(model, "head_mc_pre")
            and hasattr(model, "head_mc_tail_raw")
            and getattr(model, "head_activation", "none")
            in ("none", "elu_plus_one")
            and height // 2 >= 2 and width // 2 >= 2)


def can_megatail(model, height: int, width: int,
                 class_slice: int | None = None) -> bool:
    """True when the single-kernel mega-tail supports the model: the
    can_pallas_tail conditions plus the packed p/h accumulator limit
    (4*K + 4 <= 128 lanes)."""
    k = getattr(model, "num_classes", 0)
    if class_slice is not None:
        k = class_slice
    return (can_pallas_tail(model, height, width) and 0 < k
            and 4 * k + 4 <= 128)


def mc_megatail_summaries(model, variables: Any, y1_flat, n_samples: int,
                          temperature=None, class_slice: int | None = None,
                          eps: float = 1e-12):
    """(p_bar, H_norm, MI_norm) from the FLAT pre-GN1 dec1 output
    [B, h, w, T*C1] (model.head_mc_pre_flat) via the single Pallas
    mega-kernel (ops/pallas_mc_megatail.py) — the whole per-sample tail in
    one program, every intermediate resident in VMEM. Same split-jit
    requirement as `mc_pallas_tail_summaries`."""
    from ..ops import pallas_mc_megatail as pmm

    params = variables["params"]
    wl, bl, elu, inv_temp = _head_wl_bl(model, params, temperature,
                                        class_slice)
    p_sum, h_sum = pmm.mc_megatail(
        y1_flat, params, wl, bl, n_samples=n_samples,
        elu=elu, inv_temp=inv_temp,
        interpret=(jax.default_backend() != "tpu"))
    return _mc_epilogue(p_sum, h_sum, n_samples, eps)


def mc_megatail_fused_summaries(model, variables: Any, fused, rng,
                                n_samples: int, temperature=None,
                                class_slice: int | None = None,
                                eps: float = 1e-12):
    """(p_bar, H_norm, MI_norm) straight from the TRUNK's fused pyramid
    [B, h, w, C_fused]: dec1 (the folded-dropout wide conv) runs INSIDE the
    Pallas mega-kernel, so the [B, h, w, T*C1] pre-GN1 activations never
    exist in HBM (168 MB at bench scale — head_mc_pre_flat's output) and
    the split-pipeline boundary shrinks to the 33 MB pyramid. The dropout
    masks are drawn exactly as head_mc_pre_flat draws them (same rng
    consumption), so the sampling law — and, per key, the samples — are
    identical to the XLA fold (tests/test_pallas_megatail.py). Same
    split-jit requirement as `mc_megatail_summaries`."""
    from ..ops import pallas_mc_megatail as pmm

    params = variables["params"]
    wl, bl, elu, inv_temp = _head_wl_bl(model, params, temperature,
                                        class_slice)
    p = model.pyramid_dropout
    keep = jax.random.bernoulli(rng, 1.0 - p, (n_samples, fused.shape[-1]))
    masks = keep.astype(jnp.float32) / (1.0 - p)
    p_sum, h_sum = pmm.mc_megatail(
        fused, params, wl, bl, masks=masks, elu=elu, inv_temp=inv_temp,
        interpret=(jax.default_backend() != "tpu"))
    return _mc_epilogue(p_sum, h_sum, n_samples, eps)


def mc_pallas_tail_summaries(model, variables: Any, y1, n_samples: int,
                             temperature=None, class_slice: int | None = None,
                             eps: float = 1e-12):
    """(p_bar, H_norm, MI_norm) from the pre-GN1 dec1 output y1
    [T, B, h, w, C1] via the fully-Pallas tail.

    Three kernels (ops/pallas_upconv_tail.py, ops/pallas_mc_tail.py): GN1
    affine + dec2 conv in one pass; the folded upsample+conv with additive
    border corrections + GN3 partials in a second; the logits / softmax /
    entropy reduction over T in a third. GroupNorm statistics are the only
    XLA ops between kernels (tiny lane->group folds); the 6-D phase tensor,
    logits, probabilities and entropies never exist in HBM.

    IMPORTANT: call this from its OWN jit (inference.py's split pipeline),
    not from inside a jit that also contains the trunk — a Mosaic custom
    call embedded in a large XLA program stalls ~25 ms/iteration in this
    runtime regardless of kernel content (tools/exp_mc_tail.py compose2).
    """
    from ..models.layers import _groupnorm_affine, gn_groups
    from ..ops import pallas_mc_tail as pmt
    from ..ops import pallas_upconv_tail as put

    t, b = y1.shape[0], y1.shape[1]
    interp = jax.default_backend() != "tpu"
    params = variables["params"]
    y1f = y1.reshape((t * b,) + y1.shape[2:])   # [TB, h, w, C1] pre-GN1
    h, w, c1 = y1f.shape[1:]
    g1 = math.gcd(min(32, c1), c1) or 1         # models/fpn.py dec1_gn
    a1, b1 = _groupnorm_affine(y1f, g1, params["dec1_gn"]["scale"],
                               params["dec1_gn"]["bias"])
    k2 = params["dec2"]["Conv_0"]["kernel"]
    c2 = k2.shape[-1]
    z2raw, ls2 = put.dec2_act_pallas(y1f, k2, a1, b1, interpret=interp)
    z2raw = z2raw.reshape(t * b, h, w, c2)
    gn2 = params["dec2"]["GroupNorm_0"]
    a2, b2 = put.lane_stats_to_affine(
        ls2, h * w, gn_groups(c2, 32), gn2["scale"], gn2["bias"],
        phases=1)

    def gn2row(x):      # post-GN2 boundary slices ([TB, N, C2])
        return jnp.maximum(
            x.astype(jnp.float32) * a2[:, None] + b2[:, None],
            0.0).astype(x.dtype)

    kernel = params["dec_up"]["Conv_0"]["kernel"]
    slabs = put.border_correction_slabs(
        kernel, gn2row(z2raw[:, 0]), gn2row(z2raw[:, -1]),
        gn2row(z2raw[:, :, 0]), gn2row(z2raw[:, :, -1]))
    act, ls3 = put.upconv_act_pallas(z2raw, kernel, *slabs, a=a2, b=b2,
                                     interpret=interp)
    cp = kernel.shape[-1]
    phases = 4
    gnp = params["dec_up"]["GroupNorm_0"]
    ga, gb = put.lane_stats_to_affine(
        ls3, h * w, gn_groups(cp, 8), gnp["scale"], gnp["bias"])
    ga = jnp.tile(ga, (1, phases)).reshape(t, b, phases * cp)
    gb = jnp.tile(gb, (1, phases)).reshape(t, b, phases * cp)
    act = act.reshape(t, b, h * w, phases * cp)
    wl, bl, elu, inv_temp = _head_wl_bl(model, params, temperature,
                                        class_slice)
    p_sum, h_sum = pmt.mc_tail_reduce(act, ga, gb, wl, bl,
                                      elu=elu, inv_temp=inv_temp,
                                      interpret=interp)
    ncls = wl.shape[1]
    p_sum = p_sum.reshape(b, h, w, 2, 2, ncls)
    h_sum = h_sum.reshape(b, h, w, 2, 2)
    return _mc_epilogue(p_sum, h_sum, n_samples, eps)


def _head_wl_bl(model, params, temperature, class_slice):
    """(wl, bl, elu, inv_temp) for the 1x1 logits head, class slice applied.

    For raw-logit heads the calibration temperature folds into the weights
    (softmax(lg/T) == softmax((W/T)x + b/T)). For `elu_plus_one` heads
    (reference semanticFCN.py:237-246) the activation is nonlinear, so the
    temperature must be applied AFTER elu+1 inside the tail instead —
    returned as `inv_temp` for the kernels' epilogue."""
    wl = params["logits_conv"]["kernel"][0, 0]
    bl = params["logits_conv"]["bias"]
    if class_slice is not None:
        wl, bl = wl[:, :class_slice], bl[:class_slice]
    elu = getattr(model, "head_activation", "none") == "elu_plus_one"
    inv_temp = None
    if temperature is not None:
        temp = _temp(temperature)
        if elu:
            inv_temp = (1.0 / temp).astype(jnp.float32)
        else:
            wl, bl = (wl / temp).astype(wl.dtype), bl / temp
    return wl, bl, elu, inv_temp


def _mc_epilogue(p_sum, h_sum, n_samples: int, eps: float):
    """(p_sum, h_sum) -> (p_bar, H_norm, MI_norm), un-phasing if needed."""
    c = p_sum.shape[-1]
    p_bar = p_sum / n_samples
    h_bar = -jnp.sum(jnp.clip(p_bar, eps) * jnp.log(jnp.clip(p_bar, eps)),
                     axis=-1)
    mi = h_bar - h_sum / n_samples
    if p_bar.ndim == 6:                   # phase form [B,h,w,s,s,C]
        from ..ops.upconv import depth_to_space
        p_bar = depth_to_space(p_bar)
        h_bar = depth_to_space(h_bar[..., None])[..., 0]
        mi = depth_to_space(mi[..., None])[..., 0]
    log_c = math.log(c)
    return p_bar, h_bar / log_c, mi / log_c


def _chunk_size(t: int, target: int = 20) -> int:
    """Largest divisor of t that is <= target (bounds peak HBM while keeping
    the batched tail convs wide)."""
    for k in range(min(t, target), 0, -1):
        if t % k == 0:
            return k
    return 1


def mc_predictive_summaries(model, variables: Any, inputs: tuple,
                            rng: jax.Array, n_samples: int,
                            temperature: float | None = None,
                            class_slice: int | None = None,
                            sample_sharding=None):
    """(p_bar, H_norm, MI_norm) through the FASTEST path the model supports.

    This is the single production entry point for MC-dropout summaries —
    the Trainer/Tester eval step, the fused scan segmenter, and bench.py all
    route through it, so the benched path IS the shipped path:

    1. weight-folded fused head (`head_mc_pre`/`head_post`: dec1 executes as
       one wide conv for all T samples) — the FPN family;
    2. trunk-once / scan-over-head (`features`/`head`) — any trunk/head model;
    3. full vmapped stochastic forward — everything else (SalsaNext, CENet,
       FIDNet), still fused with the summary reductions in one jit.

    `sample_sharding` (NamedSharding over a mesh's data axis) shards the
    SAMPLE axis across devices — the right parallelism for small-batch MC
    eval on a mesh, where padding a bs=1 batch over the data axis would
    leave most devices computing masked zeros (reference MC loop:
    /root/reference/src/models/trainer.py:1138-1152)."""
    if hasattr(model, "head_mc_pre") and hasattr(model, "head_post"):
        return mc_fused_summaries(model, variables, inputs, rng, n_samples,
                                  temperature=temperature,
                                  class_slice=class_slice,
                                  sample_sharding=sample_sharding)
    if hasattr(model, "features") and hasattr(model, "head"):
        return mc_split_summaries(
            lambda v, *i, **kw: model.apply(v, *i, method=model.features,
                                            **kw),
            lambda v, f, **kw: model.apply(v, f, method=model.head,
                                           stochastic=True, **kw),
            variables, inputs, rng, n_samples, temperature=temperature,
            class_slice=class_slice, sample_sharding=sample_sharding)
    keys = jax.random.split(rng, n_samples)
    if sample_sharding is not None:
        keys = _constrain(keys, sample_sharding)

    def one(key):
        out = model.apply(variables, *inputs, train=False, stochastic=True,
                          rngs={"dropout": key})
        return out[0] if isinstance(out, (list, tuple)) else out

    logits = _constrain(jax.vmap(one)(keys), sample_sharding)
    if class_slice is not None:
        logits = logits[..., :class_slice]
    return mc_summaries(logits, temperature=temperature)


def mc_probs(mc_logits: jnp.ndarray, temperature: float | None = None,
             eps: float = 1e-12) -> jnp.ndarray:
    """[T, ..., C] logits -> probabilities (reference mc_dropout_probs)."""
    if temperature is not None:
        mc_logits = mc_logits / _temp(temperature)
    return jax.nn.softmax(mc_logits, axis=-1)


def predictive_entropy_mc(probs: jnp.ndarray, eps: float = 1e-12,
                          normalize: bool = True) -> jnp.ndarray:
    """Entropy of the MC-mean predictive (reference mc_dropout.py:121-133)."""
    p_bar = jnp.clip(probs.mean(axis=0), eps)
    ent = -jnp.sum(p_bar * jnp.log(p_bar), axis=-1)
    return ent / math.log(probs.shape[-1]) if normalize else ent


def mc_summaries(mc_logits: jnp.ndarray, temperature: float | None = None,
                 eps: float = 1e-12):
    """Fused MC reductions: (p_bar, H_norm, MI_norm).

    Matches the Trainer's MC eval math (reference trainer.py:1143-1152):
    H_norm = H[p_bar]/log C;  MI_norm = (H[p_bar] - E_T H[p_t])/log C.
    """
    c = mc_logits.shape[-1]
    logp = jax.nn.log_softmax(
        mc_logits if temperature is None else mc_logits / _temp(temperature),
        axis=-1)
    p = jnp.exp(logp)
    p_bar = p.mean(axis=0)
    h_bar = -jnp.sum(jnp.clip(p_bar, eps) * jnp.log(jnp.clip(p_bar, eps)),
                     axis=-1)
    h_each = -jnp.sum(p * logp, axis=-1)
    mi = h_bar - h_each.mean(axis=0)
    log_c = math.log(c)
    return p_bar, h_bar / log_c, mi / log_c
