"""Fused full-scan inference: a raw point cloud never leaves HBM.

The reference pipeline projects on CPU in DataLoader workers, runs the model
on GPU, and post-processes on CPU. Here the WHOLE per-scan path is one jitted
computation (BASELINE.json north star):

  padded points -> spherical projection (deterministic scatter-min)
               -> range/reflectivity/normals (fused convs)
               -> model forward (or vmapped MC-dropout with entropy/MI)
               -> argmax segmentation image
               -> back-projection to per-point labels (gather at each
                  point's pixel — the exact inverse of the projection
                  index map, including for points that lost the
                  nearest-wins race)

Use `make_scan_segmenter` for deterministic single-pass inference and
`make_mc_scan_segmenter` for the 20-sample MC-dropout path with per-pixel
H_norm / MI_norm maps.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from .models import registry
from .ops import normals as nrm
from .ops import projection as proj
from .prob import mc_dropout as mc


def preprocess_scan(points: jnp.ndarray, valid: jnp.ndarray, height: int,
                    width: int, cfg: dict, theta_range=None):
    """(inputs list, flat_pixel_idx) from an (N, >=4) padded xyzi buffer."""
    img = proj.spherical_projection(points[:, :4], valid, height, width,
                                    theta_range=theta_range)
    xyz = img[..., 0:3]
    rng_img = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    refl = img[..., 3:4]
    normals = nrm.build_normal_xyz(xyz)
    inputs = registry.set_model_inputs(rng_img[None], refl[None], xyz[None],
                                       normals[None], cfg)
    flat = proj.projection_indices(points[:, 0:3], valid, height, width,
                                   theta_range)
    return inputs, flat


def back_project(seg_image: jnp.ndarray, flat_idx: jnp.ndarray) -> jnp.ndarray:
    """Per-point labels from an (H, W) segmentation image: gather each
    point's pixel (identity inverse of the projection; occluded points get
    the label of the nearest point in their pixel)."""
    h, w = seg_image.shape
    flat = jnp.clip(flat_idx, 0, h * w - 1)
    return seg_image.reshape(-1)[flat]


def _scan_images(points, valid, height, width, theta_range):
    """Per-scan projected images (unbatched; lax.map'd by batched_inputs)."""
    img = proj.spherical_projection(points[:, :4], valid, height, width,
                                    theta_range=theta_range)
    xyz = img[..., 0:3]
    rng_img = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    refl = img[..., 3:4]
    normals = nrm.build_normal_xyz(xyz)
    flat = proj.projection_indices(points[:, 0:3], valid, height, width,
                                   theta_range)
    return rng_img, refl, xyz, normals, flat


def batched_inputs(points, valid, height, width, theta_range, cfg):
    """[B,N,>=4] padded points -> (model inputs [B,H,W,C], flat idx [B,N]).

    lax.map, NOT vmap: the projection's multi-key sort lowers ~3x worse
    per scan when batched (v5e bs4: 26.1 ms vmapped vs 8.2 sequential —
    tools/bench_serving.py history); the per-scan sorts are large enough
    to saturate the chip on their own, so sequencing them loses nothing.
    """
    r, refl, xyz, normals, flat = jax.lax.map(
        lambda pv: _scan_images(pv[0], pv[1], height, width, theta_range),
        (points, valid))
    return registry.set_model_inputs(r, refl, xyz, normals, cfg), flat


def make_batched_segmenter(model, variables, cfg: dict, height: int,
                           width: int, theta_range=None):
    """jitted: (points [B,N,>=4], valid [B,N]) ->
    (point_labels [B,N], seg [B,H,W])."""

    # `variables` is a jit ARGUMENT in every pipeline below, never a
    # closure: a closed-over param tree is embedded into the lowered module
    # as constants, which costs minutes of trace+lower for the big
    # backbones (~430 MB of module constants for resnet50 on a 1-core
    # host), bloats the persistent compile cache by the same amount, and
    # couples the cache key to unrelated source-line shifts. Passing the
    # tree keeps modules small; the weights stay device-resident either way.
    @jax.jit
    def _run(variables, points, valid):
        inputs, flat = batched_inputs(points, valid, height, width,
                                      theta_range, cfg)
        out = model.apply(variables, *inputs, train=False, stochastic=False)
        if isinstance(out, (list, tuple)):
            out = out[0]
        if cfg["model_settings"].get("loss_function") == "Dirichlet":
            out = out[..., : out.shape[-1] - 1]
        seg = jnp.argmax(out, axis=-1).astype(jnp.int32)
        return jax.vmap(back_project)(seg, flat), seg

    def run(points, valid):
        return _run(variables, points, valid)

    return run


def make_batched_mc_segmenter(model, variables, cfg: dict, height: int,
                              width: int, n_samples: int = 20,
                              theta_range=None,
                              use_pallas_tail: bool | None = None):
    """jit-backed: (points [B,N,>=4], valid [B,N], rng) ->
    (point_labels [B,N], seg, h_norm, mi_norm [B,H,W]).

    On TPU, models supporting the fused Pallas tail run as a SPLIT pipeline
    of two executables — (projection -> trunk -> folded-dropout dec1) and
    (Pallas tail -> argmax -> back-projection) — dispatched back to back
    with no host synchronization in between. The split exists because a
    Mosaic custom call embedded in the large trunk program stalls ~25 ms
    per iteration in this runtime (prob/mc_dropout.mc_pallas_tail_summaries
    docstring); as its own executable the Pallas tail measures 7.0 ms vs
    9.6 ms for the XLA tail (v5e, resnet50, T=20, 64x2048).
    """
    is_dirichlet = cfg["model_settings"].get("loss_function") == "Dirichlet"
    nc = (getattr(model, "num_classes", 0) - 1) if is_dirichlet else None
    temperature = cfg.get("extras", {}).get("temperature")
    if use_pallas_tail is None:
        use_pallas_tail = (jax.default_backend() == "tpu"
                           and mc.can_pallas_tail(model, height, width))

    if not use_pallas_tail:
        @jax.jit
        def _run(variables, points, valid, rng):
            inputs, flat = batched_inputs(points, valid, height, width,
                                          theta_range, cfg)
            p_bar, h_norm, mi_norm = mc.mc_predictive_summaries(
                model, variables, tuple(inputs), rng, n_samples,
                temperature=temperature, class_slice=nc)
            seg = jnp.argmax(p_bar, axis=-1).astype(jnp.int32)
            return jax.vmap(back_project)(seg, flat), seg, h_norm, mi_norm

        def run(points, valid, rng):
            return _run(variables, points, valid, rng)

        return run

    mega = mc.can_megatail(model, height, width, class_slice=nc)

    @jax.jit
    def stage_trunk(variables, points, valid, rng):
        inputs, flat = batched_inputs(points, valid, height, width,
                                      theta_range, cfg)
        fused = model.apply(variables, *inputs, train=False,
                            method=model.features)
        if mega:
            # dec1 runs INSIDE the mega-kernel (fused-dec1 mode): the
            # boundary carries the 33 MB pyramid instead of the 168 MB
            # T*C1 activations — measured 14.2 -> 12.4 ms model-only
            return fused, flat
        return model.apply(variables, fused, rng, n_samples,
                           method=model.head_mc_pre), flat

    @jax.jit
    def stage_tail(variables, y1, flat, rng):
        if mega:
            p_bar, h_norm, mi_norm = mc.mc_megatail_fused_summaries(
                model, variables, y1, rng, n_samples,
                temperature=temperature, class_slice=nc)
        else:
            p_bar, h_norm, mi_norm = mc.mc_pallas_tail_summaries(
                model, variables, y1, n_samples, temperature=temperature,
                class_slice=nc)
        seg = jnp.argmax(p_bar, axis=-1).astype(jnp.int32)
        return jax.vmap(back_project)(seg, flat), seg, h_norm, mi_norm

    def run(points, valid, rng):
        y1, flat = stage_trunk(variables, points, valid, rng)
        return stage_tail(variables, y1, flat, rng)

    return run


def make_scan_segmenter(model, variables, cfg: dict, height: int, width: int,
                        theta_range=None):
    """jitted: (points [N,>=4], valid [N]) -> (point_labels [N], seg [H,W]).

    Implemented AS the batched segmenter at B=1: single-scan and batched
    serving share one traced program, so a scan served alone and the same
    scan served in a batch of one are bit-identical by construction — no
    reliance on XLA rounding two differently-fused compilations the same
    way (tests/test_serve.py)."""
    run_b = make_batched_segmenter(model, variables, cfg, height, width,
                                   theta_range)

    def run(points, valid):
        labels, seg = run_b(points[None], valid[None])
        return labels[0], seg[0]

    return run


def make_mc_scan_segmenter(model, variables, cfg: dict, height: int,
                           width: int, n_samples: int = 20, theta_range=None,
                           use_pallas_tail: bool | None = None):
    """jit-backed callable: (points, valid, rng) ->
    (point_labels, seg [H,W], h_norm [H,W], mi_norm [H,W]).

    B=1 wrapper over `make_batched_mc_segmenter` (same shared-program
    guarantee as `make_scan_segmenter`); the split Pallas pipeline notes
    there apply unchanged."""
    run_b = make_batched_mc_segmenter(model, variables, cfg, height, width,
                                      n_samples, theta_range,
                                      use_pallas_tail)

    def run(points, valid, rng):
        labels, seg, h_norm, mi_norm = run_b(points[None], valid[None], rng)
        return labels[0], seg[0], h_norm[0], mi_norm[0]

    return run


def make_fidnet_pipeline(model, variables, use_fused_aspp: bool | None = None,
                         wt: int = 128):
    """jit-backed callable x [B,H,W,C] -> logits for FIDNet, with the ASPP
    stage as its own fused Pallas executable on TPU.

    The three full-resolution dilated 768->128 convs dominate FIDNet
    (~17.4 of ~30 ms on v5e at 128x2048 bs1; XLA runs them at ~74 TF/s
    regardless of dilation). `ops/pallas_aspp.fused_aspp` runs all 27 tap
    matmuls over one VMEM-resident tile with BN+leaky folded in. Three
    executables dispatched back to back — pre_aspp trunk, the Pallas ASPP,
    the SemanticHead — because a Mosaic custom call inside the big XLA
    program stalls ~25 ms/iteration (ops/pallas_mc_megatail.py header).
    Falls back to the single-jit XLA forward off-TPU or on unsupported
    shapes. Eval-only (training keeps the XLA branch convs).
    """
    from .models.fidnet import FIDNet
    from .ops import pallas_aspp as pa

    if use_fused_aspp is None:
        use_fused_aspp = jax.default_backend() == "tpu"

    if not use_fused_aspp:
        @jax.jit
        def _run(variables, x):
            return model.apply(variables, x, train=False, stochastic=False)

        def run(x):
            return _run(variables, x)
        return run

    folded = pa.fold_fidnet_aspp(variables)

    @jax.jit
    def stage_pre(variables, x):
        return model.apply(variables, x, train=False,
                           method=FIDNet.pre_aspp)

    @jax.jit
    def stage_aspp(folded, res):
        return pa.fused_aspp(res, *folded, wt=wt,
                             interpret=(jax.default_backend() != "tpu"))

    @jax.jit
    def stage_post(variables, res, aspp_out):
        return model.apply(variables, res, aspp_out, train=False,
                           method=FIDNet.post_aspp)

    def run(x):
        res = stage_pre(variables, x)
        if not pa.can_fused_aspp(res.shape):
            return stage_post(variables, res, model.apply(
                variables, res, train=False, method=FIDNet.aspp))
        return stage_post(variables, res, stage_aspp(folded, res))

    return run
