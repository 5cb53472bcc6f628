"""Device-mesh parallelism: data-parallel + spatial (azimuth) sharding.

The reference is strictly single-GPU (SURVEY.md §2.7): its only distributed-
aware line is an optional all_reduce in a metrics helper
(/root/reference/src/utils/agg.py:75-83). The TPU-native replacement is GSPMD
over a `jax.sharding.Mesh`:

- batch data-parallelism: the batch dim is sharded over the "data" axis; XLA
  inserts the gradient/metric psums over ICI automatically once inputs carry
  shardings (the functional analog of DDP + sync_ddp);
- optional spatial parallelism over the image width (azimuth) on the "model"
  axis: convolutions over a width-sharded image compile to halo exchanges,
  the natural scaling axis if range-image resolutions grow (SURVEY.md §5
  long-context note);
- MC-dropout sample parallelism: the T-sample axis can be sharded over
  "data" at inference, since samples are embarrassingly parallel.

No pipeline/tensor/expert parallelism is provided: at this model scale
(<130M params, 64x2048 inputs) there is no dimension that needs it — a
deliberate design decision documented per SURVEY.md §2.7, not an omission.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data: int | None = None,
              model: int = 1) -> Mesh:
    """(data, model) mesh over the first data*model available devices."""
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    n = min(n, len(devs))
    if data is None:
        data = n // model
    if len(devs) < data * model:
        raise ValueError(
            f"mesh (data={data}, model={model}) needs {data * model} devices "
            f"but only {len(devs)} are visible; provision virtual CPU devices "
            f"via jax.config.update('jax_platforms','cpu') + "
            f"jax.config.update('jax_num_cpu_devices', n) before first use")
    devices = np.asarray(devs[:data * model]).reshape(data, model)
    return Mesh(devices, ("data", "model"))


def batch_sharding(mesh: Mesh, spatial: bool = False) -> dict:
    """Shardings for a reader batch dict {range, reflectivity, xyz, normals,
    labels}: batch dim over "data", optionally width over "model"."""
    img = P("data", None, "model" if spatial else None, None)
    lab = P("data", None, "model" if spatial else None)
    return {
        "range": NamedSharding(mesh, img),
        "reflectivity": NamedSharding(mesh, img),
        "xyz": NamedSharding(mesh, img),
        "normals": NamedSharding(mesh, img),
        "labels": NamedSharding(mesh, lab),
    }


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, spatial: bool = False,
                ignore_index: int = 0) -> dict:
    """Place a host batch onto the mesh with DP(+SP) shardings.

    If the batch dim doesn't divide the data axis, pad samples are appended
    with all-`ignore_index` labels and zeroed inputs: all metrics and the
    masked losses skip `labels == ignore_index` pixels, so pad samples
    contribute nothing to ECE/ROC/RC/acc statistics and only to the
    confusion matrix's ignore-GT row, which IoU compute() zeroes per
    reference semantics (repeating real samples instead would double-count
    their pixels in every statistic). The one unmasked loss (the SalsaNext
    NLL quirk, which follows the reference in averaging over all pixels)
    only sees pads on the final ragged train batch — negligible.
    """
    sh = batch_sharding(mesh, spatial)
    d = mesh.shape["data"]
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        rem = (-v.shape[0]) % d
        if rem:
            pad = np.zeros((rem,) + v.shape[1:], v.dtype)
            if k == "labels":
                pad[...] = ignore_index
            v = np.concatenate([v, pad], axis=0)
        out[k] = jax.device_put(v, sh[k])
    return out


def shard_train_step(train_step, mesh: Mesh, spatial: bool = False):
    """Wrap a (state, batch, weights, rng) train step with mesh shardings:
    state/weights/rng replicated, batch DP(+SP)-sharded. XLA inserts all
    gradient all-reduces."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh, spatial)
    return jax.jit(
        train_step,
        in_shardings=(None, bsh, rep, rep),
        out_shardings=None,
        donate_argnums=(0,),
    )


def shard_eval_step(eval_step, mesh: Mesh, spatial: bool = False,
                    batch_replicated: bool = False):
    """Wrap a (params, batch_stats, batch, rng, temperature) eval step with
    mesh shardings: params/stats/rng/temperature replicated, batch
    DP(+SP)-sharded. The returned per-bin statistic arrays are replicated
    (XLA inserts the cross-chip psums for the histogram reductions).

    `batch_replicated=True` replicates the batch instead — used by the
    MC-sample-sharded eval step, where the parallel axis is the T dropout
    samples (constrained inside the step) rather than the batch."""
    rep = replicated(mesh)
    if batch_replicated:
        bsh = {k: rep for k in ("range", "reflectivity", "xyz", "normals",
                                "labels")}
    else:
        bsh = batch_sharding(mesh, spatial)
    return jax.jit(eval_step, in_shardings=(None, None, bsh, rep, rep))


def parse_mesh_spec(spec: str | None) -> tuple[int, int] | None:
    """'auto' -> (n_devices, 1); 'DxM' (e.g. '4x2') -> (D, M); None/'' -> None."""
    if not spec or str(spec).lower() in ("none", "off", "1", "1x1"):
        return None
    s = str(spec).lower()
    if s == "auto":
        return (len(jax.devices()), 1)
    if "x" in s:
        d, m = s.split("x", 1)
        return (int(d), int(m))
    return (int(s), 1)


def psum_tree(tree: Any, axis_name: str = "data"):
    """Explicit metric reduction for use inside shard_map-style code."""
    return jax.tree_util.tree_map(lambda x: jax.lax.psum(x, axis_name), tree)


def shard_mc_summaries(model, mesh: Mesh, variables, inputs: tuple,
                       rng, n_samples: int,
                       temperature: float | None = None,
                       class_slice: int | None = None):
    """(p_bar, H_norm, MI_norm) with the MC SAMPLE axis sharded over "data".

    The third parallelism axis (SURVEY.md §2.7): T dropout samples are
    embarrassingly parallel, so for single-scan latency on a multi-chip mesh
    each device runs the deterministic trunk once (replicated — it is the
    cheap part) plus T/n_data stochastic heads; the p-bar / entropy
    reductions over T lower to psums over ICI. Distinct from `shard_batch`
    data-parallelism, which scales throughput over scans instead.

    Requires n_samples % mesh "data" size == 0. Matches the single-device
    `mc_forward` + `mc_summaries` math exactly (same per-key dropout
    streams); tests/test_parallel.py asserts equality on a virtual mesh.
    """
    from ..prob import mc_dropout as mc

    d = mesh.shape["data"]
    if n_samples % d:
        raise ValueError(f"n_samples={n_samples} must divide over the "
                         f"data axis ({d} devices)")
    keys = jax.random.split(rng, n_samples)
    keys = jax.device_put(
        keys, NamedSharding(mesh, P("data", None)))
    rep = replicated(mesh)
    inputs = tuple(jax.device_put(x, rep) for x in inputs)

    has_split = hasattr(model, "features") and hasattr(model, "head")

    @jax.jit
    def run(variables, inputs, keys):
        if has_split:
            fused = model.apply(variables, *inputs, train=False,
                                method=model.features)

            def one(key):
                return model.apply(variables, fused, stochastic=True,
                                   rngs={"dropout": key}, method=model.head)
        else:
            def one(key):
                out = model.apply(variables, *inputs, train=False,
                                  stochastic=True, rngs={"dropout": key})
                return out[0] if isinstance(out, (list, tuple)) else out

        logits = jax.vmap(one)(keys)          # [T, ...] sharded over T
        if class_slice is not None:
            logits = logits[..., :class_slice]
        return mc.mc_summaries(logits, temperature=temperature)

    return run(variables, inputs, keys)
