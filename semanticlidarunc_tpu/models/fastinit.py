"""Materialize random model variables without compiling the init program.

`model.init` traces, lowers, compiles and RUNS the full init computation;
on a 1-core host driving a remote-compile tunnel that costs minutes for
the flagship models (measured: 334 s for the resnet50 FPN in the round-4
bench run). For performance benchmarking the weight VALUES are irrelevant
— only shapes, dtypes and sane activation scales matter — so this builds
the variable tree from `jax.eval_shape` (pure trace, no XLA compile) and
materializes it ON DEVICE in one tiny jitted generator program:

  kernels / embeddings   He-style normal, std = sqrt(2 / fan_in)
  norm scale / BN var    ones
  biases / BN mean       zeros

The on-device generation matters as much as skipping init: a host-side
numpy materialization needs one host->device put per leaf, and through
this environment's RPC tunnel ~600 leaf puts measured 154 s wall (round-5
bench run). One compiled RNG program is milliseconds of device time and a
single dispatch.

The He scaling keeps activations O(1) through deep trunks so benchmarked
programs run on finite values (all-random-O(1) weights explode through 50
conv layers and would benchmark NaN arithmetic instead).

No reference analog (PyTorch modules materialize parameters eagerly at
construction); this is TPU-only benchmarking machinery.
"""
from __future__ import annotations

import itertools

import numpy as np

import jax
import jax.numpy as jnp


def _leaf_name(path) -> str:
    last = path[-1]
    return getattr(last, "key", None) or getattr(last, "name", str(last))


def random_variables(model, inputs, key, train: bool = False):
    """A variables tree matching `model.init(...)` in structure/shape/dtype,
    materialized by one compiled on-device RNG program instead of the full
    init computation (or hundreds of per-leaf host->device puts)."""
    shapes = jax.eval_shape(
        lambda k: model.init({"params": k, "dropout": k}, *inputs,
                             train=train),
        key)

    @jax.jit
    def gen(key):
        counter = itertools.count()  # trace-time leaf counter (traced once)

        def mat(path, sd):
            name = _leaf_name(path)
            if name in ("scale", "var"):
                return jnp.ones(sd.shape, sd.dtype)
            if name in ("bias", "mean"):
                return jnp.zeros(sd.shape, sd.dtype)
            fan_in = int(np.prod(sd.shape[:-1])) or 1
            k = jax.random.fold_in(key, next(counter))
            a = jax.random.normal(k, sd.shape, jnp.float32)
            return (a * np.sqrt(2.0 / fan_in)).astype(sd.dtype)

        return jax.tree_util.tree_map_with_path(mat, shapes)

    return gen(key)
