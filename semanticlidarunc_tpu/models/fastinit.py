"""Materialize random model variables without compiling the init program.

`model.init` traces, lowers, compiles and RUNS the full init computation;
on a 1-core host driving a remote-compile tunnel that costs minutes for
the flagship models (measured: 334 s for the resnet50 FPN in the round-4
bench run). For performance benchmarking the weight VALUES are irrelevant
— only shapes, dtypes and sane activation scales matter — so this builds
the variable tree directly from `jax.eval_shape` (pure trace, no XLA
compile, no device execution):

  kernels / embeddings   He-style normal, std = sqrt(2 / fan_in)
  norm scale / BN var    ones
  biases / BN mean       zeros

The He scaling keeps activations O(1) through deep trunks so benchmarked
programs run on finite values (all-random-O(1) weights explode through 50
conv layers and would benchmark NaN arithmetic instead).

No reference analog (PyTorch modules materialize parameters eagerly at
construction); this is TPU-only benchmarking machinery.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _leaf_name(path) -> str:
    last = path[-1]
    return getattr(last, "key", None) or getattr(last, "name", str(last))


def random_variables(model, inputs, key, train: bool = False):
    """A variables tree matching `model.init(...)` in structure/shape/dtype,
    materialized host-side in milliseconds instead of a compiled init run."""
    shapes = jax.eval_shape(
        lambda k: model.init({"params": k, "dropout": k}, *inputs,
                             train=train),
        key)
    rng = np.random.default_rng(np.asarray(
        jax.random.key_data(key)).ravel()[-1])

    def mat(path, sd):
        name = _leaf_name(path)
        if name in ("scale", "var"):
            a = np.ones(sd.shape, np.float32)
        elif name in ("bias", "mean"):
            a = np.zeros(sd.shape, np.float32)
        else:
            fan_in = int(np.prod(sd.shape[:-1])) or 1
            a = (rng.standard_normal(sd.shape).astype(np.float32)
                 * np.sqrt(2.0 / fan_in))
        return jnp.asarray(a, sd.dtype)

    return jax.tree_util.tree_map_with_path(mat, shapes)
