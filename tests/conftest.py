"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Multi-chip sharding paths are exercised on virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), the JAX-native
substitute for multi-node testing without a cluster (SURVEY.md §4).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Compile-speed knob for the single-core CI host: the suite's cold wall-clock
# is XLA-compile dominated, and backend opt level 0 cuts each compile ~30%
# (measured: test_dirichlet_training_runs_and_balances 123 s -> 89 s cold).
# Semantics are unchanged — only CPU codegen quality, which the tiny test
# shapes don't need — and the production TPU path never sees this flag.
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0").strip()
# Portable-ISA clamp: silences the AOT loader's same-host pseudo-feature
# false positive and makes cached CPU executables host-portable (see
# compile_cache.pin_cpu_isa). Inline here because XLA_FLAGS must be final
# before the jax import below.
if "xla_cpu_max_isa" not in flags:
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The axon TPU plugin in this image ignores the JAX_PLATFORMS env var; the
# config knob is honored, so set it too (before any backend initialization).
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall-clock is dominated by XLA
# compiles of the parity/mesh jits; caching them across runs cuts repeat runs
# from ~27 min toward the actual compute time. compile_cache.enable() keys
# the directory by a host-CPU fingerprint so AOT executables compiled on a
# different machine are never loaded (SIGILL hazard).
#
# The default base is the COMMITTED cpu_cache/ directory (same pattern as
# bench_cache/ for the TPU): a clean checkout on a host whose fingerprint
# matches a committed subdir starts warm (~5 min suite instead of ~20);
# any other host simply sees an empty subdir and compiles cold — the
# fingerprint keying plus the AVX2 ISA clamp above make a foreign cache
# unloadable rather than a SIGILL landmine. Override with $SLU_JAX_CACHE.
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SLU_JAX_CACHE", os.path.join(_repo_root, "cpu_cache"))

from semanticlidarunc_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_scan():
    from semanticlidarunc_tpu.dataset import synthetic
    return synthetic.make_scan(seed=0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
