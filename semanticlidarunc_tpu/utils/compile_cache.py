"""Persistent XLA compilation cache for every user-facing entry point.

XLA compiles of the flagship train/eval programs cost minutes (and tens of
minutes through a remote-compile tunnel); caching them on disk makes every
run after the first start in seconds. The reference framework has no analog
(PyTorch eager pays no compile), so this is TPU-only machinery: enabled by
default in the CLIs, `bench.py`, and the test suite.

Cache location: `$SLU_JAX_CACHE` if set, else `.jax_cache/` under the repo
root (next to this package). Entries are keyed by HLO hash, so source edits
only invalidate programs whose traced computation actually changed.
"""
from __future__ import annotations

import os


def default_cache_dir() -> str:
    env = os.environ.get("SLU_JAX_CACHE")
    if env:
        return env
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(pkg_root, ".jax_cache")


def enable(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `cache_dir` (created on
    first write). Safe to call multiple times; returns the directory."""
    import jax

    cache_dir = cache_dir or default_cache_dir()
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    return cache_dir
