"""Persistent XLA compilation cache for every user-facing entry point.

XLA compiles of the flagship train/eval programs cost minutes (and tens of
minutes through a remote-compile tunnel); caching them on disk makes every
run after the first start in seconds. The reference framework has no analog
(PyTorch eager pays no compile), so this is TPU-only machinery: enabled by
default in the CLIs, `bench.py`, and the test suite.

Cache location: `host-<fingerprint>/` under `$SLU_JAX_CACHE` if set, else
under `.jax_cache/` in the repo root (next to this package). Entries are
keyed by HLO hash, so source edits only invalidate programs whose traced
computation actually changed. The host-fingerprint subdirectory exists
because the cache stores serialized AOT executables: a CPU executable
compiled on a machine with different ISA features can SIGILL when loaded
(XLA warns "Machine type ... doesn't match"), so a cache written on one
host must be invisible on another rather than a landmine.
"""
from __future__ import annotations

import hashlib
import os
import platform


def _host_fingerprint() -> str:
    """8-hex digest of the host CPU identity (arch + model + ISA flags)."""
    ident = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86 exposes "model name"/"flags"; arm64 "Features"
                if line.startswith(("model name", "flags", "Features")):
                    ident += line
                    if line.startswith(("flags", "Features")):
                        break
    except OSError:
        ident += platform.processor()
    return hashlib.sha256(ident.encode()).hexdigest()[:8]


def pin_cpu_isa(isa: str = "AVX2") -> None:
    """Clamp XLA:CPU codegen to a portable ISA baseline.

    Two birds: (a) cached CPU AOT executables become runnable on any x86
    host with at least `isa`, and (b) it stops XLA's AOT loader from
    flagging the LLVM AVX-512 tuning pseudo-features (+prefer-no-scatter/
    +prefer-no-gather) that its host-feature probe never reports — a
    same-host false positive that otherwise prints "Machine type ...
    doesn't match ... SIGILL" on every warm run. CPU is only the test /
    dryrun backend here (compile-dominated, tiny shapes), so the clamp
    costs nothing; call this before the backend initializes, and only in
    entry points that force the CPU platform.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_max_isa" not in flags:
        os.environ["XLA_FLAGS"] = (flags + f" --xla_cpu_max_isa={isa}").strip()


def default_cache_dir() -> str:
    base = os.environ.get("SLU_JAX_CACHE")
    if not base:
        pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        base = os.path.join(pkg_root, ".jax_cache")
    return os.path.join(base, f"host-{_host_fingerprint()}")


def enable(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `cache_dir` (created on
    first write). Safe to call multiple times; returns the directory."""
    import jax

    if os.environ.get("SLU_NO_CACHE"):
        return "<disabled>"
    cache_dir = cache_dir or default_cache_dir()
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Threshold below which a compile is not worth persisting. 0 caches
    # everything (right for the TPU bench, where even small programs cost
    # minutes through the remote-compile tunnel); the CPU test suite sets
    # SLU_CACHE_MIN_COMPILE_S>0 because its thousands of tiny programs
    # compile faster than the cache's own get/put disk round-trip
    # (profiled: _cache_read alone cost 2.5 s in a 43 s test).
    min_s = float(os.environ.get("SLU_CACHE_MIN_COMPILE_S", "0"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_s)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    return cache_dir
