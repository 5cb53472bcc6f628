"""ctypes bindings for the native host kernels (host_ops.cpp).

The shared library is built on first use with the system g++ (-O3) and
cached next to the source (or in SLU_NATIVE_CACHE). Everything degrades
gracefully: if no compiler is available, `available()` returns False and
callers fall back to the numpy goldens — behavior, not performance, is
identical either way (see tests/test_native.py).

ctypes releases the GIL for the duration of each call, so the thread-pool
DataLoader (dataset/pipeline.py) runs these truly in parallel — the native
analog of the reference's DataLoader worker processes
(/root/reference/src/train_semantics.py:111-127).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _build_and_load() -> ctypes.CDLL | None:
    src = os.path.join(_HERE, "host_ops.cpp")
    cache_dir = os.environ.get("SLU_NATIVE_CACHE", _HERE)
    lib_path = os.path.join(cache_dir, "libslu_host_ops.so")
    if not os.path.exists(lib_path) or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(lib_path)):
        try:
            os.makedirs(cache_dir, exist_ok=True)
            tmp = lib_path + f".tmp{os.getpid()}"
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", tmp,
                            src], check=True, capture_output=True,
                           timeout=240)
            os.replace(tmp, lib_path)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        return None
    i64, i32, f64 = ctypes.c_int64, ctypes.c_int32, ctypes.c_double
    fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.slu_spherical_projection.argtypes = [
        fp, i64, i32, i32, i32, i32, f64, f64, fp]
    lib.slu_spherical_projection.restype = i32
    lib.slu_scharr_normals.argtypes = [fp, i32, i32, fp]
    lib.slu_scharr_normals.restype = i32
    return lib


def _lib() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        with _LOCK:
            if _LIB is None and not _TRIED:
                _LIB = _build_and_load()
                _TRIED = True
    return _LIB


def available() -> bool:
    return (os.environ.get("SLU_NATIVE", "1") != "0"
            and _lib() is not None)


def spherical_projection(pc: np.ndarray, height: int, width: int,
                         theta_range=None) -> np.ndarray:
    """(H, W, C) projected image; exact twin of
    ops.projection.spherical_projection_np's image output."""
    lib = _lib()
    assert lib is not None, "native library unavailable"
    pc = np.ascontiguousarray(pc, dtype=np.float32)
    img = np.empty((height, width, pc.shape[1]), np.float32)
    if theta_range is None:
        mode, tmin, tmax = 0, 0.0, 0.0
    else:
        mode, (tmin, tmax) = 1, theta_range
    rc = lib.slu_spherical_projection(pc, pc.shape[0], pc.shape[1],
                                      height, width, mode, float(tmin),
                                      float(tmax), img)
    assert rc == 0
    return img


def scharr_normals(xyz: np.ndarray) -> np.ndarray:
    """(H, W, 3) normalized surface normals; twin of
    dataset.readers._build_normals (cv2.Scharr semantics)."""
    lib = _lib()
    assert lib is not None, "native library unavailable"
    xyz = np.ascontiguousarray(xyz, dtype=np.float32)
    out = np.empty_like(xyz)
    rc = lib.slu_scharr_normals(xyz, xyz.shape[0], xyz.shape[1], out)
    assert rc == 0
    return out
