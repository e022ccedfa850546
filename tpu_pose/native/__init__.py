"""Host-side native (C++) kernels for the serving/data front end.

The reference has zero first-party native code (SURVEY.md §2 header);
the rebuild's device-side native layer is Pallas/Mosaic
(ops/pallas_kernels.py) and THIS package is the host side: ops whose
cost lands on serving client threads, where numpy's allocation-heavy
vectorization loses to a tight C++ loop and the GIL serializes clients.

Build model: ``letterbox.cpp`` is compiled on first use with g++ into a
shared library cached next to the source, keyed by a source hash (so
edits rebuild automatically, repeat imports are free).  Everything is
optional: callers use :func:`letterbox_u8`, which returns None when the
toolchain or binary is unavailable, and fall back to the numpy twin
(ops/preprocess.letterbox_image_np keeps the reference semantics in
pure Python).  ctypes drops the GIL for the call, so concurrent
``BatchingServer.submit`` threads genuinely parallelize preprocessing.
"""

from __future__ import annotations

import ctypes
import functools
import hashlib
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "letterbox.cpp")
_LOCK = threading.Lock()
_LIB = None
_LIB_FAILED = False


def _build_and_load():
    """Compile (if needed) and dlopen the kernel library. Raises on any
    failure; callers treat that as 'native unavailable'."""
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    so = os.path.join(_DIR, f"_letterbox_{tag}.so")
    if not os.path.exists(so):
        tmp = so + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
             "-fPIC", "-o", tmp, _SRC],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)  # atomic: concurrent builders race safely
    lib = ctypes.CDLL(so)
    fn = lib.letterbox_resample_u8
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_uint8,
    ]
    return lib


def _lib():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    with _LOCK:
        if _LIB is None and not _LIB_FAILED:
            try:
                _LIB = _build_and_load()
            except Exception:
                _LIB_FAILED = True  # toolchain missing → numpy fallback
    return _LIB


def available() -> bool:
    """True if the native kernel compiled and loaded on this host."""
    return _lib() is not None


@functools.lru_cache(maxsize=64)
def _plan(n_in: int, n_out: int):
    """Cached C-contiguous resample plan (idx int64, w float32) from the
    ONE authoritative convention source, ops/preprocess
    ._resample_weights_np — the native kernel never re-derives sampling
    math, so numpy and C++ paths cannot drift."""
    from tpu_pose.ops.preprocess import _resample_weights_np
    idx, w = _resample_weights_np(n_in, n_out)
    return (np.ascontiguousarray(idx, np.int64),
            np.ascontiguousarray(w, np.float32))


def letterbox_u8(img: np.ndarray, size: int, fill: int = 128):
    """Native letterbox of one (H, W, C) uint8 frame to a (size, size, C)
    uint8 network frame (aspect-preserving resample + centered pad).

    Returns the output array, or None when the native path does not
    apply (non-uint8 input, identity geometry, or no compiled kernel) —
    callers fall back to :func:`ops.preprocess.letterbox_image_np`,
    which this matches to ≤1 uint8 LSB (tests/test_native.py).
    """
    lib = _lib()
    if lib is None or img.dtype != np.uint8 or img.ndim != 3:
        return None
    from tpu_pose.ops.preprocess import _letterbox_geometry
    h0, w0, c = img.shape
    nh, nw, off_y, off_x = _letterbox_geometry(h0, w0, size)
    if (nh, nw) == (h0, w0):
        return None  # pad-only path: numpy handles it (no resample)
    iy, wy = _plan(h0, nh)
    ix, wx = _plan(w0, nw)
    img = np.ascontiguousarray(img)
    out = np.empty((size, size, c), np.uint8)
    rc = lib.letterbox_resample_u8(
        img.ctypes.data, h0, w0, c,
        iy.ctypes.data, wy.ctypes.data, nh, iy.shape[1],
        ix.ctypes.data, wx.ctypes.data, nw, ix.shape[1],
        out.ctypes.data, size, off_y, off_x, int(fill) & 0xFF)
    if rc != 0:  # pragma: no cover - argument-validation backstop
        return None
    return out
