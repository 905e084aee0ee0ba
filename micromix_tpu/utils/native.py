"""ctypes bindings for the native host quantizer (native/mxpack.cpp).

Builds libmxpack.so on first use (make -C native) and exposes
``quantize_mixed_host``: the multithreaded load-time weight quantizer.
Falls back to the NumPy oracle when a compiler is unavailable, so the
framework never hard-depends on the native library.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", ".."))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libmxpack.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        i64, u8p, f32p = (ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
                          ctypes.POINTER(ctypes.c_float))
        lib.mx_quantize_interleaved.argtypes = [
            f32p, i64, i64, ctypes.c_int, u8p, u8p, ctypes.c_int]
        lib.mx_pack_fp4.argtypes = [u8p, i64, i64, u8p, ctypes.c_int]
        lib.mx_quantize_mixed.argtypes = [
            f32p, i64, i64, i64, i64, ctypes.c_int,
            u8p, u8p, u8p, u8p, u8p, u8p, ctypes.c_int]
        if hasattr(lib, "mx_quantize_scaledw8"):
            lib.mx_quantize_scaledw8.argtypes = [
                f32p, i64, i64, i64, i64, u8p,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
            lib.mx_quantize_scaledw8.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def quantize_scaledw8_host(x: np.ndarray, k4: int, k6: int, k8: int, *,
                           n_threads: Optional[int] = None):
    """Fused native quantize + ScaledW8 pack (w4-only weight grid).

    Returns (codes (rows, K) u8, base int) or None when the native library
    is unavailable or the layout does not fit (exponent span / base range)
    — callers fall back to quantize_mixed_host + the Python pack.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "mx_quantize_scaledw8"):
        return None
    x = np.ascontiguousarray(x, np.float32)
    rows, k = x.shape
    assert k == k4 + k6 + k8
    codes = np.empty((rows, k), np.uint8)
    base = ctypes.c_int32(0)
    rc = lib.mx_quantize_scaledw8(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rows, k4, k6, k8, _u8(codes), ctypes.byref(base),
        n_threads or (os.cpu_count() or 1))
    if rc != 0:
        return None
    return codes, int(base.value)


def quantize_mixed_host(x: np.ndarray, k4: int, k6: int, k8: int, *,
                        weight_fp4_only: bool = False,
                        n_threads: Optional[int] = None):
    """NumPy (rows, K) f32 -> MixedTensor-compatible numpy arrays.

    Returns dict(fp4 packed, fp6, fp8, sf4, sf6, sf8) in device layout —
    bit-identical to mx.mxtensor.quantize_mixed(pack_fp4=True).
    """
    x = np.ascontiguousarray(x, np.float32)
    rows, k = x.shape
    assert k == k4 + k6 + k8
    n_threads = n_threads or (os.cpu_count() or 1)
    out = {
        "fp4": np.empty((rows, k4 // 2), np.uint8),
        "sf4": np.empty((rows, k4 // 32), np.uint8),
        "fp6": np.empty((rows, k6), np.uint8),
        "sf6": np.empty((rows, k6 // 32), np.uint8),
        "fp8": np.empty((rows, k8), np.uint8),
        "sf8": np.empty((rows, k8 // 32), np.uint8),
    }
    lib = _load()
    if lib is not None:
        lib.mx_quantize_mixed(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rows, k4, k6, k8, int(weight_fp4_only),
            _u8(out["fp4"]), _u8(out["sf4"]), _u8(out["fp6"]),
            _u8(out["sf6"]), _u8(out["fp8"]), _u8(out["sf8"]), n_threads)
        return out
    # NumPy oracle fallback (slow but always available)
    from ..mx import layout as lay
    from ..mx import oracle
    from ..mx.formats import FP4, FP6, FP8

    def seg(lo, hi, fmt, pack):
        if hi == lo:
            return (np.zeros((rows, 0), np.uint8),) * 2
        codes, scales = oracle.quantize_blocks(x[:, lo:hi], fmt)
        codes = np.asarray(codes)[..., lay.interleave_index(hi - lo)]
        if pack:
            h = (hi - lo) // 2
            codes = (codes[:, :h] & 0xF) | ((codes[:, h:] & 0xF) << 4)
        return codes, scales

    out["fp4"], out["sf4"] = seg(0, k4, FP4, True)
    out["fp6"], out["sf6"] = seg(k4, k4 + k6,
                                 FP4 if weight_fp4_only else FP6, False)
    out["fp8"], out["sf8"] = seg(k4 + k6, k,
                                 FP4 if weight_fp4_only else FP8, False)
    return out
