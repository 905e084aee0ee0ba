"""NumPy golden oracle for MX quantization numerics.

This is the single source of truth the jnp / Pallas implementations are
tested against.  It deliberately uses ``ml_dtypes`` casts (an independent,
well-tested IEEE round-to-nearest-even implementation) for the element
conversions rather than sharing bit-twiddling code with the device path.

Semantics mirror the reference CUDA quantizer
(/root/reference/mgemm/src/reorder.cu:176-248):

  * per 32-element block: ``maxv = max(|x|)``
  * ``scale = 2**ceil(log2(maxv / FMT_MAX))``; ``scale = 0.5`` when maxv == 0
  * ``q = RTN_fmt(clamp(x / scale, -FMT_MAX, FMT_MAX))``  (saturating)
  * scale stored as UE8M0 (biased exponent byte)
"""

from __future__ import annotations

import math

import ml_dtypes
import numpy as np

from .formats import BLOCK_SIZE, FP4, FP6, FP8, FormatInfo, UE8M0_BIAS

_ML_DTYPE = {
    "fp4": ml_dtypes.float4_e2m1fn,
    "fp6": ml_dtypes.float6_e3m2fn,
    "fp8": ml_dtypes.float8_e4m3fn,
}


def ceil_log2(v: np.ndarray) -> np.ndarray:
    """Exact ceil(log2(v)) for positive float32 v, via bit inspection.

    Avoids libm log2 rounding hazards near exact powers of two.
    """
    v = np.asarray(v, np.float32)
    bits = v.view(np.uint32)
    exp = ((bits >> 23) & 0xFF).astype(np.int32) - 127
    mant = (bits & 0x7FFFFF) != 0
    # Subnormal float32 inputs never occur for our magnitudes; treat anyway:
    # for subnormals exp=-127 and mant!=0 -> ceil >= -126; close enough and
    # unreachable in practice (block maxima are bf16 normals).
    return exp + mant.astype(np.int32)


def block_scale_exponent(maxv: np.ndarray, fmt: FormatInfo) -> np.ndarray:
    """UE8M0 unbiased exponent per block: ceil(log2(maxv / fmt.max)); -1 if maxv==0."""
    maxv = np.asarray(maxv, np.float32)
    safe = np.where(maxv > 0, maxv, np.float32(1.0))
    e = ceil_log2((safe / np.float32(fmt.max)).astype(np.float32))
    e = np.where(maxv > 0, e, np.int32(-1))  # maxv==0 -> scale=0.5 (reorder.cu:180)
    # [-126, 127]: keeps 2**e a normal float32 (TPU flushes subnormals anyway)
    # and keeps the UE8M0 byte in [1, 254], avoiding the NaN code 255.
    return np.clip(e, -126, 127).astype(np.int32)


def quantize_elem(x: np.ndarray, fmt: FormatInfo) -> np.ndarray:
    """Saturating RTN-even conversion of float32 ``x`` to the MX format grid.

    Returns float32 values lying exactly on the format grid.
    """
    x = np.asarray(x, np.float32)
    clamped = np.clip(x, -fmt.max, fmt.max)
    return clamped.astype(_ML_DTYPE[fmt.name]).astype(np.float32)


def encode_elem(q: np.ndarray, fmt: FormatInfo) -> np.ndarray:
    """Grid values (float32, already on grid) -> uint8 container codes."""
    return (
        np.asarray(q, np.float32)
        .astype(_ML_DTYPE[fmt.name])
        .view(np.uint8)
        .astype(np.uint8)
    )


def decode_elem(codes: np.ndarray, fmt: FormatInfo) -> np.ndarray:
    """uint8 container codes -> float32 grid values."""
    return np.asarray(codes, np.uint8).view(_ML_DTYPE[fmt.name]).astype(np.float32)


def quantize_blocks(x: np.ndarray, fmt: FormatInfo):
    """Quantize ``x`` (..., K) with K % 32 == 0 into (codes u8, scale_e8 u8).

    Returns:
      codes: uint8 container codes, same shape as x.
      scales: uint8 UE8M0 biased exponents, shape (..., K // 32).
    """
    x = np.asarray(x, np.float32)
    assert x.shape[-1] % BLOCK_SIZE == 0, x.shape
    blocks = x.reshape(*x.shape[:-1], x.shape[-1] // BLOCK_SIZE, BLOCK_SIZE)
    maxv = np.abs(blocks).max(axis=-1)
    e = block_scale_exponent(maxv, fmt)
    scale = np.exp2(e.astype(np.float32))
    q = quantize_elem(blocks / scale[..., None], fmt)
    codes = encode_elem(q, fmt).reshape(x.shape)
    return codes, (e + UE8M0_BIAS).astype(np.uint8)


def dequantize_blocks(codes: np.ndarray, scales_e8: np.ndarray, fmt: FormatInfo) -> np.ndarray:
    """Inverse of quantize_blocks: codes (..., K), scales (..., K//32) -> float32."""
    vals = decode_elem(codes, fmt)
    e = scales_e8.astype(np.int32) - UE8M0_BIAS
    scale = np.exp2(e.astype(np.float32))
    blocks = vals.reshape(*vals.shape[:-1], vals.shape[-1] // BLOCK_SIZE, BLOCK_SIZE)
    return (blocks * scale[..., None]).reshape(vals.shape)


def fakequant_blocks(x: np.ndarray, fmt: FormatInfo) -> np.ndarray:
    """quantize -> dequantize round trip (the numeric effect of MX quant)."""
    codes, scales = quantize_blocks(x, fmt)
    return dequantize_blocks(codes, scales, fmt)


# ---------------------------------------------------------------------------
# Mixed-precision segmented quantization (the MicroMix layout).
# ---------------------------------------------------------------------------

def mixed_quantize(x: np.ndarray, k4: int, k6: int, k8: int):
    """Quantize reordered activations/weights into the 3 K-segments.

    ``x`` (..., K) must already be channel-permuted (ascending saliency):
    first k4 channels -> MXFP4, next k6 -> MXFP6, last k8 -> MXFP8.
    Mirrors reorder_quantize_mixed_kernel (reorder.cu:94-269) minus the
    GPU-specific SF interleaving.
    """
    assert x.shape[-1] == k4 + k6 + k8
    out = {}
    for name, fmt, lo, hi in (
        ("fp4", FP4, 0, k4),
        ("fp6", FP6, k4, k4 + k6),
        ("fp8", FP8, k4 + k6, k4 + k6 + k8),
    ):
        seg = x[..., lo:hi]
        if seg.shape[-1] == 0:
            out[name] = (
                np.zeros(seg.shape, np.uint8),
                np.zeros((*seg.shape[:-1], 0), np.uint8),
            )
        else:
            out[name] = quantize_blocks(seg, fmt)
    return out


def mixed_dequantize(segments, k4: int, k6: int, k8: int) -> np.ndarray:
    parts = []
    for name, fmt in (("fp4", FP4), ("fp6", FP6), ("fp8", FP8)):
        codes, scales = segments[name]
        if codes.shape[-1]:
            parts.append(dequantize_blocks(codes, scales, fmt))
    return np.concatenate(parts, axis=-1)


def mixed_matmul_reference(x: np.ndarray, w: np.ndarray, k4: int, k6: int, k8: int,
                           weight_fmt: str = "fp4") -> np.ndarray:
    """Golden Y = qdq(x) @ qdq(w).T with per-segment quantization.

    weight_fmt="fp4" matches the live reference path (weights always MXFP4,
    qLinearLayer.py:50 / reorder_quantize_mxfp4_kernel); weight_fmt="mixed"
    matches the symmetric W4/6/8 mode.
    """
    xs = mixed_quantize(x, k4, k6, k8)
    xdq = mixed_dequantize(xs, k4, k6, k8)
    if weight_fmt == "fp4":
        parts = []
        for lo, hi in ((0, k4), (k4, k4 + k6), (k4 + k6, k4 + k6 + k8)):
            if hi > lo:
                parts.append(fakequant_blocks(w[..., lo:hi], FP4))
        wdq = np.concatenate(parts, axis=-1)
    else:
        ws = mixed_quantize(w, k4, k6, k8)
        wdq = mixed_dequantize(ws, k4, k6, k8)
    return xdq @ wdq.T


# ---------------------------------------------------------------------------
# Calibration threshold math (reorder_indices.py:103-111).
# ---------------------------------------------------------------------------

def precision_budget(value: np.ndarray, in_features: int, lamda: float = 1.0):
    """Per-linear (p4_num, p6_num, p8_num) from calibration sample |x| matrix.

    ``value``: (num_tokens, in_features) mean-free absolute activations
    (the concatenated |x| rows the reference accumulates).
    """
    vmax = value.max(axis=-1, keepdims=True)
    p4_threshold = vmax * 448.0 / 6.0 / math.pow(2.0, 10) * lamda
    p6_threshold = vmax * 448.0 / 28.0 / math.pow(2.0, 6) * lamda
    n = value.size
    p4_ratio = float((value < p4_threshold).sum()) / n
    p6_ratio = float((value < p6_threshold).sum()) / n - p4_ratio
    p8_ratio = 1.0 - p4_ratio - p6_ratio
    p6_num = math.ceil(in_features * p6_ratio / 128) * 128
    p8_num = math.ceil(in_features * p8_ratio / 128) * 128
    p4_num = in_features - p8_num - p6_num
    avg_bits = 4 * p4_ratio + 6 * p6_ratio + 8 * p8_ratio
    return p4_num, p6_num, p8_num, avg_bits
