"""Kernel-safe jnp implementation of MX quantization numerics.

Every function here is written so it can run (a) as plain jitted XLA on any
backend and (b) inside a Pallas TPU kernel body: static shapes, no gathers,
no data-dependent control flow, >=2D-friendly elementwise bit arithmetic.

Sub-byte jnp dtypes (float4_e2m1fn etc.) are deliberately NOT used — they are
unreliable on the experimental TPU backend — all element codes are uint8 and
all decoding is explicit float32 bit construction.

Semantics are locked to the NumPy oracle in ``mx/oracle.py`` (tested in
tests/test_mx_numerics.py), which in turn mirrors the reference CUDA
quantizer /root/reference/mgemm/src/reorder.cu:176-248.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .formats import BLOCK_SIZE, FP4, FP6, FP8, FormatInfo, UE8M0_BIAS

_F32 = jnp.float32
_U32 = jnp.uint32
_I32 = jnp.int32


def _bitcast_f32_to_u32(x):
    return jax.lax.bitcast_convert_type(x, _U32)


def _bitcast_u32_to_f32(x):
    return jax.lax.bitcast_convert_type(x, _F32)


def exp2i(e):
    """2.0**e for int32 e in [-126, 127], exact, via float32 bit construction."""
    bits = ((e.astype(_I32) + 127).astype(_U32)) << 23
    return _bitcast_u32_to_f32(bits)


def ceil_log2(v):
    """Exact ceil(log2(v)) for positive normal float32 v (int32 result)."""
    bits = _bitcast_f32_to_u32(v.astype(_F32))
    e = (bits >> 23).astype(_I32) - 127
    mant_nonzero = (bits & _U32(0x7FFFFF)) != 0
    return e + mant_nonzero.astype(_I32)


def block_scale_exponent(maxv, fmt: FormatInfo):
    """UE8M0 unbiased scale exponent: ceil(log2(maxv / fmt.max)); -1 if maxv==0.

    maxv: per-block absolute maxima (any shape), float.
    """
    maxv = maxv.astype(_F32)
    safe = jnp.where(maxv > 0, maxv, _F32(1.0))
    e = ceil_log2(safe / _F32(fmt.max))
    e = jnp.where(maxv > 0, e, _I32(-1))
    return jnp.clip(e, -126, 127).astype(_I32)


def quantize_to_grid(x, fmt: FormatInfo):
    """Saturating round-to-nearest-even of x (float) onto the format grid.

    Returns float32 values exactly on the grid of ``fmt``.
    """
    x = x.astype(_F32)
    ax = jnp.minimum(jnp.abs(x), _F32(fmt.max))
    bits = _bitcast_f32_to_u32(ax)
    e = (bits >> 23).astype(_I32) - 127
    e = jnp.maximum(e, fmt.emin)
    ulp = exp2i(e - fmt.mant_bits)
    # ax / ulp is exact (ulp is a power of two); jnp.round is half-to-even.
    q = jnp.round(ax / ulp) * ulp
    return jnp.where(x < 0, -q, q)


def encode(q, fmt: FormatInfo):
    """Grid values (float32, output of quantize_to_grid) -> uint8 codes.

    Codes use the standard bit layout s|e|m right-aligned in a uint8
    (fp4: low 4 bits, fp6: low 6 bits, fp8: all 8).
    """
    q = q.astype(_F32)
    bits = _bitcast_f32_to_u32(q)
    sign = (bits >> 31).astype(_U32)
    aq = jnp.abs(q)
    abits = _bitcast_f32_to_u32(aq)
    e = (abits >> 23).astype(_I32) - 127
    mant_mask = (1 << fmt.mant_bits) - 1
    normal_mant = ((abits >> (23 - fmt.mant_bits)).astype(_U32)) & _U32(mant_mask)
    normal_exp = (e - fmt.emin + 1).astype(_U32)
    # Subnormal: value = m * 2**(emin - mant_bits); recover integer m exactly.
    # via int32: Mosaic has no float32 -> uint32 cast (exact: small non-neg ints)
    sub_mant = (
        aq * exp2i(jnp.full_like(e, fmt.mant_bits - fmt.emin))
    ).astype(_I32).astype(_U32)
    is_sub = aq < _F32(2.0**fmt.emin)
    exp_field = jnp.where(is_sub, _U32(0), normal_exp)
    mant_field = jnp.where(is_sub, sub_mant, normal_mant)
    code = (
        (sign << (fmt.exp_bits + fmt.mant_bits))
        | (exp_field << fmt.mant_bits)
        | mant_field
    )
    return code.astype(jnp.uint8)


def decode(codes, fmt: FormatInfo):
    """uint8 codes -> float32 grid values (inverse of encode)."""
    c = codes.astype(_U32) & _U32((1 << fmt.code_bits) - 1)
    mb, eb = fmt.mant_bits, fmt.exp_bits
    sign = (c >> (eb + mb)) & _U32(1)
    e = ((c >> mb) & _U32((1 << eb) - 1)).astype(_I32)
    m = (c & _U32((1 << mb) - 1)).astype(_U32)
    # Normal: (1 + m/2^mb) * 2^(e - bias)  ==  f32 with exp field e+emin-1+127.
    normal_bits = (((e + fmt.emin - 1 + 127).astype(_U32)) << 23) | (m << (23 - mb))
    normal = _bitcast_u32_to_f32(normal_bits)
    # via int32: Mosaic has no uint32 -> float32 cast
    sub = m.astype(_I32).astype(_F32) * _F32(fmt.min_subnormal)
    val = jnp.where(e == 0, sub, normal)
    return jnp.where(sign == 1, -val, val)


# ---------------------------------------------------------------------------
# Block (32-element) quantization along the last axis.
# ---------------------------------------------------------------------------

def quantize_blocks(x, fmt: FormatInfo):
    """x (..., K), K % 32 == 0 -> (codes u8 (..., K), scales u8 (..., K//32))."""
    assert x.shape[-1] % BLOCK_SIZE == 0, x.shape
    nblk = x.shape[-1] // BLOCK_SIZE
    xb = x.astype(_F32).reshape(*x.shape[:-1], nblk, BLOCK_SIZE)
    maxv = jnp.max(jnp.abs(xb), axis=-1)
    e = block_scale_exponent(maxv, fmt)
    r_scale = exp2i(-e)  # multiply by reciprocal; exact for powers of two
    q = quantize_to_grid(xb * r_scale[..., None], fmt)
    codes = encode(q, fmt).reshape(x.shape)
    scales = (e + UE8M0_BIAS).astype(jnp.uint8)
    return codes, scales


def dequantize_blocks(codes, scales, fmt: FormatInfo, dtype=_F32):
    """codes (..., K) u8, scales (..., K//32) u8 -> dtype values (..., K)."""
    vals = decode(codes, fmt)
    e = scales.astype(_I32) - UE8M0_BIAS
    scale = exp2i(e)
    vb = vals.reshape(*vals.shape[:-1], scales.shape[-1], BLOCK_SIZE)
    out = vb * scale[..., None]
    return out.reshape(vals.shape).astype(dtype)


def fakequant_blocks(x, fmt: FormatInfo):
    codes, scales = quantize_blocks(x, fmt)
    return dequantize_blocks(codes, scales, fmt).astype(x.dtype)


# ---------------------------------------------------------------------------
# fp4 nibble packing.
#
# Device layout is SPLIT-PLANE: byte j holds logical channel j in the low
# nibble and logical channel j + K/2 in the high nibble.  This is a
# deliberate TPU-first divergence from the reference's pair-interleaved
# PackFp4 {low=2i, high=2i+1} layout (reorder.cu:30-33): on TPU both decode
# planes are then *contiguous lane slices* (codes[:, :K/2] and codes[:, K/2:])
# and each plane's scale groups are contiguous slices of the scale array —
# no strided lane shuffles anywhere in the matmul kernel.
# ---------------------------------------------------------------------------

def pack_fp4(codes):
    """uint8 fp4 codes (..., K) -> split-plane packed uint8 (..., K//2)."""
    h = codes.shape[-1] // 2
    lo = codes[..., :h] & jnp.uint8(0xF)
    hi = codes[..., h:] & jnp.uint8(0xF)
    return lo | (hi << 4)


def unpack_fp4(packed):
    """split-plane packed uint8 (..., K//2) -> uint8 fp4 codes (..., K)."""
    lo = packed & jnp.uint8(0xF)
    hi = (packed >> 4) & jnp.uint8(0xF)
    return jnp.concatenate([lo, hi], axis=-1)


def decode_packed_fp4(packed, dtype=_F32):
    """Packed fp4 (..., K//2) -> dequantized-without-scale values (..., K).

    Decodes both nibbles arithmetically without a gather; usable in Pallas.
    """
    return decode(unpack_fp4(packed), FP4).astype(dtype)


__all__ = [
    "exp2i",
    "ceil_log2",
    "block_scale_exponent",
    "quantize_to_grid",
    "encode",
    "decode",
    "quantize_blocks",
    "dequantize_blocks",
    "fakequant_blocks",
    "pack_fp4",
    "unpack_fp4",
    "decode_packed_fp4",
    "FP4",
    "FP6",
    "FP8",
    "BLOCK_SIZE",
]
