"""Fused activation-quantization ops.

Each op ends in the mixed MX quantize — backend picked per shape by
default (Pallas kernel at decode batch sizes, pure-XLA chain at
prefill/eval sizes; see activation_quantize) — and starts from a
different producer, mirroring the reference's fused CUDA kernels:

  * reorder_quantize_x   <- reorder_quantize_mixed_kernel (reorder.cu:94-269)
  * rmsnorm_quantize_x   <- rmsnorm_bf16_mixed_kernel (rmsnorm.cu:96-310)
  * silu_mul_quantize_x  <- activate_quantize_kernel (activate.cu:42-202)

The channel permutation (``perm``) must already be composed with the
per-segment block interleave (mx/layout.py compose_segmented); it is a
trace-time constant, so XLA lowers the gather to a static permute fused
with the surrounding elementwise work.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..kernels.quantize import quantize_mixed_pallas
from ..mx import layout as lay
from ..mx import numerics as nx
from ..mx.formats import FP4, FP6, FP8
from ..mx.mxtensor import MixedTensor, quantize_mixed


def _flatten(x):
    """(..., K) -> (M, K) plus a restore callable for the leading shape."""
    lead = x.shape[:-1]
    return x.reshape(-1, x.shape[-1]), lead


PALLAS_QUANTIZE_MAX_M = 128


def activation_quantize(x2d: jnp.ndarray, k4: int, k6: int, k8: int, *,
                        use_pallas: Optional[bool] = None,
                        interpret: Optional[bool] = None) -> MixedTensor:
    """Quantize device-layout activations (M, K) -> MixedTensor.

    use_pallas=None picks per shape (measured on v5e, docs/perf_notes.md):
    the fused Pallas kernel wins at decode batch sizes (one dispatch, no
    intermediate materialization inside the decode scan), while for
    prefill/eval rows the pure-XLA chain is 2.5-3x faster (XLA fuses and
    tiles the gather + bit arithmetic + pack better at scale).
    """
    if use_pallas is None:
        use_pallas = (jax.default_backend() != "cpu"
                      and x2d.shape[0] <= PALLAS_QUANTIZE_MAX_M)
    if use_pallas:
        return quantize_mixed_pallas(x2d, k4, k6, k8, interpret=interpret)
    # XLA path: deinterleave -> canonical quantize (which re-interleaves).
    parts = []
    off = 0
    for kseg in (k4, k6, k8):
        if kseg:
            parts.append(lay.deinterleave(x2d[:, off:off + kseg]))
        off += kseg
    xc = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
    return quantize_mixed(xc, k4, k6, k8)


def reorder_quantize_x(x: jnp.ndarray, perm: jnp.ndarray,
                       k4: int, k6: int, k8: int, *,
                       use_pallas: Optional[bool] = None,
                       interpret: Optional[bool] = None) -> MixedTensor:
    """Gather channels into device order and quantize.  x: (..., K)."""
    x2d, _ = _flatten(x)
    xg = jnp.take(x2d, perm, axis=1)
    return activation_quantize(xg, k4, k6, k8, use_pallas=use_pallas,
                               interpret=interpret)


def rmsnorm_quantize_x(x: jnp.ndarray, gamma: jnp.ndarray, perm: jnp.ndarray,
                       k4: int, k6: int, k8: int, *,
                       eps: float = 1e-6,
                       use_pallas: Optional[bool] = None,
                       interpret: Optional[bool] = None) -> MixedTensor:
    """RMSNorm -> channel gather -> mixed quantize.

    The row rvariance is permutation-invariant, so it is computed on the
    un-permuted input; gamma is gathered with the same constant perm and
    folded into the single fused elementwise pass.
    """
    x2d, _ = _flatten(x)
    xf = x2d.astype(jnp.float32)
    # correctly-rounded 1/sqrt: context-independent, matches the
    # Pallas site kernels' rvar exactly (see fakequant.py note)
    rvar = 1.0 / jnp.sqrt(jnp.mean(xf * xf, axis=-1, keepdims=True)
                          + eps)
    g = jnp.take(gamma.astype(jnp.float32), perm, axis=0)
    y = jnp.take(xf, perm, axis=1) * rvar * g[None, :]
    return activation_quantize(y, k4, k6, k8, use_pallas=use_pallas,
                               interpret=interpret)


def silu_mul_quantize_x(gate: jnp.ndarray, up: jnp.ndarray,
                        k4: int, k6: int, k8: int, *,
                        use_pallas: Optional[bool] = None,
                        interpret: Optional[bool] = None) -> MixedTensor:
    """silu(gate) * up -> mixed quantize, NO gather.

    The down_proj channel permutation is baked into the *rows* of the gate
    and up projection weights at load time (models/loader.py), the TPU-first
    equivalent of the reference's no-reorder activate kernel
    (activate.cu:42-202, SURVEY §2.3).
    """
    g2d, _ = _flatten(gate)
    u2d, _ = _flatten(up)
    y = jax.nn.silu(g2d.astype(jnp.float32)) * u2d.astype(jnp.float32)
    return activation_quantize(y, k4, k6, k8, use_pallas=use_pallas,
                               interpret=interpret)


def fakequant_device(x2d: jnp.ndarray, k4: int, k6: int,
                     k8: int) -> jnp.ndarray:
    """Device-layout activations (M, K) -> the exact bf16 grid image.

    ScaledW8 matmuls consume the quantized activation's bf16 image, not
    its codes — so when every consumer of a site is ScaledW8, encoding to
    codes and decoding back is pure overhead (measured ~30 us/op of
    composed-graph cost per step at 8B decode, docs/perf_notes.md).
    Identical values to decode(activation_quantize(x)): per 32-block
    UE8M0 scale + saturating RNE per segment format.

    Device layout puts block b's elements at columns {b + i*nb}: reshape
    (M, 32, nb) makes blocks the minor-but-one axis, no gathers needed.
    """
    xf = x2d.astype(jnp.float32)
    parts = []
    off = 0
    for kseg, fmt in ((k4, FP4), (k6, FP6), (k8, FP8)):
        if not kseg:
            off += kseg
            continue
        seg = xf[:, off:off + kseg]
        nb = kseg // 32
        xb = seg.reshape(-1, 32, nb)
        maxv = jnp.max(jnp.abs(xb), axis=-2)                  # (M, nb)
        e = nx.block_scale_exponent(maxv, fmt)
        q = nx.quantize_to_grid(xb * nx.exp2i(-e)[:, None, :], fmt)
        vals = q * nx.exp2i(e)[:, None, :]
        parts.append(vals.reshape(-1, kseg))
        off += kseg
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    return out.astype(jnp.bfloat16)


def _use_site_kernel(x2d: jnp.ndarray) -> bool:
    """One fused Pallas call per site at decode batch sizes: the XLA
    fakequant chains cost ~3.1 ms/step at 8B shapes purely in tiny-op
    overhead (ablation, docs/perf_notes.md r3); prefill rows keep the
    XLA path, which fuses and tiles better at scale."""
    from ..kernels.fakequant import PALLAS_FAKEQUANT_MAX_M
    return (jax.default_backend() != "cpu"
            and x2d.shape[0] <= PALLAS_FAKEQUANT_MAX_M)


def rmsnorm_fakequant_x(x: jnp.ndarray, gamma: jnp.ndarray,
                        perm: jnp.ndarray, k4: int, k6: int, k8: int, *,
                        eps: float = 1e-6) -> jnp.ndarray:
    """rmsnorm_quantize_x's fakequant twin: same values, bf16 out."""
    x2d, _ = _flatten(x)
    if _use_site_kernel(x2d):
        from ..kernels.fakequant import fakequant_site_pallas
        return fakequant_site_pallas(
            jnp.take(x2d, perm, axis=1), k4, k6, k8, producer="rms",
            gamma=jnp.take(gamma.astype(jnp.float32), perm, axis=0),
            eps=eps)
    xf = x2d.astype(jnp.float32)
    # correctly-rounded 1/sqrt: context-independent, matches the
    # Pallas site kernels' rvar exactly (see fakequant.py note)
    rvar = 1.0 / jnp.sqrt(jnp.mean(xf * xf, axis=-1, keepdims=True)
                          + eps)
    g = jnp.take(gamma.astype(jnp.float32), perm, axis=0)
    y = jnp.take(xf, perm, axis=1) * rvar * g[None, :]
    return fakequant_device(y, k4, k6, k8)


def reorder_fakequant_x(x: jnp.ndarray, perm: Optional[jnp.ndarray],
                        k4: int, k6: int, k8: int) -> jnp.ndarray:
    """reorder_quantize_x's fakequant twin."""
    x2d, _ = _flatten(x)
    if perm is not None:
        x2d = jnp.take(x2d, perm, axis=1)
    if _use_site_kernel(x2d):
        from ..kernels.fakequant import fakequant_site_pallas
        return fakequant_site_pallas(x2d, k4, k6, k8)
    return fakequant_device(x2d, k4, k6, k8)


def silu_mul_fakequant_x(gate: jnp.ndarray, up: jnp.ndarray,
                         k4: int, k6: int, k8: int) -> jnp.ndarray:
    """silu_mul_quantize_x's fakequant twin."""
    g2d, _ = _flatten(gate)
    u2d, _ = _flatten(up)
    if _use_site_kernel(g2d):
        from ..kernels.fakequant import fakequant_site_pallas
        return fakequant_site_pallas(g2d, k4, k6, k8, producer="silu",
                                     up=u2d)
    y = jax.nn.silu(g2d.astype(jnp.float32)) * u2d.astype(jnp.float32)
    return fakequant_device(y, k4, k6, k8)


def dequantize_for_test(t: MixedTensor) -> jnp.ndarray:
    from ..mx.mxtensor import dequantize_mixed
    return dequantize_mixed(t)
