"""Pallas TPU kernel: fused activation fakequant sites for decode.

The ScaledW8 decode path consumes the exact bf16 grid image of the
quantized activation (ops/quantize_ops.fakequant_device), so each
quantize site is a norm/activation producer + per-32-block UE8M0
scaling + saturating RNE grid round.  As XLA ops that is ~40 tiny HLO
ops per site x 128 sites per decode step; ablation attributed
~3.1 ms/step of the 8B decode chunk to these chains (rmsnorm ~2.3,
quantize math ~0.8 — docs/perf_notes.md r3).  This kernel runs one site
as ONE fused Pallas call:

  * producer: identity | rmsnorm(x)*gamma | silu(gate)*up
    (rmsnorm's row moment is permutation-invariant, so it is computed
    on the already-permuted input; gamma arrives pre-permuted)
  * per-block absmax over the device layout's 32 contiguous (m, nb)
    lane slices, UE8M0 scale via exact f32 bit inspection, RNE round
    onto the segment's format grid, scale back (mx/numerics.py — the
    same primitives the encode kernel kernels/quantize.py uses)

Value-identical to the XLA chain up to f32 reduction order in the
rmsnorm row moment (interpret-mode tests pin a tight tolerance; the
CPU path keeps the XLA chain).

Reference analog: rmsnorm_bf16_mixed_kernel / activate_quantize_kernel
(rmsnorm.cu:96-310, activate.cu:42-202) — there fused into the encode;
here fused into the fakequant image the ScaledW8 GEMM eats.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mx import numerics as nx
from ..mx.formats import BLOCK_SIZE, FP4, FP6, FP8

_F32 = jnp.float32


def _fakequant_segment(xs, fmt):
    """xs (m, kseg) f32 in device layout -> bf16 grid image (m, kseg)."""
    kseg = xs.shape[-1]
    nb = kseg // BLOCK_SIZE
    maxv = jnp.abs(xs[:, :nb])
    for i in range(1, BLOCK_SIZE):
        maxv = jnp.maximum(maxv, jnp.abs(xs[:, i * nb:(i + 1) * nb]))
    e = nx.block_scale_exponent(maxv, fmt)
    q = nx.quantize_to_grid(
        xs * pltpu.repeat(nx.exp2i(-e), BLOCK_SIZE, axis=1), fmt)
    return q * pltpu.repeat(nx.exp2i(e), BLOCK_SIZE, axis=1)


def site_producer_values(producer: str, x, aux, eps: float):
    """Producer compute shared by the site kernel and the fused
    site+GEMM kernel (kernels/mixed_matmul._w8_site_kernel): x/aux are
    in-register arrays -> f32 pre-quantize site values."""
    xf = x.astype(_F32)
    if producer == "rms":
        # 1/sqrt, NOT lax.rsqrt: sqrt and divide are correctly rounded,
        # so the row moment's rvar is identical in EVERY compilation
        # context — lax.rsqrt is an approximation whose error varies with
        # surrounding fusion, which made the residual-pair kernel's site
        # drift ~1e-3 from the stack kernel's on the same h (r5 debug)
        rvar = 1.0 / jnp.sqrt(
            jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
        return xf * rvar * aux.astype(_F32)
    if producer == "silu":
        return xf * jax.lax.logistic(xf) * aux.astype(_F32)
    return xf


def fakequant_values(y, k4: int, k6: int, k8: int):
    """f32 site values (m, K) -> bf16 grid image, segment by segment."""
    parts = []
    off = 0
    for kseg, fmt in ((k4, FP4), (k6, FP6), (k8, FP8)):
        if kseg:
            parts.append(_fakequant_segment(y[:, off:off + kseg], fmt))
            off += kseg
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    return out.astype(jnp.bfloat16)


def _site_kernel(*refs, k4: int, k6: int, k8: int, producer: str,
                 eps: float):
    if producer in ("rms", "silu"):
        x_ref, aux_ref, out_ref = refs
        y = site_producer_values(producer, x_ref[:], aux_ref[:], eps)
    else:
        x_ref, out_ref = refs
        y = site_producer_values(producer, x_ref[:], None, eps)
    out_ref[:] = fakequant_values(y, k4, k6, k8).astype(out_ref.dtype)


PALLAS_FAKEQUANT_MAX_M = 128


def fakequant_site_pallas(x: jnp.ndarray, k4: int, k6: int, k8: int, *,
                          producer: str = "plain",
                          gamma: Optional[jnp.ndarray] = None,
                          up: Optional[jnp.ndarray] = None,
                          eps: float = 1e-6,
                          interpret: Optional[bool] = None) -> jnp.ndarray:
    """(M, K) device-layout input(s) -> bf16 fakequant image, one call.

    producer: "plain" | "rms" (needs ``gamma`` (K,) pre-permuted)
    | "silu" (x = gate, needs ``up``).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    m, k = x.shape
    assert k == k4 + k6 + k8, (x.shape, k4, k6, k8)
    kernel = functools.partial(_site_kernel, k4=k4, k6=k6, k8=k8,
                               producer=producer, eps=eps)
    spec2d = pl.BlockSpec((m, k), lambda: (0, 0), memory_space=pltpu.VMEM)
    if producer == "rms":
        ins = [spec2d, pl.BlockSpec((1, k), lambda: (0, 0),
                                    memory_space=pltpu.VMEM)]
        args = (x, gamma.reshape(1, k))
    elif producer == "silu":
        ins = [spec2d, spec2d]
        args = (x, up)
    else:
        ins = [spec2d]
        args = (x,)
    # the f32 site intermediates (~2 live (m, k) f32 arrays) exceed the
    # 16 MiB default scoped-VMEM limit at m=128 k=14336 — same knob as the
    # fused site+GEMM kernel (kernels/mixed_matmul._SCOPED_VMEM_LIMIT)
    from .mixed_matmul import _SCOPED_VMEM_LIMIT
    return pl.pallas_call(
        kernel,
        in_specs=ins,
        out_specs=spec2d,
        out_shape=jax.ShapeDtypeStruct((m, k), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SCOPED_VMEM_LIMIT),
        interpret=interpret,
    )(*args)
