"""Pallas TPU kernel: mixed-precision MX quantization of activations.

Quantizes a (M, K) bf16/f32 matrix — already channel-permuted into device
layout (segments contiguous, block-interleaved within each segment, see
mx/layout.py) — into the three MX segments with UE8M0 scales.

TPU re-expression of reorder_quantize_mixed_kernel (reorder.cu:94-269):
the GPU kernel's one-CTA-per-row smem gather becomes (a) an XLA gather
composed into the preceding op (ops/quantize_ops.py) and (b) this kernel,
which performs the per-block absmax / scale / round / encode entirely with
lane-aligned VPU ops:

  * block absmax = elementwise max of the 32 contiguous (bm, nb) lane
    slices (block-interleaved layout makes each slice hit every block once)
  * scale        = 2^ceil(log2(max/fmt_max)) via exact f32 bit inspection
  * encode       = saturating RTN-even onto the format grid, then bitfield
    assembly — all jnp bit arithmetic (mx/numerics.py)
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mx import numerics as nx
from ..mx.formats import BLOCK_SIZE, FP4, FP6, FP8, UE8M0_BIAS
from ..mx.mxtensor import MixedTensor

_F32 = jnp.float32


def _quantize_segment(xs, fmt):
    """xs (bm, kseg) f32 in device layout -> (codes u8, scales u8)."""
    kseg = xs.shape[-1]
    nb = kseg // BLOCK_SIZE
    maxv = jnp.abs(xs[:, :nb])
    for i in range(1, BLOCK_SIZE):
        maxv = jnp.maximum(maxv, jnp.abs(xs[:, i * nb:(i + 1) * nb]))
    e = nx.block_scale_exponent(maxv, fmt)
    r = pltpu.repeat(nx.exp2i(-e), BLOCK_SIZE, axis=1)
    q = nx.quantize_to_grid(xs * r, fmt)
    codes = nx.encode(q, fmt)
    scales = (e + UE8M0_BIAS).astype(jnp.uint8)
    return codes, scales


def _quantize_kernel(x_ref, *out_refs, k4: int, k6: int, k8: int):
    x = x_ref[:].astype(_F32)
    outs = iter(out_refs)
    off = 0
    for kseg, fmt in ((k4, FP4), (k6, FP6), (k8, FP8)):
        if not kseg:
            continue
        codes, scales = _quantize_segment(x[:, off:off + kseg], fmt)
        next(outs)[:] = codes
        next(outs)[:] = scales
        off += kseg


def quantize_mixed_pallas(x: jnp.ndarray, k4: int, k6: int, k8: int, *,
                          bm: Optional[int] = None,
                          interpret: Optional[bool] = None) -> MixedTensor:
    """Quantize device-layout activations (M, K) into a MixedTensor.

    fp4 codes are left unpacked (activation layout; see mx/mxtensor.py).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    m, k = x.shape
    assert k == k4 + k6 + k8, (x.shape, k4, k6, k8)
    if bm is None:
        bm = min(512, max(8, m))
    mp = (m + bm - 1) // bm * bm
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))

    out_shapes, out_specs = [], []

    def add_out(cols):
        out_shapes.append(jax.ShapeDtypeStruct((mp, cols), jnp.uint8))
        out_specs.append(pl.BlockSpec((bm, cols), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))

    for kseg in (k4, k6, k8):
        if kseg:
            add_out(kseg)
            add_out(kseg // BLOCK_SIZE)

    kernel = functools.partial(_quantize_kernel, k4=k4, k6=k6, k8=k8)
    outs = pl.pallas_call(
        kernel,
        grid=(mp // bm,),
        in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x)

    outs = [o[:m] for o in outs]
    it = iter(outs)
    empty = jnp.zeros((m, 0), jnp.uint8)
    c4, s4 = (next(it), next(it)) if k4 else (empty, empty)
    c6, s6 = (next(it), next(it)) if k6 else (empty, empty)
    c8, s8 = (next(it), next(it)) if k8 else (empty, empty)
    return MixedTensor(fp4=c4, fp6=c6, fp8=c8, sf4=s4, sf6=s6, sf8=s8)
