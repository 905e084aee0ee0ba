"""Pytree containers for MX-quantized tensors.

``MixedTensor`` is the on-device representation of one channel-reordered,
segment-quantized matrix (activations or weights):

  * fp4 segment : uint8 codes. Weights are stored split-plane packed
                  (2 codes/byte, see mx/numerics.py pack_fp4) to halve the
                  HBM-bound weight stream; activations are stored unpacked
                  (1 code/byte) because they are transient and unpacked
                  codes keep the on-the-fly quantize kernel branch-free.
  * fp6 segment : uint8 container codes (1 byte/element) + scales
  * fp8 segment : uint8 e4m3fn bit patterns + scales

Each segment carries one UE8M0 scale byte per 32 logical elements.

Design note (TPU-first, diverges from the reference deliberately): the
reference packs fp6 as 4 values -> 3 bytes (reorder.cu:54-63) which is
hostile to 128-lane vector layout; on TPU fp6 lives in 1-byte containers.
fp6 segments are small (p6_num is typically 0..512 of 4096 channels) so the
HBM cost is negligible while decode stays a pure lane-local bit op.

Reference parity: segments mirror the (AN,AS,AO,SFAN,SFAS,SFAO) buffers of
mixedgemm (bindings.cpp:104-151); K-segment sizes are multiples of 128
(reorder_indices.py:109-110) so all TPU tiles stay aligned.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from . import layout as lay
from . import numerics as nx
from .formats import FP4, FP6, FP8


@dataclasses.dataclass(frozen=True)
class MixedTensor:
    """One 2-D matrix (rows, K) quantized into up to three K-segments."""

    fp4: jnp.ndarray  # (rows, k4) u8 codes, or (rows, k4 // 2) if fp4_packed
    fp6: jnp.ndarray  # (rows, k6) uint8 codes
    fp8: jnp.ndarray  # (rows, k8) uint8 codes
    sf4: jnp.ndarray  # (rows, k4 // 32) uint8 UE8M0
    sf6: jnp.ndarray  # (rows, k6 // 32) uint8
    sf8: jnp.ndarray  # (rows, k8 // 32) uint8
    fp4_packed: bool = dataclasses.field(default=False, metadata=dict(static=True))
    # True -> all three segments use the MXFP4 grid (weight path,
    # reorder_quantize_mxfp4_kernel reorder.cu:271-432).
    fp4_only: bool = dataclasses.field(default=False, metadata=dict(static=True))

    @property
    def rows(self) -> int:
        return self.fp4.shape[0]

    @property
    def k4(self) -> int:
        return self.fp4.shape[-1] * (2 if self.fp4_packed else 1)

    @property
    def k6(self) -> int:
        return self.fp6.shape[-1]

    @property
    def k8(self) -> int:
        return self.fp8.shape[-1]

    @property
    def k(self) -> int:
        return self.k4 + self.k6 + self.k8

    def segments(self) -> Tuple[int, int, int]:
        return (self.k4, self.k6, self.k8)


jax.tree_util.register_dataclass(
    MixedTensor,
    data_fields=["fp4", "fp6", "fp8", "sf4", "sf6", "sf8"],
    meta_fields=["fp4_packed", "fp4_only"],
)


def _empty(rows: int, cols: int) -> jnp.ndarray:
    return jnp.zeros((rows, cols), jnp.uint8)


def quantize_mixed(x: jnp.ndarray, k4: int, k6: int, k8: int,
                   weight_fp4_only: bool = False,
                   pack_fp4: bool = False) -> MixedTensor:
    """Quantize an already-permuted (rows, K) matrix into a MixedTensor.

    weight_fp4_only=True reproduces reorder_quantize_mxfp4_kernel
    (reorder.cu:271-432): all three segments use the MXFP4 grid but keep
    separate buffers/scales so segment widths match the activation's.
    pack_fp4=True stores the fp4 segment split-plane packed (weights).
    """
    assert x.ndim == 2 and x.shape[-1] == k4 + k6 + k8, (x.shape, k4, k6, k8)
    rows = x.shape[0]
    x = x.astype(jnp.float32)

    def seg(lo, hi, fmt):
        if hi == lo:
            return _empty(rows, 0), _empty(rows, 0)
        codes, scales = nx.quantize_blocks(x[:, lo:hi], fmt)
        return lay.interleave(codes), scales

    c4, s4 = seg(0, k4, FP4)
    c6, s6 = seg(k4, k4 + k6, FP4 if weight_fp4_only else FP6)
    c8, s8 = seg(k4 + k6, k4 + k6 + k8, FP4 if weight_fp4_only else FP8)
    if pack_fp4 and k4:
        c4 = nx.pack_fp4(c4)
    return MixedTensor(
        fp4=c4, fp6=c6, fp8=c8, sf4=s4, sf6=s6, sf8=s8,
        fp4_packed=bool(pack_fp4 and k4), fp4_only=weight_fp4_only,
    )


def dequantize_mixed(t, dtype=jnp.float32) -> jnp.ndarray:
    """Quantized weight -> dense (rows, K), *canonical* column order.

    Accepts a MixedTensor or a ScaledW8 (the decode-optimized fp4-only
    weight layout) so test/reference paths stay layout-agnostic.
    """
    if not isinstance(t, MixedTensor):
        from .scaledw8 import dequantize_scaled_w8
        vals = dequantize_scaled_w8(t, dtype=jnp.float32)
        parts, off = [], 0
        for kseg in t.segments():
            if kseg:
                parts.append(lay.deinterleave(vals[:, off:off + kseg]))
            off += kseg
        return jnp.concatenate(parts, axis=-1).astype(dtype)
    parts = []
    if t.k4:
        codes = nx.unpack_fp4(t.fp4) if t.fp4_packed else t.fp4
        parts.append(nx.dequantize_blocks(lay.deinterleave(codes), t.sf4, FP4))
    if t.k6:
        parts.append(nx.dequantize_blocks(lay.deinterleave(t.fp6), t.sf6,
                                          FP4 if t.fp4_only else FP6))
    if t.k8:
        parts.append(nx.dequantize_blocks(lay.deinterleave(t.fp8), t.sf8,
                                          FP4 if t.fp4_only else FP8))
    if not parts:
        return jnp.zeros((t.rows, 0), dtype)
    return jnp.concatenate(parts, axis=-1).astype(dtype)


def dequantize_mixed_device(t, dtype=jnp.bfloat16) -> jnp.ndarray:
    """MixedTensor/ScaledW8 -> dense (rows, K), *device* column order.

    Unlike dequantize_mixed (canonical order, for host-side comparison),
    this keeps each segment block-interleaved — the exact bf16 operand the
    Pallas kernels feed the MXU.  Scale expansion is a lane tile (physical
    column c -> scale block c % nb, mx/layout.py), which XLA fuses freely.
    """
    if not isinstance(t, MixedTensor):
        from .scaledw8 import dequantize_scaled_w8
        return dequantize_scaled_w8(t, dtype=dtype)
    parts = []
    for kseg, codes, sf, fmt in (
            (t.k4, t.fp4, t.sf4, FP4),
            (t.k6, t.fp6, t.sf6, FP4 if t.fp4_only else FP6),
            (t.k8, t.fp8, t.sf8, FP4 if t.fp4_only else FP8)):
        if not kseg:
            continue
        if codes.shape[-1] != kseg:  # split-plane packed fp4
            codes = nx.unpack_fp4(codes)
        vals = nx.decode(codes, fmt)
        scale = nx.exp2i(sf.astype(jnp.int32) - 127)
        parts.append(vals * jnp.tile(scale, (1, kseg // sf.shape[-1])))
    if not parts:
        return jnp.zeros((t.rows, 0), dtype)
    return jnp.concatenate(parts, axis=-1).astype(dtype)


def mixed_matmul_xla(a: MixedTensor, w: MixedTensor,
                     out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Pure-XLA reference of the segmented mixed GEMM: Y = dq(A) @ dq(W)^T.

    The Pallas kernel (kernels/mixed_matmul.py) is tested against this.
    Operands are dequantized to bf16 (exact: every MX grid value times a
    power-of-two scale is bf16-representable) and contracted in f32, the
    same arithmetic the MXU performs.
    """
    assert a.segments() == w.segments(), (a.segments(), w.segments())
    ad = dequantize_mixed(a, dtype=jnp.bfloat16)
    wd = dequantize_mixed(w, dtype=jnp.bfloat16)
    return jnp.dot(ad, wd.T, preferred_element_type=jnp.float32).astype(out_dtype)


@dataclasses.dataclass(frozen=True)
class SplitPlaneStack:
    """Several same-budget split-plane MixedTensor weights row-stacked.

    The capacity-first layout's twin of mx/scaledw8.ScaledW8Stack: one
    row-concatenated MixedTensor (each section's rows padded to the strip
    width with zero codes/scales, which decode to exact 0.0) plus section
    metadata, feeding the split-plane fused-site multi-output kernel
    (kernels/mixed_matmul.mixed_matmul_sp_stack).  Gives the split-plane
    decode path the same glue the ScaledW8 path got — fused quantize
    sites, fakequant-direct activations, in-kernel Benes routing, and
    one Pallas call per site (VERDICT r4 weak #4).
    """

    mt: MixedTensor
    biases: Tuple
    sections: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    padded: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))

    @property
    def k(self) -> int:
        return self.mt.k

    def segments(self):
        return self.mt.segments()


jax.tree_util.register_dataclass(
    SplitPlaneStack, data_fields=["mt", "biases"],
    meta_fields=["sections", "padded"])


def stack_split_plane(ws, biases=None) -> SplitPlaneStack:
    """[MixedTensor (N_i, K) split-plane weights] -> SplitPlaneStack.

    One-time device concat (engine init) — never inside a step program.
    Single-element lists are allowed and cost no copy when the row count
    is already strip-aligned (the inline down/o wrap).
    """
    ws = list(ws)
    segs = ws[0].segments()
    flags = (ws[0].fp4_packed, ws[0].fp4_only)
    for w in ws[1:]:
        assert w.segments() == segs and (w.fp4_packed, w.fp4_only) == flags
    if biases is None:
        biases = (None,) * len(ws)
    ns = [w.rows for w in ws]
    bn = 512
    align = lambda n: (n + 127) // 128 * 128
    while bn > 128 and any(align(n) % bn for n in ns):
        bn //= 2
    padded = tuple((n + bn - 1) // bn * bn for n in ns)

    def cat(field):
        parts = []
        for w, np_ in zip(ws, padded):
            a = getattr(w, field)
            if np_ != a.shape[0]:
                a = jnp.pad(a, ((0, np_ - a.shape[0]), (0, 0)))
            parts.append(a)
        return parts[0] if len(parts) == 1 and \
            parts[0].shape[0] == sum(padded) else jnp.concatenate(parts)

    mt = MixedTensor(fp4=cat("fp4"), fp6=cat("fp6"), fp8=cat("fp8"),
                     sf4=cat("sf4"), sf6=cat("sf6"), sf8=cat("sf8"),
                     fp4_packed=flags[0], fp4_only=flags[1])
    return SplitPlaneStack(mt=mt, biases=tuple(biases),
                           sections=tuple(ns), padded=padded)
