"""Pytree containers for MX-quantized tensors.

``MixedTensor`` is the on-device representation of one channel-reordered,
segment-quantized matrix (activations or weights):

  * fp4 segment : packed uint8, 2 codes/byte (pair-interleaved, low nibble
                  first) + UE8M0 scale byte per 32 logical elements
  * fp6 segment : uint8 container codes (1 byte/element) + scales
  * fp8 segment : uint8 e4m3fn bit patterns + scales

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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import numerics as nx
from .formats import BLOCK_SIZE, FP4, FP6, FP8


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MixedTensor:
    """One 2-D matrix (rows, K) quantized into up to three K-segments."""

    fp4: jnp.ndarray  # (rows, k4 // 2) packed uint8
    fp6: jnp.ndarray  # (rows, k6) uint8 codes
    fp8: jnp.ndarray  # (rows, k8) uint8 codes
    sf4: jnp.ndarray  # (rows, k4 // 32) uint8 UE8M0
    sf6: jnp.ndarray  # (rows, k6 // 32) uint8
    sf8: jnp.ndarray  # (rows, k8 // 32) uint8

    @property
    def rows(self) -> int:
        return self.fp4.shape[0]

    @property
    def k4(self) -> int:
        return self.fp4.shape[-1] * 2

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


def _empty(rows: int, cols: int) -> jnp.ndarray:
    return jnp.zeros((rows, cols), jnp.uint8)


def quantize_mixed(x: jnp.ndarray, k4: int, k6: int, k8: int,
                   weight_fp4_only: bool = False) -> MixedTensor:
    """Quantize an already-permuted (rows, K) matrix into a MixedTensor.

    weight_fp4_only=True reproduces reorder_quantize_mxfp4_kernel
    (reorder.cu:271-432): all three segments use the MXFP4 grid but keep
    separate buffers/scales so segment widths match the activation's.
    """
    assert x.ndim == 2 and x.shape[-1] == k4 + k6 + k8, (x.shape, k4, k6, k8)
    rows = x.shape[0]
    x = x.astype(jnp.float32)

    def seg(lo, hi, fmt):
        if hi == lo:
            return _empty(rows, 0), _empty(rows, 0)
        return nx.quantize_blocks(x[:, lo:hi], fmt)

    f4 = FP4
    c4, s4 = seg(0, k4, f4)
    c6, s6 = seg(k4, k4 + k6, FP4 if weight_fp4_only else FP6)
    c8, s8 = seg(k4 + k6, k4 + k6 + k8, FP4 if weight_fp4_only else FP8)
    if weight_fp4_only:
        # fp4-grid codes stored unpacked in the fp6/fp8 slots' width... no:
        # keep layout identical to the mixed case so the matmul kernel sees
        # one layout. fp4-grid codes fit any container; widths stay k6/k8.
        pass
    return MixedTensor(
        fp4=nx.pack_fp4(c4) if k4 else _empty(rows, 0),
        fp6=c6, fp8=c8, sf4=s4, sf6=s6, sf8=s8,
    )


def dequantize_mixed(t: MixedTensor, weight_fp4_only: bool = False,
                     dtype=jnp.float32) -> jnp.ndarray:
    """MixedTensor -> dense (rows, K) in ``dtype`` (reference / test path)."""
    parts = []
    if t.k4:
        codes = nx.unpack_fp4(t.fp4)
        parts.append(nx.dequantize_blocks(codes, t.sf4, FP4))
    if t.k6:
        parts.append(nx.dequantize_blocks(t.fp6, t.sf6, FP4 if weight_fp4_only else FP6))
    if t.k8:
        parts.append(nx.dequantize_blocks(t.fp8, t.sf8, FP4 if weight_fp4_only else FP8))
    if not parts:
        return jnp.zeros((t.rows, 0), dtype)
    return jnp.concatenate(parts, axis=-1).astype(dtype)


def mixed_matmul_xla(a: MixedTensor, w: MixedTensor, *, w_fp4_only: bool = True,
                     out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Pure-XLA reference of the segmented mixed GEMM: Y = dq(A) @ dq(W)^T.

    The Pallas kernel (kernels/mixed_matmul.py) is tested against this.
    """
    assert a.segments() == w.segments(), (a.segments(), w.segments())
    ad = dequantize_mixed(a)
    wd = dequantize_mixed(w, weight_fp4_only=w_fp4_only)
    return jnp.dot(ad, wd.T, preferred_element_type=jnp.float32).astype(out_dtype)
