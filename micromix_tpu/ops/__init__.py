"""XLA-level fused quantization ops (the host-facing op layer).

TPU re-expression of the mixedgemm op surface (mgemm/src/bindings.cpp:682-742):
reorder_quantize_x, rmsnorm_quantize_x, activate_quantize_x, matmul — here as
jit-fusable JAX functions.  The channel gather, norm, and activation epilogues
are XLA elementwise/gather ops (XLA fuses them into one HBM pass); the
block-structured quantize and the segmented matmul are Pallas kernels.
"""

from .quantize_ops import (
    activation_quantize,
    reorder_quantize_x,
    rmsnorm_quantize_x,
    silu_mul_quantize_x,
)
from ..kernels.mixed_matmul import mixed_matmul
from ..kernels.quantize import quantize_mixed_pallas

__all__ = [
    "reorder_quantize_x", "rmsnorm_quantize_x", "silu_mul_quantize_x",
    "activation_quantize", "mixed_matmul", "quantize_mixed_pallas",
]
