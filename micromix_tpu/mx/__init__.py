"""MX (OCP Microscaling) core numerics: formats, quantize/dequantize, packing."""

from .formats import BLOCK_SIZE, FP4, FP6, FP8, FORMATS, SEGMENT_ALIGN, FormatInfo
from .mxtensor import (MixedTensor, SplitPlaneStack, dequantize_mixed,
                       mixed_matmul_xla, quantize_mixed, stack_split_plane)
from .numerics import (
    block_scale_exponent,
    ceil_log2,
    decode,
    decode_packed_fp4,
    dequantize_blocks,
    encode,
    exp2i,
    fakequant_blocks,
    pack_fp4,
    quantize_blocks,
    quantize_to_grid,
    unpack_fp4,
)

__all__ = [
    "BLOCK_SIZE", "SEGMENT_ALIGN", "FP4", "FP6", "FP8", "FORMATS", "FormatInfo",
    "MixedTensor", "quantize_mixed", "dequantize_mixed", "mixed_matmul_xla",
    "quantize_blocks", "dequantize_blocks", "fakequant_blocks",
    "quantize_to_grid", "encode", "decode", "pack_fp4", "unpack_fp4",
    "decode_packed_fp4", "exp2i", "ceil_log2", "block_scale_exponent",
]
