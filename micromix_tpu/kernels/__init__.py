"""Pallas TPU kernels: the performance path of micromix_tpu.

Replaces the reference's CUDA kernel library ``mixedgemm``
(mgemm/src/*.cu) with TPU-native fused kernels, plus the attention
kernels the reference delegated to HF SDPA / FlashInfer.
"""

from .flash_attention import flash_attention, flash_attention_hsd
from .mixed_matmul import (
    mixed_matmul,
    mixed_matmul_sp_stack,
    mixed_matmul_w8_grouped,
    mixed_matmul_w8_pair,
    mixed_matmul_w8_site,
    mixed_matmul_w8_stack,
)

__all__ = [
    "mixed_matmul",
    "mixed_matmul_w8_site",
    "mixed_matmul_w8_stack",
    "mixed_matmul_sp_stack",
    "mixed_matmul_w8_grouped",
    "mixed_matmul_w8_pair",
    "flash_attention",
    "flash_attention_hsd",
]
