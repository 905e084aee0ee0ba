"""Pallas TPU kernels: the performance path of micromix_tpu.

Replaces the reference's CUDA kernel library ``mixedgemm``
(mgemm/src/*.cu) with TPU-native fused kernels, plus the attention
kernels the reference delegated to HF SDPA / FlashInfer.
"""

from .flash_attention import flash_attention, flash_attention_hsd
from .mixed_matmul import mixed_matmul

__all__ = ["mixed_matmul", "flash_attention", "flash_attention_hsd"]
