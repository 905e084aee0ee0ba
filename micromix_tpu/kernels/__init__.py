"""Pallas TPU kernels: the performance path of micromix_tpu.

Replaces the reference's CUDA kernel library ``mixedgemm``
(mgemm/src/*.cu) with TPU-native fused kernels.
"""

from .mixed_matmul import mixed_matmul

__all__ = ["mixed_matmul"]
