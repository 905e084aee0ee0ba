"""micromix_tpu — TPU-native mixed-precision microscaling (MX) LLM inference.

A from-scratch JAX/Pallas re-design of the capabilities of lwy2020/MicroMix
(arXiv:2508.02343): per-input-channel MXFP4/MXFP6/MXFP8 precision allocation
with UE8M0 block scales, fused reorder+quantize kernels, segmented
block-scaled matmuls on the MXU, a quantized model zoo (Llama / Qwen2 /
Mixtral), calibration, evaluation, serving, and multi-chip sharding.
"""

__version__ = "0.1.0"

from . import mx  # noqa: F401
