"""Quantized model zoo: Llama / Qwen2 / Mixtral as functional JAX modules."""

from .common import (
    DenseLinear,
    Int8TurboLinear,
    ModelConfig,
    QuantLinear,
    QuantSite,
    WeightOnlyLinear,
    quantize_int_group,
)
from .surgery import (
    ATTN_IN,
    DOWN_IN,
    MLP_IN,
    O_IN,
    LayerCalib,
    SiteCalibration,
    default_calibration,
    identity_calibration,
    quantize_linear,
    quantize_model,
    quantize_model_int8_turbo,
    quantize_model_weight_only,
    random_dense_params,
)
from .checkpoint import load_params, save_params
from .transformer import forward

__all__ = [
    "ModelConfig", "DenseLinear", "QuantLinear", "QuantSite",
    "quantize_int_group", "forward",
    "SiteCalibration", "LayerCalib", "identity_calibration",
    "default_calibration", "quantize_linear", "quantize_model",
    "quantize_model_weight_only", "quantize_model_int8_turbo",
    "WeightOnlyLinear", "Int8TurboLinear",
    "random_dense_params",
    "ATTN_IN", "O_IN", "MLP_IN", "DOWN_IN",
    "save_params", "load_params",
]
