"""Multi-chip SPMD: mesh construction, TP/DP/EP sharded forward.

Net-new scope relative to the reference (SURVEY §2.5: it has no real
distribution — only one-GPU-at-a-time layer placement,
model/parallel_utils.py:89-163).  Design per the north star: weights and KV
tensor-sharded over a `jax.sharding.Mesh`, XLA collectives over ICI via
`shard_map`, expert sharding for Mixtral.
"""

from .mesh import make_mesh
from .spmd import (
    sharded_quantized_forward,
    shard_quantized_params,
    tp_validate_config,
)
from .moe_ep import (ep_moe_forward, ep_moe_forward_hetero,
                     ep_moe_forward_quant, stack_dense_experts,
                     stack_hetero_experts, stack_quant_experts)
from .ep_serve import make_ep_engine, quantize_model_ep
from .pp import make_pp_mesh, pipeline_parallel_forward, stack_layers
from .sp import sequence_parallel_forward
from .tp_quant import (
    quantize_model_tp,
    shard_params_tp,
    sharded_forward_tp,
    split_site_calibration,
)
from .tp_hetero import (
    quantize_model_tp_hetero,
    shard_params_tp_hetero,
    sharded_forward_tp_hetero,
    split_site_calibration_hetero,
)

__all__ = [
    "make_mesh", "sharded_quantized_forward", "shard_quantized_params",
    "tp_validate_config", "ep_moe_forward", "stack_dense_experts",
    "ep_moe_forward_quant", "stack_quant_experts",
    "ep_moe_forward_hetero", "stack_hetero_experts",
    "make_ep_engine", "quantize_model_ep",
    "pipeline_parallel_forward", "make_pp_mesh", "stack_layers",
    "sequence_parallel_forward",
    "quantize_model_tp", "shard_params_tp", "sharded_forward_tp",
    "split_site_calibration",
    "quantize_model_tp_hetero", "shard_params_tp_hetero",
    "sharded_forward_tp_hetero", "split_site_calibration_hetero",
]
