"""Utilities: native host-quantizer bindings, profiling, serialization."""

from .native import native_available, quantize_mixed_host
from .profiling import annotate, hlo_dump_env, marginal_timer, trace

__all__ = [
    "native_available", "quantize_mixed_host",
    "trace", "annotate", "hlo_dump_env", "marginal_timer",
]
