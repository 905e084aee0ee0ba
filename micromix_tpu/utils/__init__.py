"""Utilities: native host-quantizer bindings, profiling, serialization."""

from .native import native_available, quantize_mixed_host

__all__ = ["native_available", "quantize_mixed_host"]
