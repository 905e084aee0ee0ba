"""Serving: quantized paged KV cache, decode attention, continuous batching.

TPU re-design of the reference's FlashInfer INT4 paged-KV serving track
(mgemm/include/flashinfer/, bound at bindings.cpp:682-742 but never wired
into the model code — SURVEY §1 'key structural fact').  Here it is a
first-class, tested path: Pallas decode attention over int4/int8 pages,
slot-based continuous batching, and sampling.
"""

from .kv_cache import PagedKVCache, kv_dequantize, kv_quantize
from .attention import paged_decode_attention, paged_decode_attention_xla
from .sampling import sample
from .engine import Engine, Request

__all__ = [
    "PagedKVCache", "kv_quantize", "kv_dequantize",
    "paged_decode_attention", "paged_decode_attention_xla",
    "sample", "Engine", "Request",
]
from .router import Router  # noqa: E402,F401
from .api import ApiServer  # noqa: E402,F401
