"""KV page-pool / page-table manager: native C++ core with Python fallback.

Host-runtime component backing the continuous-batching engine: owns the
page free-list and per-slot page tables whose rows become the Pallas
decode-attention kernel's scalar-prefetch operand.  The native core
(native/kvpool.cpp, built to libkvpool.so) is the TPU-side analog of the
host bookkeeping around the reference's FlashInfer ``paged_kv_t``
(mgemm/include/flashinfer/page.cuh:19-113); the pure-Python fallback keeps
the framework importable without a compiler.

Semantics (identical in both backends, locked by tests/test_block_manager):
  * page 0 is reserved scratch (inactive slots point at it)
  * LIFO reuse of freed pages
  * all-or-nothing extension; ``ensure`` raises on pool exhaustion /
    per-sequence cap without mutating state
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")),
    "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libkvpool.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR, "libkvpool.so"],
                               check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        i64 = ctypes.c_int64
        lib.kvpool_create.argtypes = [i64, i64, i64, i64]
        lib.kvpool_create.restype = ctypes.c_void_p
        lib.kvpool_destroy.argtypes = [ctypes.c_void_p]
        lib.kvpool_ensure.argtypes = [ctypes.c_void_p, i64, i64]
        lib.kvpool_ensure.restype = i64
        lib.kvpool_release.argtypes = [ctypes.c_void_p, i64]
        lib.kvpool_free_count.argtypes = [ctypes.c_void_p]
        lib.kvpool_free_count.restype = i64
        lib.kvpool_pages.argtypes = [ctypes.c_void_p, i64,
                                     ctypes.POINTER(ctypes.c_int32)]
        lib.kvpool_pages.restype = i64
        _lib = lib
        return _lib


def native_kvpool_available() -> bool:
    return _load() is not None


class BlockManager:
    """Page allocator for ``max_seqs`` sequence slots over ``n_pages``."""

    def __init__(self, n_pages: int, page_size: int, max_seqs: int,
                 max_pages_per_seq: int, *, use_native: Optional[bool] = None):
        assert n_pages >= 2 and page_size >= 1
        self.n_pages = n_pages
        self.page_size = page_size
        self.max_seqs = max_seqs
        self.max_pages_per_seq = max_pages_per_seq
        lib = _load() if use_native in (None, True) else None
        if use_native is True and lib is None:
            raise RuntimeError("native kvpool requested but unavailable")
        self._lib = lib
        if lib is not None:
            self._h = lib.kvpool_create(n_pages, page_size, max_seqs,
                                        max_pages_per_seq)
            assert self._h, "kvpool_create failed"
        else:
            self._free: List[int] = list(range(n_pages - 1, 0, -1))
            self._pages: List[List[int]] = [[] for _ in range(max_seqs)]

    @property
    def is_native(self) -> bool:
        return self._lib is not None

    @property
    def num_free(self) -> int:
        if self._lib is not None:
            return int(self._lib.kvpool_free_count(self._h))
        return len(self._free)

    def num_pages(self, slot: int) -> int:
        if self._lib is not None:
            row = (ctypes.c_int32 * self.max_pages_per_seq)()
            return int(self._lib.kvpool_pages(self._h, slot, row))
        return len(self._pages[slot])

    def ensure(self, slot: int, tokens: int) -> np.ndarray:
        """Grow slot to cover ``tokens`` tokens; return its padded table row.

        Raises RuntimeError on exhaustion / per-seq cap (state unchanged).
        """
        if self._lib is not None:
            n = int(self._lib.kvpool_ensure(self._h, slot, tokens))
            if n < 0:
                raise RuntimeError("KV page pool exhausted")
            return self.table_row(slot)
        need = -(-tokens // self.page_size)
        pages = self._pages[slot]
        if need > self.max_pages_per_seq or \
                need - len(pages) > len(self._free):
            raise RuntimeError("KV page pool exhausted")
        while len(pages) < need:
            pages.append(self._free.pop())
        return self.table_row(slot)

    def release(self, slot: int) -> None:
        if self._lib is not None:
            self._lib.kvpool_release(self._h, slot)
            return
        self._free.extend(self._pages[slot])
        self._pages[slot] = []

    def table_row(self, slot: int) -> np.ndarray:
        """(max_pages_per_seq,) int32, padded with scratch page 0."""
        if self._lib is not None:
            row = (ctypes.c_int32 * self.max_pages_per_seq)()
            n = int(self._lib.kvpool_pages(self._h, slot, row))
            assert n >= 0, slot
            return np.ctypeslib.as_array(row).copy()
        out = np.zeros((self.max_pages_per_seq,), np.int32)
        pages = self._pages[slot]
        out[:len(pages)] = pages
        return out

    def __del__(self):
        lib = getattr(self, "_lib", None)
        h = getattr(self, "_h", None)
        if lib is not None and h:
            lib.kvpool_destroy(h)


__all__ = ["BlockManager", "native_kvpool_available"]
