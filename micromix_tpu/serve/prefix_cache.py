"""Automatic prefix caching: shared KV pages for common prompt prefixes.

vLLM-style prefix caching re-expressed for this engine's paged quantized
KV cache (net-new vs the reference, which has no serving loop at all —
SURVEY.md §1).  Key observations that make sharing sound here:

  * page content is deterministic given the token prefix AND the
    producer's chunk boundaries: K is stored post-RoPE at ABSOLUTE
    positions and the quantization is deterministic, but hidden states
    of later layers see exact bf16 K/V in-chunk vs quantized K/V across
    chunks, so pages produced under different chunkings (or filled by
    decode) agree only to quantization-level noise.  Replay therefore
    serves approximately-equal KV — the same semantics every chunked
    prefill and decode step already has,
  * prefill chunks never write before ``start_pos``, and bucket padding
    spills only into the slot's own freshly-allocated pages — an attached
    shared page is never written again,
  * the chunked-prefill machinery already knows how to START a prefill at
    an arbitrary page-aligned position attending over cached history
    (runner.prefill hist_len / the paged Pallas history kernel), so a
    cache hit simply becomes "prefill from position ``matched``".

Identity of a cached page is its CHAIN key ``(parent_page_id,
chunk_token_bytes)`` — the parent's physical id transitively pins the
whole prefix, so no cryptographic hashing is needed and collisions are
impossible while the parent stays registered (first writer wins;
duplicate concurrent prefills keep the holder's page).  Eviction
unregisters a page and (transitively) orphans its children from the
match map; orphans
still referenced by running slots stay valid — they just stop being
matchable — and return to the free list on release.

Numerics note: a cache hit makes the request attend to the QUANTIZED
cached prefix (exactly like any chunked prefill / decode step does),
whereas a cold single-shot prefill attends to the exact bf16 K/V of its
own chunk.  Outputs therefore match the chunked-prefill semantics, not
bit-for-bit the single-shot path — the engine keeps the feature opt-in
(``Engine(prefix_cache=True)``, ``serve --prefix-cache``).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from .block_manager import BlockManager

Key = Tuple[int, bytes]


class PrefixBlockManager(BlockManager):
    """BlockManager with content-addressed page sharing + LRU eviction.

    Uses the Python page-list backend (sharing violates the native pool's
    single-owner invariant).  Reference counts track how many slot rows
    hold each page; registered pages with refcount 0 are EVICTABLE —
    they stay matchable until pool pressure reclaims them (LRU).
    """

    def __init__(self, n_pages: int, page_size: int, max_seqs: int,
                 max_pages_per_seq: int, **_ignored):
        super().__init__(n_pages, page_size, max_seqs, max_pages_per_seq,
                         use_native=False)
        self._map: Dict[Key, int] = {}
        self._meta: Dict[int, Key] = {}          # page -> its map key
        self._children: Dict[int, Set[int]] = {}  # page -> child pages
        self._ref: Dict[int, int] = {}           # page -> live references
        self._evictable: "OrderedDict[int, None]" = OrderedDict()

    # ---------------- internals ----------------

    def _chunk_key(self, parent: int, tokens: Sequence[int],
                   i: int) -> Key:
        chunk = tokens[i * self.page_size:(i + 1) * self.page_size]
        return (parent, np.asarray(chunk, np.int32).tobytes())

    def _unregister(self, page: int) -> None:
        """Drop ``page`` from the match map; orphan its children."""
        key = self._meta.pop(page, None)
        if key is not None and self._map.get(key) == page:
            del self._map[key]
        for child in self._children.pop(page, set()):
            if child in self._meta:
                self._unregister(child)
                # an orphan nobody references is immediately reclaimable
                if child in self._evictable:
                    del self._evictable[child]
                    self._free.append(child)

    def _reclaim(self, n: int) -> bool:
        """Evict LRU cached pages until ``n`` pages are free."""
        while len(self._free) < n and self._evictable:
            page, _ = self._evictable.popitem(last=False)
            self._unregister(page)
            self._free.append(page)
        return len(self._free) >= n

    # ---------------- BlockManager surface ----------------

    @property
    def num_free(self) -> int:
        # evictable pages are reclaimable on demand
        return len(self._free) + len(self._evictable)

    def ensure(self, slot: int, tokens: int) -> np.ndarray:
        need = -(-tokens // self.page_size)
        pages = self._pages[slot]
        grow = need - len(pages)
        if need > self.max_pages_per_seq or \
                (grow > 0 and not self._reclaim(grow)):
            raise RuntimeError("KV page pool exhausted")
        while len(pages) < need:
            p = self._free.pop()
            self._ref[p] = self._ref.get(p, 0) + 1
            pages.append(p)
        return self.table_row(slot)

    def release(self, slot: int) -> None:
        for p in self._pages[slot]:
            self._ref[p] = self._ref.get(p, 1) - 1
            if self._ref[p] > 0:
                continue
            del self._ref[p]
            if p in self._meta:
                self._evictable[p] = None   # stays matchable until pressure
            else:
                self._free.append(p)
        self._pages[slot] = []

    # ---------------- prefix-cache surface ----------------

    def match_and_attach(self, slot: int, tokens: Sequence[int]) -> int:
        """Attach the longest cached page chain matching ``tokens``.

        Returns the number of tokens covered (page-aligned); at least the
        LAST context token always stays unmatched so prefill can produce
        next-token logits.  The slot must hold no pages yet.
        """
        assert not self._pages[slot], "match before any allocation"
        limit = min((len(tokens) - 1) // self.page_size,
                    self.max_pages_per_seq)
        chain: List[int] = []
        parent = -1
        for i in range(limit):
            page = self._map.get(self._chunk_key(parent, tokens, i))
            if page is None:
                break
            chain.append(page)
            parent = page
        for p in chain:
            self._ref[p] = self._ref.get(p, 0) + 1
            self._evictable.pop(p, None)
        self._pages[slot] = chain
        return len(chain) * self.page_size

    def register_prefix(self, slot: int, tokens: Sequence[int],
                        covered: int) -> None:
        """Make the slot's full pages over ``tokens[:covered]`` matchable.

        Called after each prefill chunk; idempotent (already-registered
        pages are skipped).  Pages whose chain key is already mapped to a
        DIFFERENT physical page (a concurrent duplicate prefill) stay
        unregistered and simply return to the free list on release.
        """
        pages = self._pages[slot]
        full = min(covered // self.page_size, len(pages))
        parent = -1
        for i in range(full):
            page = pages[i]
            if page in self._meta:       # already registered
                parent = page
                continue
            key = self._chunk_key(parent, tokens, i)
            holder = self._map.get(key)
            if holder is not None:       # duplicate content, keep holder
                parent = holder
                continue
            self._map[key] = page
            self._meta[page] = key
            if parent >= 0:
                self._children.setdefault(parent, set()).add(page)
            parent = page


__all__ = ["PrefixBlockManager"]
