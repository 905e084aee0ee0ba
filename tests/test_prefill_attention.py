"""Paged chunked-prefill attention kernel vs the dense-gather reference.

The reference math is exactly round-1's runner.prefill history path:
gather_kv-dequantized history concatenated with the chunk's K/V under the
[history | causal] mask.  The kernel must reproduce it (same quantized
values, same masking) within flash-recurrence tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micromix_tpu.models.common import attention, causal_mask
from micromix_tpu.serve.kv_cache import append_kv, gather_kv, make_cache
from micromix_tpu.serve.prefill_attention import paged_prefill_attention


def _build(rng, *, hist, s, hkv, d, bits=4, ps=16, seq_id=1, window=None):
    n_pages = 64
    cache = make_cache(n_pages, ps, hkv, d, max_seqs=4, max_pages_per_seq=16,
                       bits=bits)
    # simple identity-ish page table rows so pages don't collide
    table = np.zeros((4, 16), np.int32)
    table[seq_id] = np.arange(16) + 1
    cache = cache.__class__(**{**cache.__dict__,
                               "page_table": jnp.asarray(table)})
    if hist:
        kh = jnp.asarray(rng.normal(0, 1, (hist, hkv, d)), jnp.bfloat16)
        vh = jnp.asarray(rng.normal(0, 1, (hist, hkv, d)), jnp.bfloat16)
        cache = append_kv(cache, jnp.full((hist,), seq_id, jnp.int32),
                          jnp.arange(hist), kh, vh)
    return cache


def _ref(q, kc, vc, cache, seq_id, start, window):
    s = q.shape[0]
    hist_gather = (start + cache.page_size - 1) // cache.page_size \
        * cache.page_size
    mask = causal_mask(s, s, window)
    if hist_gather:
        kh, vh = gather_kv(cache, seq_id, hist_gather)
        k_full = jnp.concatenate([kh, kc], axis=0)
        v_full = jnp.concatenate([vh, vc], axis=0)
        qi = start + jnp.arange(s)[:, None]
        kj = jnp.arange(hist_gather)[None, :]
        allow = kj < start
        if window is not None:
            allow = jnp.logical_and(allow, kj > qi - window)
        mask = jnp.concatenate(
            [jnp.broadcast_to(allow, (s, hist_gather)), mask], axis=1)
    else:
        k_full, v_full = kc, vc
    return attention(q[None], k_full[None], v_full[None], mask)[0]


@pytest.mark.parametrize("hist,s,bits", [
    (0, 32, 4),        # no history: pure in-chunk causal
    (24, 32, 4),       # partial page of history
    (48, 32, 4),       # multiple pages
    (48, 32, 8),       # int8 pages
    (48, 32, 16),      # dense bf16 pages
])
def test_matches_dense_gather_reference(rng, hist, s, bits):
    hkv, h, d = 2, 4, 64
    cache = _build(rng, hist=hist, s=s, hkv=hkv, d=d, bits=bits)
    q = jnp.asarray(rng.normal(0, 1, (s, h, d)), jnp.bfloat16)
    kc = jnp.asarray(rng.normal(0, 1, (s, hkv, d)), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(0, 1, (s, hkv, d)), jnp.bfloat16)
    start = jnp.int32(hist)
    out = paged_prefill_attention(q, kc, vc, cache, jnp.int32(1), start,
                                  interpret=True)
    ref = _ref(q, kc, vc, cache, jnp.int32(1), hist, None)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-3)


def test_sliding_window(rng):
    hkv, h, d, hist, s, w = 2, 4, 64, 48, 32, 40
    cache = _build(rng, hist=hist, s=s, hkv=hkv, d=d)
    q = jnp.asarray(rng.normal(0, 1, (s, h, d)), jnp.bfloat16)
    kc = jnp.asarray(rng.normal(0, 1, (s, hkv, d)), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(0, 1, (s, hkv, d)), jnp.bfloat16)
    out = paged_prefill_attention(q, kc, vc, cache, jnp.int32(1),
                                  jnp.int32(hist), sliding_window=w,
                                  interpret=True)
    ref = _ref(q, kc, vc, cache, jnp.int32(1), hist, w)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-3)


def test_ragged_chunk(rng):
    """Chunk length not a multiple of the block size (padded internally)."""
    hkv, h, d, hist, s = 2, 4, 64, 16, 23
    cache = _build(rng, hist=hist, s=s, hkv=hkv, d=d)
    q = jnp.asarray(rng.normal(0, 1, (s, h, d)), jnp.bfloat16)
    kc = jnp.asarray(rng.normal(0, 1, (s, hkv, d)), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(0, 1, (s, hkv, d)), jnp.bfloat16)
    out = paged_prefill_attention(q, kc, vc, cache, jnp.int32(1),
                                  jnp.int32(hist), interpret=True)
    assert out.shape == (s, h, d)
    ref = _ref(q, kc, vc, cache, jnp.int32(1), hist, None)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-3)
