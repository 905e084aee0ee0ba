"""Quantized paged KV cache (token-minor TPU layout).

TPU equivalent of the FlashInfer paged_kv_t + per-(token, head) {scale,
zero} parameter cache (flashinfer/page.cuh:19-113, quantization.cuh:58-84),
re-laid-out for 128-lane vector hardware: **tokens run along the minor
(lane) axis**:

  * codes: (n_pages, n_kv_heads, dq, page_size) uint8, where dq = D/2 for
    int4 (head-dim split-plane: low nibble = dim i, high nibble = dim
    i + D/2) or D for int8.  page_size is a multiple of 128, so every page
    slice is lane-aligned for DMA and the dequantized (D, page_size) tile
    feeds the MXU directly as the K^T / V^T operand.
  * scale+zero: (n_pages, n_kv_heads, 2, page_size) bf16 per (token, head)
    — index 0 = scale, 1 = zero, asymmetric uint grid over the head_dim
    group, exactly quantize_int_group's semantics (qLlamaLayer.py:12-23) so
    the accuracy mode and the serving path share numerics.  Scale and zero
    share one array so the trailing (2, page_size) tile is always aligned
    to Mosaic's bf16 (2, 128) tiling regardless of n_kv_heads — and each
    page costs one DMA instead of two.
  * page_table: (max_seqs, max_pages_per_seq) int32; lengths: (max_seqs,).
  * free-page allocation is host-side (engine.py / native kvpool).

All update ops are functional (return a new cache pytree) and jittable.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PagedKVCache:
    k_codes: jnp.ndarray   # (P, Hkv, dq, ps) uint8
    v_codes: jnp.ndarray
    k_sz: jnp.ndarray      # (P, Hkv, 2, ps) bf16: [scale, zero]
    v_sz: jnp.ndarray
    page_table: jnp.ndarray  # (S, max_pages) int32
    lengths: jnp.ndarray     # (S,) int32
    bits: int = dataclasses.field(default=4, metadata=dict(static=True))

    @property
    def page_size(self) -> int:
        return self.k_codes.shape[3]

    @property
    def head_dim(self) -> int:
        d = self.k_codes.shape[2]
        return d * 2 if self.bits == 4 else d

    @property
    def is_dense(self) -> bool:
        """bits == 16: raw bf16 pages, no dequant (FlashInfer *_f16 mode)."""
        return self.bits == 16

    @property
    def n_kv_heads(self) -> int:
        return self.k_codes.shape[1]

    @property
    def max_pages_per_seq(self) -> int:
        return self.page_table.shape[1]


jax.tree_util.register_dataclass(
    PagedKVCache,
    data_fields=["k_codes", "v_codes", "k_sz", "v_sz", "page_table",
                 "lengths"],
    meta_fields=["bits"],
)


def make_cache(n_pages: int, page_size: int, n_kv: int, head_dim: int,
               max_seqs: int, max_pages_per_seq: int,
               bits: int = 4) -> PagedKVCache:
    """Tokens are the LANE (minor) axis of every page array, so the Pallas
    decode kernel's page DMAs and dequant tiles are lane-contiguous.  On
    real TPU hardware that requires page_size % 128 == 0 (Mosaic lane
    tiling); smaller pages work in interpreter mode / tests only.
    """
    assert bits in (4, 8, 16), bits
    dq = head_dim // 2 if bits == 4 else head_dim
    dt = jnp.bfloat16 if bits == 16 else jnp.uint8

    # distinct buffers per field: the engine donates cache args to its
    # jitted steps, and donating one buffer twice is an error
    def z8():
        return jnp.zeros((n_pages, n_kv, dq, page_size), dt)

    def zs():
        return jnp.zeros((n_pages, n_kv, 2, page_size), jnp.bfloat16)

    return PagedKVCache(
        k_codes=z8(), v_codes=z8(), k_sz=zs(), v_sz=zs(),
        page_table=jnp.zeros((max_seqs, max_pages_per_seq), jnp.int32),
        lengths=jnp.zeros((max_seqs,), jnp.int32), bits=bits)


def kv_quantize(x: jnp.ndarray, bits: int) -> Tuple[jnp.ndarray, jnp.ndarray,
                                                    jnp.ndarray]:
    """x (..., D) f32/bf16 -> (codes u8 (..., dq), scale (...), zero (...)).

    Asymmetric uint grid over the full head_dim (group = D), round-half-even
    — identical numerics to quantize_int_group (qLlamaLayer.py:12-23).
    """
    if bits == 16:  # dense mode: identity "quantization"
        ones = jnp.ones(x.shape[:-1], jnp.bfloat16)
        return x.astype(jnp.bfloat16), ones, jnp.zeros_like(ones)
    xf = x.astype(jnp.float32)
    gmax = jnp.max(xf, axis=-1, keepdims=True)
    gmin = jnp.min(xf, axis=-1, keepdims=True)
    qmax = float(2 ** bits - 1)
    scale = jnp.maximum(gmax - gmin, 1e-5) / qmax
    zero = jnp.clip(jnp.round(-gmin / scale), 0.0, qmax)
    q = jnp.clip(jnp.round(xf / scale) + zero, 0.0, qmax).astype(jnp.uint8)
    if bits == 4:
        d = x.shape[-1] // 2
        q = q[..., :d] | (q[..., d:] << 4)
    return q, scale[..., 0].astype(jnp.bfloat16), \
        zero[..., 0].astype(jnp.bfloat16)


def kv_dequantize_page(codes: jnp.ndarray, sz: jnp.ndarray, bits: int,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Token-minor pages: codes (..., dq, ps) + sz (..., 2, ps)
    -> values (..., D, ps)."""
    if bits == 16:
        return codes.astype(dtype)
    if bits == 4:
        lo = (codes & 0xF).astype(jnp.int32)
        hi = ((codes >> 4) & 0xF).astype(jnp.int32)
        q = jnp.concatenate([lo, hi], axis=-2)
    else:
        q = codes.astype(jnp.int32)
    scale = sz[..., 0:1, :].astype(jnp.float32)
    zero = sz[..., 1:2, :].astype(jnp.float32)
    return ((q.astype(jnp.float32) - zero) * scale).astype(dtype)


def _flat_slot_index(cache: PagedKVCache, seq_ids: jnp.ndarray,
                     positions: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    page_idx = positions // cache.page_size
    offset = positions % cache.page_size
    page_id = cache.page_table[seq_ids, page_idx]
    return page_id, offset


# Above this many tokens, append via one gather-scatter; at or below it,
# via an unrolled dynamic-update-slice chain per token.  The DUS form is
# the one that matters in the decode scan (T = batch): XLA aliases DUS
# chains in place, whereas the scatter (i) picks a transposed loop layout
# for the code buffers — the compiled 8B decode program converted every
# cache buffer {3,2,1,0}->{2,1,3,0} at entry/exit, 2.2 GB per dispatch —
# and (ii) forces one full-buffer aliasing copy per scan step (~1 GB/step
# at 8B scale, measured in the dumped TPU HLO).  Prefill-sized appends
# keep the scatter: thousands of sequential DUS ops would serialize.
_APPEND_DUS_MAX_T = 32


def append_kv(cache: PagedKVCache, seq_ids: jnp.ndarray, positions: jnp.ndarray,
              k: jnp.ndarray, v: jnp.ndarray, *,
              distinct_pages: bool = False) -> PagedKVCache:
    """Write T new tokens.  seq_ids/positions (T,), k/v (T, Hkv, D).

    Covers both prefill append and single-token decode append
    (page.cuh:120-293 AppendPagedKVCache{Prefill,Decode}).  The page table
    rows for these positions must already be populated (engine allocates
    pages host-side).  Updates lengths to positions+1 max per sequence.

    ``distinct_pages``: promise that tokens land on pairwise-distinct
    pages (up to scratch-page don't-cares) — true for decode steps, where
    each active slot appends one token into its own page.  Routes to the
    aliased Pallas append kernel on TPU (serve/append_kernel.py), which
    the decode scan needs to stay copy-free and op-lean.
    """
    kq, ks, kz = kv_quantize(k, cache.bits)   # (T, Hkv, dq), (T, Hkv)
    vq, vs, vz = kv_quantize(v, cache.bits)
    page_id, off = _flat_slot_index(cache, seq_ids, positions)
    ksz = jnp.stack([ks, kz], axis=-1)        # (T, Hkv, 2)
    vsz = jnp.stack([vs, vz], axis=-1)
    t = kq.shape[0]
    lengths = cache.lengths.at[seq_ids].max(positions + 1)
    from .append_kernel import APPEND_KERNEL_MAX_T, append_kv_kernel
    if distinct_pages and t <= APPEND_KERNEL_MAX_T \
            and jax.default_backend() != "cpu":
        # one aliased Pallas call (4T column DMAs): no scan-carry copies,
        # no layout preference, no per-token op chain (perf_notes r3)
        kc, vc, ksb, vsb = append_kv_kernel(
            cache.k_codes, cache.v_codes, cache.k_sz, cache.v_sz,
            page_id, off, kq, vq, ksz, vsz)
        return dataclasses.replace(cache, k_codes=kc, v_codes=vc,
                                   k_sz=ksb, v_sz=vsb, lengths=lengths)
    if t <= _APPEND_DUS_MAX_T:
        kc, vc, ksb, vsb = (cache.k_codes, cache.v_codes,
                            cache.k_sz, cache.v_sz)
        z = jnp.int32(0)
        for i in range(t):
            p, o = page_id[i], off[i]
            kc = jax.lax.dynamic_update_slice(
                kc, kq[i][None, :, :, None], (p, z, z, o))
            vc = jax.lax.dynamic_update_slice(
                vc, vq[i][None, :, :, None], (p, z, z, o))
            ksb = jax.lax.dynamic_update_slice(
                ksb, ksz[i][None, :, :, None], (p, z, z, o))
            vsb = jax.lax.dynamic_update_slice(
                vsb, vsz[i][None, :, :, None], (p, z, z, o))
        new = dataclasses.replace(cache, k_codes=kc, v_codes=vc,
                                  k_sz=ksb, v_sz=vsb)
    else:
        # scatter one lane column per token: index pattern (page, :, :, off)
        new = dataclasses.replace(
            cache,
            k_codes=cache.k_codes.at[page_id, :, :, off].set(kq),
            v_codes=cache.v_codes.at[page_id, :, :, off].set(vq),
            k_sz=cache.k_sz.at[page_id, :, :, off].set(ksz),
            v_sz=cache.v_sz.at[page_id, :, :, off].set(vsz),
        )
    return dataclasses.replace(new, lengths=lengths)


def gather_kv(cache: PagedKVCache, seq_id, max_len: int,
              dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dequantize one sequence's KV to dense (max_len, Hkv, D) (test path)."""
    ps = cache.page_size
    n_pages = max_len // ps
    pages = cache.page_table[seq_id, :n_pages]
    k = kv_dequantize_page(cache.k_codes[pages], cache.k_sz[pages],
                           cache.bits, dtype)
    v = kv_dequantize_page(cache.v_codes[pages], cache.v_sz[pages],
                           cache.bits, dtype)
    # (n_pages, Hkv, D, ps) -> (n_pages * ps, Hkv, D)
    k = k.transpose(0, 3, 1, 2).reshape(n_pages * ps, cache.n_kv_heads,
                                        cache.head_dim)
    v = v.transpose(0, 3, 1, 2).reshape(n_pages * ps, cache.n_kv_heads,
                                        cache.head_dim)
    return k, v


# Backwards-compatible dense dequant for (..., dq) code layouts (tests).
def kv_dequantize(codes: jnp.ndarray, scale: jnp.ndarray, zero: jnp.ndarray,
                  bits: int, dtype=jnp.bfloat16) -> jnp.ndarray:
    """codes (..., dq) token-major -> (..., D)."""
    if bits == 16:
        return codes.astype(dtype)
    if bits == 4:
        lo = (codes & 0xF).astype(jnp.int32)
        hi = ((codes >> 4) & 0xF).astype(jnp.int32)
        q = jnp.concatenate([lo, hi], axis=-1)
    else:
        q = codes.astype(jnp.int32)
    return ((q.astype(jnp.float32) - zero.astype(jnp.float32)[..., None])
            * scale.astype(jnp.float32)[..., None]).astype(dtype)
