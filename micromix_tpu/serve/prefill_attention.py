"""Paged chunked-prefill attention: quantized history + in-chunk causal.

The reference's missing serving driver implies a prefill-append path over
the paged cache (mgemm/include/flashinfer/prefill.cuh:1-408 is its CUDA
analog).  Round 1 approximated it by dense-gathering the WHOLE history per
layer per chunk (runner.py gather_kv + masked XLA attention): total work
quadratic in prompt length with a full-dequant constant.  This kernel reads
the quantized pages directly, once per chunk, with online softmax:

  * grid (Hkv, S/BQ): one program owns all G query heads of one kv head
    for one (BQ, D) query tile — GQA batched into a single (G*BQ, D) MXU
    operand like the decode kernel
  * phase 1 walks the history pages [window floor, cdiv(start_pos, ps))
    with double-buffered DMA + on-the-fly int4/int8 dequant
    (serve/attention.py machinery), masking entries >= start_pos
  * phase 2 walks the in-chunk K/V (VMEM-resident, bounded by the prefill
    chunk size) with the causal/sliding-window mask
  * both phases fold into one flash max/denominator recurrence, so history
    and chunk attention merge exactly (state.cuh:17-68 semantics)

Cost per chunk is O(history + chunk) page reads — chunked prefill over a
long prompt is linear-ish in prompt length instead of quadratic-dequant.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _dequant_head
from .kv_cache import PagedKVCache

_NEG = -1e30


def _prefill_kernel(
    page_tbl, start_ref,          # scalar prefetch (SMEM)
    q_ref, kchunk_ref, vchunk_ref,  # VMEM blocks
    kc, vc, ksz, vsz,             # full cache arrays (ANY/HBM)
    out_ref,                      # (1, G, BQ, D) VMEM
    kbuf, vbuf, kszb, vszb, sem,  # scratch (double-buffered pages)
    *, bits: int, page_size: int, g: int, d: int, bq: int, bk: int,
    s_chunk: int, window: Optional[int],
):
    kv_h = pl.program_id(0)
    iq = pl.program_id(1)
    start = start_ref[0]
    scale = 1.0 / (d ** 0.5)
    q = q_ref[0].reshape(g * bq, d).astype(jnp.float32) * scale

    # per-row positions: row r of the flattened (G*BQ) tile is chunk-local
    # query index iq*bq + (r % bq); global position adds start
    r_local = iq * bq + (
        jax.lax.broadcasted_iota(jnp.int32, (g * bq, page_size), 0) % bq)

    acc0 = jnp.zeros((g * bq, d), jnp.float32)
    m0 = jnp.full((g * bq,), _NEG, jnp.float32)
    den0 = jnp.zeros((g * bq,), jnp.float32)

    # ---------------- phase 1: quantized history pages ----------------
    hp = pl.cdiv(start, page_size)
    if window is None:
        p0 = jnp.int32(0)
    else:
        # smallest kpos any row of this tile can see
        p0 = jnp.maximum((start + iq * bq - window + 1) // page_size, 0)

    def dma(slot, p_idx):
        pid = page_tbl[p_idx]
        copies = [
            pltpu.make_async_copy(kc.at[pid, kv_h], kbuf.at[slot],
                                  sem.at[slot, 0]),
            pltpu.make_async_copy(vc.at[pid, kv_h], vbuf.at[slot],
                                  sem.at[slot, 1]),
        ]
        if bits != 16:
            copies += [
                pltpu.make_async_copy(ksz.at[pid, kv_h], kszb.at[slot],
                                      sem.at[slot, 2]),
                pltpu.make_async_copy(vsz.at[pid, kv_h], vszb.at[slot],
                                      sem.at[slot, 3]),
            ]
        return copies

    @pl.when(hp > p0)
    def _():
        for c in dma(p0 % 2, p0):
            c.start()

    def hist_body(p, carry):
        acc, m, den = carry
        slot = p % 2

        @pl.when(p + 1 < hp)
        def _():
            for c in dma((p + 1) % 2, p + 1):
                c.start()

        for c in dma(slot, p):
            c.wait()

        k_h = _dequant_head(kbuf[slot], kszb[slot], bits)      # (D, ps)
        v_h = _dequant_head(vbuf[slot], vszb[slot], bits)
        s = jax.lax.dot_general(
            q, k_h, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (G*BQ, ps)
        kpos = p * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (g * bq, page_size), 1)
        allow = kpos < start
        if window is not None:
            allow = jnp.logical_and(allow, kpos > start + r_local - window)
        s = jnp.where(allow, s, _NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        corr = jnp.exp(m - m_new)
        e = jnp.exp(s - m_new[:, None])
        den = den * corr + jnp.sum(e, axis=-1)
        pv = jax.lax.dot_general(
            e, v_h, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # (G*BQ, D)
        acc = acc * corr[:, None] + pv
        return acc, m_new, den

    acc, m, den = jax.lax.fori_loop(p0, hp, hist_body, (acc0, m0, den0))

    # ---------------- phase 2: in-chunk causal tiles ----------------
    row = iq * bq + (
        jax.lax.broadcasted_iota(jnp.int32, (g * bq, bk), 0) % bq)
    hi = (iq * bq + bq - 1) // bk + 1
    if window is None:
        lo = jnp.int32(0)
    else:
        lo = jnp.maximum((iq * bq - window + 1) // bk, 0)

    def chunk_body(jk, carry):
        acc, m, den = carry
        k = kchunk_ref[0, pl.ds(jk * bk, bk), :].astype(jnp.float32)
        v = vchunk_ref[0, pl.ds(jk * bk, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # (G*BQ, BK)
        col = jk * bk + jax.lax.broadcasted_iota(
            jnp.int32, (g * bq, bk), 1)
        allow = col <= row
        if window is not None:
            allow = jnp.logical_and(allow, col > row - window)
        s = jnp.where(allow, s, _NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        corr = jnp.exp(m - m_new)
        e = jnp.exp(s - m_new[:, None])
        den = den * corr + jnp.sum(e, axis=-1)
        pv = jax.lax.dot_general(
            e, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc * corr[:, None] + pv
        return acc, m_new, den

    acc, m, den = jax.lax.fori_loop(lo, hi, chunk_body, (acc, m, den))
    out = acc / jnp.maximum(den, 1e-30)[:, None]
    out_ref[0] = out.reshape(g, bq, d).astype(out_ref.dtype)


def _pick_bq(s: int) -> int:
    for b in (512, 256, 128, 64, 32, 16, 8):
        if s % b == 0:
            return min(b, s)
    return min(512, (s + 7) // 8 * 8)


def paged_prefill_attention(q: jnp.ndarray, k_chunk: jnp.ndarray,
                            v_chunk: jnp.ndarray, cache: PagedKVCache,
                            seq_id: jnp.ndarray, start_pos: jnp.ndarray, *,
                            sliding_window: Optional[int] = None,
                            block_q: Optional[int] = None,
                            interpret: Optional[bool] = None) -> jnp.ndarray:
    """Chunk attention over quantized history + in-chunk causal.

    q (S, H, D) post-RoPE queries at global positions
    [start_pos, start_pos+S); k_chunk/v_chunk (S, Hkv, D) the chunk's own
    post-RoPE K/V (exact bf16 — in-chunk attention does NOT requantize,
    matching runner.prefill's semantics); cache holds the quantized
    history for ``seq_id`` (positions < start_pos).  Returns (S, H, D).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    s, h, d = q.shape
    hkv = k_chunk.shape[1]
    g = h // hkv
    ps = cache.page_size
    if not interpret and ps % 128 != 0:
        raise ValueError("page_size must be a multiple of 128 on TPU")
    dq = cache.k_codes.shape[2]

    bq = block_q or _pick_bq(s)
    bk = bq
    sp = (s + bq - 1) // bq * bq
    if sp != s:
        q = jnp.pad(q, ((0, sp - s), (0, 0), (0, 0)))
        k_chunk = jnp.pad(k_chunk, ((0, sp - s), (0, 0), (0, 0)))
        v_chunk = jnp.pad(v_chunk, ((0, sp - s), (0, 0), (0, 0)))

    # (S, H, D) -> (Hkv, G, S, D); (S, Hkv, D) -> (Hkv, S, D)
    qg = q.transpose(1, 0, 2).reshape(hkv, g, sp, d)
    kc_ = k_chunk.transpose(1, 0, 2)
    vc_ = v_chunk.transpose(1, 0, 2)
    table = cache.page_table[seq_id]
    start = jnp.asarray(start_pos, jnp.int32).reshape(1)

    kernel = functools.partial(
        _prefill_kernel, bits=cache.bits, page_size=ps, g=g, d=d, bq=bq,
        bk=bk, s_chunk=sp, window=sliding_window)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(hkv, sp // bq),
        in_specs=[
            pl.BlockSpec((1, g, bq, d), lambda kvh, iq, *_: (kvh, 0, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, d), lambda kvh, iq, *_: (kvh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, d), lambda kvh, iq, *_: (kvh, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec((1, g, bq, d),
                               lambda kvh, iq, *_: (kvh, 0, iq, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, dq, ps), cache.k_codes.dtype),
            pltpu.VMEM((2, dq, ps), cache.k_codes.dtype),
            pltpu.VMEM((2, 2, ps), jnp.bfloat16),
            pltpu.VMEM((2, 2, ps), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hkv, g, sp, d), jnp.bfloat16),
        interpret=interpret,
    )(table, start, qg, kc_, vc_, cache.k_codes, cache.v_codes,
      cache.k_sz, cache.v_sz)
    # (Hkv, G, S, D) -> (S, H, D)
    out = out.reshape(h, sp, d).transpose(1, 0, 2)
    return out[:s] if sp != s else out


__all__ = ["paged_prefill_attention"]
