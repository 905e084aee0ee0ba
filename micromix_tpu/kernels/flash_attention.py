"""Pallas TPU flash attention for prefill (causal, GQA, sliding window).

The reference runs prefill attention through stock HF SDPA
(model/qLlamaLayer.py:297-304) — an (S, S) score materialization.  This is
the TPU-native splash-style replacement (SURVEY.md §7.2 step 6): blockwise
online-softmax attention that never materializes the score matrix, with

  * grid (batch·heads, S/BQ); each program owns one (BQ, D) query tile
  * the K/V stream stays in HBM and is walked in (BK, D) tiles through a
    double-buffered VMEM scratch (manual async DMA) — VMEM use is O(BK·D)
    regardless of S, so 32k+ token prefills fit (round-1 kept the whole
    (S, D) stream VMEM-resident, capping S at a few k)
  * causal block skipping: program iq only loops over k-tiles up to its own
    diagonal, and a sliding window additionally raises the loop floor —
    fully-masked tiles are neither fetched nor computed
  * GQA by head-index arithmetic (query head h reads kv head h // group),
    no jnp.repeat materialization of K/V
  * ragged S: inputs are padded to the block size outside the kernel and
    the output sliced back — padded key columns are unreachable because
    causality bounds col <= row < s for every real query row.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _flash_kernel(q_ref, k_hbm, v_hbm, out_ref, kbuf, vbuf, sem, *,
                  bq: int, bk: int, window: Optional[int], scale: float,
                  g: int):
    bi = pl.program_id(0)
    hh = pl.program_id(1)
    iq = pl.program_id(2)
    kv_h = hh // g
    q = q_ref[0, 0].astype(jnp.float32) * scale         # (BQ, D)
    d = q.shape[-1]

    row = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)

    # causal upper bound: k-tiles whose start <= last row of this q-tile
    hi = (iq * bq + bq - 1) // bk + 1
    if window is None:
        lo = jnp.int32(0)
    else:
        lo = jnp.maximum((iq * bq - window + 1) // bk, 0)

    def dma(slot, jk):
        return [
            pltpu.make_async_copy(
                k_hbm.at[bi, kv_h, pl.ds(jk * bk, bk), :], kbuf.at[slot],
                sem.at[slot, 0]),
            pltpu.make_async_copy(
                v_hbm.at[bi, kv_h, pl.ds(jk * bk, bk), :], vbuf.at[slot],
                sem.at[slot, 1]),
        ]

    @pl.when(hi > lo)
    def _():
        for c in dma(lo % 2, lo):
            c.start()

    def body(jk, carry):
        acc, m, den = carry
        slot = jk % 2

        @pl.when(jk + 1 < hi)
        def _():
            for c in dma((jk + 1) % 2, jk + 1):
                c.start()

        for c in dma(slot, jk):
            c.wait()

        k = kbuf[slot].astype(jnp.float32)                       # (BK, D)
        v = vbuf[slot].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                  # (BQ, BK)
        col = jk * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
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
            preferred_element_type=jnp.float32)                  # (BQ, D)
        acc = acc * corr[:, None] + pv
        return acc, m_new, den

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq,), _NEG, jnp.float32)
    den0 = jnp.zeros((bq,), jnp.float32)
    acc, m, den = jax.lax.fori_loop(lo, hi, body, (acc0, m0, den0))
    out = acc / jnp.maximum(den, 1e-30)[:, None]
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _pick_block(s: int) -> int:
    for b in (512, 256, 128, 64, 32, 16, 8):
        if s % b == 0:
            return min(b, s)
    return min(512, _round_up(s, 8))


def _pick_blocks(s: int):
    """(bq, bk) defaults measured on v5e at 8B attention shapes
    (benchmarks/bench_flash_prefill.py, 2026-08-19): asymmetric tiles win
    — bk ≈ 2·bq at the ends of the range: S=2048 (256,512) 85.1 TF,
    S=4096 (512,512) 96.7 TF, S=8192 (512,1024) 108.9 TF; the old
    square-tile default left 1-13% on the table.  (XLA dense attention
    measured 22 TF at S=2048, 8.9 TF at S=4096 on the same shapes.)"""
    if s >= 8192:
        return 512, 1024
    if s >= 4096:
        return 512, 512
    if s >= 1024:
        return 256, 512
    b = _pick_block(s)
    return b, b


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                    sliding_window: Optional[int] = None,
                    block_q: Optional[int] = None,
                    block_k: Optional[int] = None,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """Causal flash attention in the model zoo's layout.

    q (B, S, H, D), k/v (B, S, Hkv, D) -> (B, S, H, D); drop-in for the
    masked XLA path (models/common.py attention) during prefill.  Batch is
    a GRID dimension, not a vmap: manual-DMA kernels with ANY-space
    operands cannot be vmapped (Pallas requires whole-array blocks there),
    and the grid form shares one compiled program across B.

    Any S: inputs are zero-padded to the block size and the output sliced
    (padded keys are causally unreachable from real query rows).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, s, h, d = q.shape
    hkv = k.shape[2]
    g = h // hkv
    dbq, dbk = _pick_blocks(s)
    bq = block_q or dbq
    bk = block_k or (bq if block_q else dbk)
    sp = _round_up(s, max(bq, bk))
    dp = _round_up(d, 128)
    if sp != s or dp != d:
        pad = ((0, 0), (0, sp - s), (0, 0), (0, dp - d))
        # D pads to the 128-lane tile: Mosaic cannot DMA-slice a sub-128
        # lane region out of an ANY-space memref (head_dim 64 models).
        # Zero D-columns are exact — they add 0 to every q.k dot and emit
        # 0 output columns, sliced off below.
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    qt = q.transpose(0, 2, 1, 3)        # (B, H, S, Dp)
    kt = k.transpose(0, 2, 1, 3)        # (B, Hkv, S, Dp)
    vt = v.transpose(0, 2, 1, 3)
    d_true, d = d, dp                   # kernel shapes use the padded D

    kernel = functools.partial(
        _flash_kernel, bq=bq, bk=bk, window=sliding_window,
        scale=1.0 / (d_true ** 0.5), g=g)

    out = pl.pallas_call(
        kernel,
        grid=(b, h, sp // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bi, hh, iq: (bi, hh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d),
                               lambda bi, hh, iq: (bi, hh, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, sp, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bk, d), k.dtype),
            pltpu.VMEM((2, bk, d), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(qt, kt, vt)
    out = out.transpose(0, 2, 1, 3)     # (B, S, H, Dp)
    if sp != s or dp != d_true:
        out = out[:, :s, :, :d_true]
    return out


def flash_attention_hsd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                        sliding_window: Optional[int] = None,
                        block_q: Optional[int] = None,
                        block_k: Optional[int] = None,
                        interpret: Optional[bool] = None) -> jnp.ndarray:
    """Single-sequence core API.  q (H, S, D), k/v (Hkv, S, D)."""
    return flash_attention(
        q.transpose(1, 0, 2)[None], k.transpose(1, 0, 2)[None],
        v.transpose(1, 0, 2)[None], sliding_window=sliding_window,
        block_q=block_q, block_k=block_k,
        interpret=interpret)[0].transpose(1, 0, 2)


__all__ = ["flash_attention", "flash_attention_hsd"]
