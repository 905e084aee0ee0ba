"""Paged decode attention over the quantized KV cache.

TPU re-expression of the FlashInfer batch-decode kernel with on-the-fly
INT4 dequant and flash-style online softmax
(flashinfer/decode.cuh:492-651, state.cuh:17-68):

  * grid = one program per sequence; the page table and sequence lengths
    are scalar-prefetched so page DMAs are issued from SMEM indices
  * pages are token-minor (Hkv, dq, page_size) — every DMA slice and every
    dequantized tile is 128-lane aligned, and the dequantized (D, ps) tile
    is exactly the K^T operand the MXU wants (no transposes anywhere)
  * each page is DMA'd HBM->VMEM double-buffered (4 DMAs per page: codes
    for K and V, fused scale+zero for K and V), dequantized on the VPU,
    and folded into a running (Hkv, G, D) f32 accumulator with the online
    max/denominator recurrence; all GQA query heads of one kv head are
    processed as one matmul

``paged_decode_attention_xla`` is the dense-gather reference the kernel is
tested against.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kv_cache import PagedKVCache, kv_dequantize_page

_NEG = -1e30


def paged_decode_attention_xla(q: jnp.ndarray, cache: PagedKVCache,
                               seq_ids: jnp.ndarray,
                               sliding_window: Optional[int] = None,
                               lengths: Optional[jnp.ndarray] = None
                               ) -> jnp.ndarray:
    """Reference path.  q (B, H, D) -> (B, H, D).

    ``lengths`` (B,) overrides per-row attended lengths (see the Pallas
    path's docstring — the speculative-verify causal clamp)."""
    b, h, d = q.shape
    hkv = cache.n_kv_heads
    g = h // hkv
    mp, ps = cache.max_pages_per_seq, cache.page_size
    pages = cache.page_table[seq_ids]                      # (B, MP)
    k = kv_dequantize_page(cache.k_codes[pages], cache.k_sz[pages],
                           cache.bits)                     # (B,MP,Hkv,D,ps)
    v = kv_dequantize_page(cache.v_codes[pages], cache.v_sz[pages],
                           cache.bits)
    t = mp * ps
    # -> (B, T, Hkv, D)
    k = k.transpose(0, 1, 4, 2, 3).reshape(b, t, hkv, d)
    v = v.transpose(0, 1, 4, 2, 3).reshape(b, t, hkv, d)
    qg = q.reshape(b, hkv, g, d).astype(jnp.float32)
    scores = jnp.einsum("bkgd,btkd->bkgt", qg, k)
    scores = scores / jnp.sqrt(float(d))
    n = (cache.lengths[seq_ids] if lengths is None
         else lengths.astype(jnp.int32))[:, None]
    valid = (jnp.arange(t)[None, :] < n)
    if sliding_window is not None:
        valid = jnp.logical_and(valid,
                                jnp.arange(t)[None, :] >= n - sliding_window)
    scores = jnp.where(valid[:, None, None, :], scores, _NEG)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgt,btkd->bkgd", probs, v)
    return out.reshape(b, h, d).astype(jnp.bfloat16)


def _dequant_head(codes, sz, bits):
    """codes (dq, ps) u8, sz (2, ps) [scale, zero] -> f32 (D, ps)."""
    if bits == 16:
        return codes.astype(jnp.float32)
    if bits == 4:
        c = codes.astype(jnp.uint32)
        lo = (c & 0xF).astype(jnp.int32)
        hi = ((c >> 4) & 0xF).astype(jnp.int32)
        qv = jnp.concatenate([lo, hi], axis=0)
    else:
        qv = codes.astype(jnp.int32)
    scale = sz[0:1, :].astype(jnp.float32)
    zero = sz[1:2, :].astype(jnp.float32)
    return (qv.astype(jnp.float32) - zero) * scale


def _decode_kernel(
    page_tbl, lengths, positions,  # scalar prefetch (SMEM)
    q_ref,                       # (1, Hkv, G, D) VMEM
    inv_ref,                     # (1, D) rope inv-freq (halves duplicated)
    kc, vc, ksz, vsz,            # full cache arrays (ANY/HBM)
    out_ref,                     # (1, Hkv, G, D) VMEM
    state_ref,                   # (1, Hkv, G, 2) VMEM: [m, den] or None
    kbuf, vbuf, kszb, vszb, sem,  # scratch (double-buffered)
    *, bits: int, page_size: int, hkv: int, g: int, d: int,
    window: Optional[int], fused_rope: bool, with_state: bool,
):
    b = pl.program_id(0)
    n = lengths[b]
    npages = pl.cdiv(n, page_size)
    # sliding window floor: relative to the QUERY position when known
    # (fused rope passes it; with a tail buffer n may lag the query), else
    # to the stored length (classic append-then-attend, where n = qpos+1)
    wb = positions[b] + 1 if fused_rope else n
    # pages fully below the floor are never touched
    p0 = (jnp.maximum(wb - window, 0) // page_size
          if window is not None else jnp.int32(0))
    scale = 1.0 / (d ** 0.5)
    q = q_ref[0].astype(jnp.float32)                # (Hkv, G, D)
    if fused_rope:
        # q-side RoPE fused into the kernel (decode.cuh:40-104 parity);
        # the cache holds post-RoPE K, so only q needs rotating.  The
        # half-rotation [-x2, x1] is a full-width lane roll times a sign
        # vector — Mosaic rejects sub-128 lane slices, so no concat of
        # (D/2) halves here.
        angles = positions[b].astype(jnp.float32) * inv_ref[0]   # (D,)
        cos = jnp.cos(angles)[None, None, :]
        sin = jnp.sin(angles)[None, None, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, d), 2)
        sign = jnp.where(lane < d // 2, -1.0, 1.0)
        rot = pltpu.roll(q, shift=d // 2, axis=2) * sign
        q = q * cos + rot * sin
    q = q * scale

    def dma(slot, p_idx):
        pid = page_tbl[b, p_idx]
        copies = [
            pltpu.make_async_copy(kc.at[pid], kbuf.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(vc.at[pid], vbuf.at[slot], sem.at[slot, 1]),
        ]
        if bits != 16:  # dense pages carry no scale/zero params
            copies += [
                pltpu.make_async_copy(ksz.at[pid], kszb.at[slot],
                                      sem.at[slot, 2]),
                pltpu.make_async_copy(vsz.at[pid], vszb.at[slot],
                                      sem.at[slot, 3]),
            ]
        return copies

    @pl.when(npages > p0)
    def _():
        for c in dma(p0 % 2, p0):
            c.start()

    def body(p, carry):
        acc, m, den = carry
        slot = p % 2

        @pl.when(p + 1 < npages)
        def _():
            for c in dma((p + 1) % 2, p + 1):
                c.start()

        for c in dma(slot, p):
            c.wait()

        pos = p * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (g, page_size), 1)
        lo_ok = (pos >= wb - window) if window is not None else True
        s_heads, pv_heads = [], []
        for hh in range(hkv):
            k_h = _dequant_head(kbuf[slot, hh], kszb[slot, hh], bits)  # (D,ps)
            v_h = _dequant_head(vbuf[slot, hh], vszb[slot, hh], bits)  # (D,ps)
            s = jax.lax.dot_general(
                q[hh], k_h, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (G, ps)
            s = jnp.where(jnp.logical_and(pos < n, lo_ok), s, _NEG)
            s_heads.append(s)
            pv_heads.append(v_h)
        s = jnp.stack(s_heads)                                 # (Hkv, G, ps)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        corr = jnp.exp(m - m_new)
        e = jnp.exp(s - m_new[..., None])
        den = den * corr + jnp.sum(e, axis=-1)
        pv = jnp.stack([
            jax.lax.dot_general(
                e[hh], pv_heads[hh],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)            # (G, D)
            for hh in range(hkv)
        ])
        acc = acc * corr[..., None] + pv
        return acc, m_new, den

    acc0 = jnp.zeros((hkv, g, d), jnp.float32)
    m0 = jnp.full((hkv, g), _NEG, jnp.float32)
    den0 = jnp.zeros((hkv, g), jnp.float32)
    acc, m, den = jax.lax.fori_loop(p0, npages, body, (acc0, m0, den0))
    out = acc / jnp.maximum(den, 1e-30)[..., None]
    out_ref[0] = out.astype(out_ref.dtype)
    # expose the flash recurrence state so callers can merge a tail of
    # not-yet-paged tokens (runner.decode_multi's chunk tail buffer);
    # always written (trivial) so the output buffer is never undefined
    del with_state
    state_ref[0] = jnp.stack([m, den], axis=-1)


def paged_decode_attention(q: jnp.ndarray, cache: PagedKVCache,
                           seq_ids: jnp.ndarray, *,
                           sliding_window: Optional[int] = None,
                           rope_positions: Optional[jnp.ndarray] = None,
                           rope_inv_freq: Optional[jnp.ndarray] = None,
                           with_state: bool = False,
                           lengths: Optional[jnp.ndarray] = None,
                           interpret: Optional[bool] = None):
    """Pallas path.  q (B, H, D) -> (B, H, D).

    With ``rope_positions`` (B,) + ``rope_inv_freq`` (D//2,), q arrives
    UNrotated and the kernel applies RoPE itself (fused, matching the
    reference decode kernel's rotary mode, decode.cuh:40-104).

    with_state=True additionally returns (m, den) each (B, H) f32 — the
    flash max/denominator of the paged part, for merging with a tail of
    tokens not yet written to pages.

    ``lengths`` (B,) overrides the cache's per-seq stored lengths: row b
    attends to cache positions [0, lengths[b]).  Speculative verify uses
    this to run several query positions of ONE sequence as separate rows,
    each causally clamped to its own position (serve/speculative.py).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, d = q.shape
    hkv = cache.n_kv_heads
    g = h // hkv
    ps = cache.page_size
    if not interpret and ps % 128 != 0:
        raise ValueError(
            f"page_size={ps}: Mosaic lane tiling needs page_size % 128 == 0 "
            "on TPU (tokens are the lane axis of page arrays); use "
            "page_size=128 or run in interpreter mode")
    dq = cache.k_codes.shape[2]
    fused_rope = rope_positions is not None
    if fused_rope:
        inv_full = jnp.concatenate([rope_inv_freq, rope_inv_freq]
                                   )[None, :].astype(jnp.float32)
        positions = rope_positions.astype(jnp.int32)
    else:
        inv_full = jnp.zeros((1, d), jnp.float32)
        positions = jnp.zeros((b,), jnp.int32)

    qg = q.reshape(b, hkv, g, d)
    table = cache.page_table[seq_ids]
    if lengths is None:
        lengths = cache.lengths[seq_ids]
    else:
        lengths = lengths.astype(jnp.int32)

    kernel = functools.partial(
        _decode_kernel, bits=cache.bits, page_size=ps, hkv=hkv, g=g, d=d,
        window=sliding_window, fused_rope=fused_rope,
        with_state=with_state)

    out_specs = [pl.BlockSpec((1, hkv, g, d), lambda i, *_: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((b, hkv, g, d), jnp.bfloat16)]
    if with_state:
        out_specs.append(pl.BlockSpec((1, hkv, g, 2),
                                      lambda i, *_: (i, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, hkv, g, 2), jnp.float32))
    else:
        # the kernel signature always takes a state ref slot; feed a dummy
        out_specs.append(pl.BlockSpec((1, hkv, g, 2),
                                      lambda i, *_: (i, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, hkv, g, 2), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hkv, g, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((2, hkv, dq, ps), cache.k_codes.dtype),
            pltpu.VMEM((2, hkv, dq, ps), cache.k_codes.dtype),
            pltpu.VMEM((2, hkv, 2, ps), jnp.bfloat16),
            pltpu.VMEM((2, hkv, 2, ps), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )

    out, state = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(table, lengths, positions, qg, inv_full, cache.k_codes,
      cache.v_codes, cache.k_sz, cache.v_sz)
    out = out.reshape(b, h, d)
    if with_state:
        m = state[..., 0].reshape(b, h)
        den = state[..., 1].reshape(b, h)
        return out, m, den
    return out
