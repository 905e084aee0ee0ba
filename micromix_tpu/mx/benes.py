"""Trace-time Benes routing: constant channel permutations as static
roll+select stages.

The quantize sites gather activations into device channel order with a
trace-time-constant permutation (calibration reorder composed with the
block interleave, models/surgery.make_site).  XLA lowers that jnp.take
as a transpose + row-gather + transpose chain — measured 2.9 ms/step at
8B decode (3 sites x 32 layers, benchmarks/probe_ablate.py --no-perm,
docs/perf_notes.md r4) — and Mosaic's in-kernel dynamic gathers either
reject or crash the TPU compiler.

A Benes network realizes ANY permutation of K = 2^n lanes as
2n-1 stages of conditional pair swaps, stage s pairing lanes that
differ in one bit (distance d): y[i] = m_s[i] ? x[i^d] : x[i].  On TPU
each stage is two ``pltpu.roll``s (exact, any distance — verified
on-chip) plus two selects with a STATIC mask, so the whole gather runs
inside the consuming Pallas kernel and hides under its weight DMA.  The
23 masks for K=4096 bit-pack into ONE (K,) i32 operand (16 KB/site).

Reference analog: reorder_quantize_mixed_kernel's shared-memory gather
(mgemm/src/reorder.cu:94-269) — the TPU has no arbitrary lane gather,
so the permutation becomes routing instead.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

__all__ = ["benes_route", "pack_masks", "apply_benes_np", "benes_dists"]


def benes_dists(k: int) -> Tuple[int, ...]:
    """Stage distances for K = 2^n lanes: K/2, K/4, ..., 1, ..., K/4, K/2."""
    assert k >= 2 and (k & (k - 1)) == 0, k
    n = k.bit_length() - 1
    down = [k >> (i + 1) for i in range(n)]          # K/2 ... 1
    return tuple(down + down[-2::-1])                 # 2n-1 stages


def _route(perm: np.ndarray) -> List[np.ndarray]:
    """Swap masks (one bool (K,) per stage) realizing out[j] = in[perm[j]].

    Recursive Benes construction: 2-color the pair-constraint cycles so
    each outer-stage pair sends one element through each half-network,
    then route the two half-size sub-permutations independently.
    """
    k = len(perm)
    if k == 2:
        return [np.full(2, bool(perm[0] == 1))]
    b = k // 2
    inv = np.empty(k, np.int64)
    inv[perm] = np.arange(k)                 # element e exits at output inv[e]

    # 2-coloring: element e and e^B (input pair) must differ; elements
    # perm[j] and perm[j^B] (output pair) must differ.  The constraint
    # graph is a disjoint union of even cycles — walk them.
    h = np.full(k, -1, np.int8)
    for start in range(k):
        if h[start] >= 0:
            continue
        e, c = start, 0
        while h[e] < 0:
            h[e] = c
            # input-pair partner gets the other color...
            p = e ^ b
            if h[p] < 0:
                h[p] = 1 - c
            # ...then follow p's OUTPUT-pair edge: the element sharing
            # p's output pair must differ from p, i.e. color c again
            e = perm[inv[p] ^ b]
    # swap at input pair {i, i+B} iff the element AT i belongs to half 1
    swap_in = np.empty(k, bool)
    swap_in[:b] = h[:b] == 1
    swap_in[b:] = h[:b] == 1                 # consistent across the pair

    # exit-side: element perm[j] must leave the middle in half h[perm[j]]
    # at low bits j % B; stage OUT swaps pair {j, j+B} iff that half
    # differs from j's own half
    swap_out = np.empty(k, bool)
    swap_out[:b] = h[perm[:b]] == 1
    swap_out[b:] = h[perm[:b]] == 1

    sub = [np.empty(b, np.int64), np.empty(b, np.int64)]
    for j in range(k):
        e = perm[j]
        sub[h[e]][j & (b - 1)] = e & (b - 1)
    mid_up = _route(sub[0])
    mid_lo = _route(sub[1])
    mid = [np.concatenate([mu, ml]) for mu, ml in zip(mid_up, mid_lo)]
    return [swap_in] + mid + [swap_out]


def benes_route(perm: np.ndarray) -> Tuple[Tuple[int, ...], List[np.ndarray]]:
    """(stage distances, stage swap masks) for out[j] = in[perm[j]]."""
    perm = np.asarray(perm, np.int64)
    k = len(perm)
    dists = benes_dists(k)
    masks = _route(perm)
    assert len(masks) == len(dists)
    return dists, masks


def pack_masks(masks: List[np.ndarray]) -> np.ndarray:
    """Stage masks -> one (K,) int32, bit s = stage-s swap flag.
    Benes needs 2*log2(K)-1 stages: <= 31 bits up to K = 2^16."""
    assert len(masks) <= 31, len(masks)
    out = np.zeros(masks[0].shape[0], np.int32)
    for s, m in enumerate(masks):
        out |= m.astype(np.int32) << s
    return out


def apply_benes_np(x: np.ndarray, dists, masks) -> np.ndarray:
    """NumPy reference: apply the stages along the last axis."""
    k = x.shape[-1]
    idx = np.arange(k)
    for d, m in zip(dists, masks):
        partner = np.take(x, idx ^ d, axis=-1)
        x = np.where(m, partner, x)
    return x
