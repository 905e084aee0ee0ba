"""Pallas KV-cache append: one aliased kernel per layer per decode step.

TPU re-expression of AppendPagedKVCacheDecodeKernel
(flashinfer/page.cuh:120-293): each appended token's quantized K/V
column lands in its page at ``(page_id, :, :, off)`` with the cache
buffers ALIASED input->output — a true in-place update.

Why a kernel: the XLA alternatives both lose inside the decode scan — a
gather-scatter forces one full-buffer aliasing copy of every code buffer
per step plus transposed loop layouts (~1 GB/step at 8B scale), and the
dynamic-update-slice chain that replaced it costs 4 ops x T tokens x
n_layers per step (1024 tiny DUS ops, measured 4.3 ms/step at 8B shapes
— docs/perf_notes.md r3 notes).  This kernel is ONE call per layer.

Mosaic rejects sub-128 lane slices on tiled memrefs (single-column DMA
is not expressible), so the kernel is read-blend-write at page-tile
granularity: DMA the T target page tiles HBM->VMEM, blend each token's
column in with a lane-iota select, DMA the tiles back.  ~2 MB of DMA per
layer per step at 8B shapes — noise against the weight stream.

CORRECTNESS CONTRACT: tokens must target DISTINCT pages, except tokens
parked on the engine's scratch page, whose whole-tile last-writer-wins
garbage nothing ever reads meaningfully.  Decode-step appends satisfy
this by construction (one token per active slot, slots own disjoint
pages).  Multi-token-per-sequence appends (prefill, verify blocks) must
use the XLA paths instead — two same-page tokens here would drop the
earlier column.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Unrolled program-size bound; decode appends are T = batch <= 16.
APPEND_KERNEL_MAX_T = 32


def _append_kernel(pid_ref, off_ref,             # SMEM (T,) i32
                   kq, vq, ksz, vsz,             # VMEM (T, H, dq|2)
                   kc_in, vc_in, ks_in, vs_in,   # ANY cache inputs (aliased)
                   kc, vc, ks, vs,               # ANY cache outputs
                   kbuf, vbuf, ksb, vsb, sem,    # VMEM scratch (T, ...)
                   *, t_total: int):
    bufs = (kbuf, vbuf, ksb, vsb)

    def tiles(t, refs, to_vmem):
        pid = pid_ref[t]
        pairs = [(r.at[pid], b.at[t]) for r, b in zip(refs, bufs)]
        return [
            pltpu.make_async_copy(src if to_vmem else dst,
                                  dst if to_vmem else src, sem.at[i])
            for i, (src, dst) in enumerate(pairs)
        ]

    loads = [c for t in range(t_total)
             for c in tiles(t, (kc_in, vc_in, ks_in, vs_in), True)]
    for c in loads:
        c.start()
    for c in loads:
        c.wait()

    for t in range(t_total):
        o = off_ref[t]
        for buf, val in ((kbuf, kq), (vbuf, vq), (ksb, ksz), (vsb, vsz)):
            tile = buf[t]                                   # (H, R, ps)
            lane = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 2)
            # Mosaic only supports minor-dim insertion ([..., None]) for
            # 32-bit types: blend in i32/f32 and cast back
            wide = (jnp.int32 if jnp.issubdtype(tile.dtype, jnp.integer)
                    else jnp.float32)
            col = val[t].astype(wide)[:, :, None]
            buf[t] = jnp.where(lane == o, col,
                               tile.astype(wide)).astype(tile.dtype)

    stores = [c for t in range(t_total)
              for c in tiles(t, (kc, vc, ks, vs), False)]
    for c in stores:
        c.start()
    for c in stores:
        c.wait()


def append_kv_kernel(k_codes, v_codes, k_sz, v_sz, page_id, off,
                     kq, vq, ksz, vsz, *, interpret: bool = False):
    """Write T token columns into the page arrays (aliased, in place).

    k_codes/v_codes (P, H, dq, ps) and k_sz/v_sz (P, H, 2, ps) are
    returned updated at ``[page_id[t], :, :, off[t]] = kq[t]/...`` for
    each t.  kq/vq (T, H, dq); ksz/vsz (T, H, 2) bf16.  ``page_id``
    entries must be distinct up to scratch-page don't-cares (see module
    docstring).
    """
    t, h, dq = kq.shape
    assert t <= APPEND_KERNEL_MAX_T, t
    ps = k_codes.shape[3]
    kernel = functools.partial(_append_kernel, t_total=t)
    args = (page_id.astype(jnp.int32), off.astype(jnp.int32),
            kq, vq, ksz, vsz, k_codes, v_codes, k_sz, v_sz)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * 4),
        out_shape=tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                        for a in (k_codes, v_codes, k_sz, v_sz)),
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
        scratch_shapes=[
            pltpu.VMEM((t, h, dq, ps), k_codes.dtype),
            pltpu.VMEM((t, h, dq, ps), v_codes.dtype),
            pltpu.VMEM((t, h, 2, ps), k_sz.dtype),
            pltpu.VMEM((t, h, 2, ps), v_sz.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(*args)
