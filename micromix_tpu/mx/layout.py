"""Block-interleaved device layout for MX segments.

MX semantics group 32 *consecutive* (in saliency order) channels per UE8M0
scale.  On TPU, expanding a per-block scale row (rows, nb) to per-element
(rows, nb*32) with *contiguous* blocks needs an unsupported lane reshape in
Mosaic; but *tiling* a vector N times along lanes (``pltpu.repeat``) is a
native op.  So the device layout stores each segment block-INTERLEAVED:

    physical column c  <->  logical channel (c % nb) * 32 + (c // nb)

i.e. physical column c belongs to scale block ``c % nb``.  Then:

  * scale expansion  = tile the (rows, nb) scale row 32x  (pltpu.repeat)
  * block absmax     = elementwise max of 32 contiguous (rows, nb) slices
  * fp4 split-plane packing composes cleanly: byte j = phys[j] | phys[j+K/2]<<4
    and both nibble planes use the identical 16x-tiled scale row.

The channel permutation applied to activations at runtime is already
arbitrary (reorder_index), so this interleave is composed into it for free;
weights get it baked in at load time.  Scale arrays are *unchanged*
(column b = logical block b).  This is a pure layout choice — the set of
channels sharing each scale is exactly the reference's (reorder.cu:154-209).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .formats import BLOCK_SIZE


def interleave(x: jnp.ndarray) -> jnp.ndarray:
    """Canonical (rows, K) -> block-interleaved (rows, K).  XLA-side op."""
    rows, k = x.shape
    nb = k // BLOCK_SIZE
    return x.reshape(rows, nb, BLOCK_SIZE).swapaxes(1, 2).reshape(rows, k)


def deinterleave(x: jnp.ndarray) -> jnp.ndarray:
    """Block-interleaved (rows, K) -> canonical (rows, K)."""
    rows, k = x.shape
    nb = k // BLOCK_SIZE
    return x.reshape(rows, BLOCK_SIZE, nb).swapaxes(1, 2).reshape(rows, k)


def interleave_index(k: int) -> np.ndarray:
    """logical-channel index for each physical column (length k, int32).

    ``x_phys = x_canonical[..., interleave_index(k)]`` — used to compose the
    interleave into the calibration reorder_index so the runtime activation
    gather produces device layout directly.
    """
    nb = k // BLOCK_SIZE
    c = np.arange(k, dtype=np.int32)
    return (c % nb) * BLOCK_SIZE + c // nb


def compose_segmented(perm: np.ndarray, k4: int, k6: int, k8: int) -> np.ndarray:
    """Compose a channel reorder permutation with per-segment interleaves.

    ``perm`` (K,) maps sorted position -> original channel (the calibration
    reorder_index).  Returns indices such that gathering with them yields
    each segment already in device layout.
    """
    out = np.asarray(perm, np.int32).copy()
    off = 0
    for kseg in (k4, k6, k8):
        if kseg:
            seg = out[off:off + kseg]
            out[off:off + kseg] = seg[interleave_index(kseg)]
        off += kseg
    return out
