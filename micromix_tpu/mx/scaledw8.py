"""ScaledW8: decode-optimized weight layout for fp4-only MX weights.

MicroMix quantizes weights to MXFP4 for every K-segment (reference:
model/qLinearLayer.py:50, mgemm/src/reorder.cu:271-432 — the w4 kernel uses
FP4_MAX for all three branches).  An MXFP4 element times its UE8M0 block
scale is ``(-1)^s * (1 + m/2) * 2^E`` with a single mantissa bit — i.e. the
entire *scaled* weight value fits in (sign, exponent, 1 mantissa bit).

ScaledW8 stores that product directly, one byte per element:

    code = s<<7 | e6<<1 | m        e6 = E - base + 1 in [1, 63]
    code = 0                       for +/-0

with one per-tensor int32 ``base`` exponent.  Decode to float32 bits is
three integer ops plus a zero select:

    bits = ((code & 0x7F) << 22) + ((base + 126) << 23)   # exp+mant
    bits |= (code & 0x80) << 24                            # sign
    value = bitcast_f32(bits)  where code&0x7F != 0 else 0

versus ~17 VPU ops (field extraction, subnormal select, scale exp2,
``pltpu.repeat`` lane-tiling, scale multiply) for split-plane fp4 + UE8M0
decode.  The measured v5e decode-GEMM is VPU-decode-bound
(docs/perf_notes.md), so trading 2x HBM bytes (1 B/elem vs 0.5 B packed)
for a ~2x shorter decode pipeline is the right side of the roofline at
decode M; both layouts remain available and QuantLinear picks per use.

Exactness: decode(pack(w)) reproduces the *identical bf16 operand* the
split-plane kernel feeds the MXU, so GEMM results are bit-equal to the
``mixed_matmul_xla`` reference (tested in tests/test_scaledw8.py).

Range: e6 has 6 bits, so the spread of scaled-value exponents within one
tensor must be <= 62.  Real weight tensors span ~15-25; ``pack_scaled_w8``
raises if exceeded and callers fall back to the split-plane layout.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from . import numerics as nx
from .formats import FP4, UE8M0_BIAS
from .mxtensor import MixedTensor

_F32 = jnp.float32
_I32 = jnp.int32
_U32 = jnp.uint32


@dataclasses.dataclass(frozen=True)
class ScaledW8:
    """Per-element scaled-fp4 weight codes for one (N, K) weight matrix.

    codes: (N, K) uint8, one code per logical element, segment columns in
      the same block-interleaved device order as the matching activation
      MixedTensor (mx/layout.py).
    base: (1, 1) int32 per-tensor exponent offset (dynamic, not static, so
      layers with different bases share one compiled kernel).
    k4/k6/k8: the activation segment budgets this weight was packed for.
    """

    codes: jnp.ndarray
    base: jnp.ndarray
    k4: int = dataclasses.field(default=0, metadata=dict(static=True))
    k6: int = dataclasses.field(default=0, metadata=dict(static=True))
    k8: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def rows(self) -> int:
        return self.codes.shape[0]

    @property
    def k(self) -> int:
        return self.codes.shape[1]

    def segments(self) -> Tuple[int, int, int]:
        return (self.k4, self.k6, self.k8)


jax.tree_util.register_dataclass(
    ScaledW8, data_fields=["codes", "base"], meta_fields=["k4", "k6", "k8"])


def _scaled_values(t: MixedTensor) -> jnp.ndarray:
    """Exact per-element scaled values (rows, K) f32, device column order."""
    assert t.fp4_only or (t.k6 == 0 and t.k8 == 0), \
        "ScaledW8 requires fp4-only weights (1 mantissa bit)"
    from .mxtensor import dequantize_mixed_device
    return dequantize_mixed_device(t, dtype=jnp.float32)


def pack_scaled_w8(t: MixedTensor, *, check: bool = True,
                   base=None) -> ScaledW8:
    """MixedTensor (fp4-only weights) -> ScaledW8.

    check=True (eager contexts, e.g. model surgery at load time) verifies
    the exponent span fits the 6-bit field and raises ValueError otherwise.
    Inside jit pass check=False; out-of-range exponents then saturate,
    which real weight tensors never reach (span ~20 vs capacity 62).

    ``base`` overrides the per-tensor exponent offset — used when several
    shards of one logical weight must share a base so their code arrays
    concatenate (parallel/tp_quant K-sharded projections).
    """
    vals = _scaled_values(t)
    codes, base = encode_scaled_values(vals, check=check, base=base)
    return ScaledW8(codes=codes, base=base, k4=t.k4, k6=t.k6, k8=t.k8)


def encode_scaled_values(vals: jnp.ndarray, *, check: bool = True,
                         base=None):
    """Exact scaled values (single mantissa bit!) -> (u8 codes, base (1,1)).

    Core of the ScaledW8 encode, shared by the segment-interleaved pack
    above and the canonical-order pack used by the heterogeneous-budget
    pipeline path (models/hetero.py).
    """
    vals = vals.astype(_F32)
    bits = jax.lax.bitcast_convert_type(vals, _U32)
    expf = ((bits >> 23) & _U32(0xFF)).astype(_I32)  # biased f32 exponent
    mant = ((bits >> 22) & _U32(1)).astype(_I32)     # fp4 has 1 mantissa bit
    sign = (bits >> 31).astype(_I32)
    nonzero = vals != 0.0
    big = jnp.where(nonzero, expf, 0)
    small = jnp.where(nonzero, expf, 0xFF)
    emax = jnp.max(big)
    emin = jnp.min(small)
    any_nz = jnp.any(nonzero)
    if base is None:
        base = jnp.where(any_nz, emin - 127, 0).astype(_I32)
    else:
        base = jnp.asarray(base, _I32).reshape(())
    if check:
        if bool(any_nz):
            lo6 = int(emin - 127 - base + 1)
            hi6 = int(emax - 127 - base + 1)
            if not (1 <= lo6 and hi6 <= 63):
                raise ValueError(
                    f"scaled-weight exponents map to e6 range "
                    f"[{lo6}, {hi6}] outside ScaledW8's [1, 63]; use the "
                    "split-plane layout")
        if int(base) > 1:
            # the kernel rescales by 2^(base+126), which must stay a normal
            # f32; base > 1 means weight magnitudes >= 2^128 — never real.
            raise ValueError(f"scaled-weight base exponent {int(base)} > 1")
    e6 = jnp.clip(expf - 127 - base + 1, 1, 63)
    code = (sign << 7) | (e6 << 1) | mant
    code = jnp.where(nonzero, code, 0).astype(jnp.uint8)
    return code, base.reshape(1, 1)


def pack_scaled_w8_host(segs, k4: int, k6: int, k8: int) -> ScaledW8:
    """NumPy pack: host-quantized segment dict -> ScaledW8, CPU-only.

    ``segs`` is utils.native.quantize_mixed_host's output (numpy arrays,
    fp4 segment split-plane packed, all segments block-interleaved,
    fp4-only grid).  Pure small-integer arithmetic end to end — no float
    materialization (the ml_dtypes element-wise conversion costs ~30 s per
    8B-scale linear) and one device touch, uploading the (N, K) u8 codes.

    Per element: fp4 code c = s|e4|m, block scale exponent eb = sf - 127.
      e4 >= 1 (normal)            E = eb + e4 - 1, mantissa bit = m
      e4 == 0, m == 1 (0.5)       E = eb - 1,      mantissa bit = 0
      c & 7 == 0                  zero
    with E stored biased (+127) to match the f32-bit path exactly.
    """
    import numpy as np

    def seg_fields(packed, codes, sf, kseg):
        if not kseg:
            return None
        if packed is not None:
            lo = packed & np.uint8(0xF)
            hi = (packed >> 4) & np.uint8(0xF)
            codes = np.concatenate([lo, hi], axis=-1)
        c = codes.astype(np.int16)
        sign = (c >> 3) & 1
        e4 = (c >> 1) & 3
        m = c & 1
        nonzero = (c & 7) != 0
        eb = np.tile((sf.astype(np.int16) - 127),
                     (1, kseg // sf.shape[-1]))
        expf = np.where(e4 >= 1, eb + e4 - 1, eb - 1) + 127  # biased
        mant = np.where(e4 >= 1, m, 0)
        return sign, expf, mant, nonzero

    parts = [
        seg_fields(segs["fp4"] if k4 else None, None, segs["sf4"], k4),
        seg_fields(None, segs["fp6"], segs["sf6"], k6),
        seg_fields(None, segs["fp8"], segs["sf8"], k8),
    ]
    parts = [p for p in parts if p is not None]
    sign, expf, mant, nonzero = (
        np.concatenate([p[i] for p in parts], axis=-1) for i in range(4))
    if nonzero.any():
        live = expf[nonzero]
        emin, emax = int(live.min()), int(live.max())
        base = emin - 127
        if emax - emin > 62:
            raise ValueError(
                f"scaled-weight exponent span {emax - emin} exceeds 62")
        if base > 1:
            raise ValueError(f"scaled-weight base exponent {base} > 1")
    else:
        base = 0
    e6 = np.clip(expf - 127 - base + 1, 1, 63).astype(np.int16)
    code = np.where(nonzero, (sign << 7) | (e6 << 1) | mant, 0
                    ).astype(np.uint8)
    return ScaledW8(codes=jnp.asarray(code),
                    base=jnp.full((1, 1), base, jnp.int32),
                    k4=k4, k6=k6, k8=k8)


def decode_scaled_w8(codes: jnp.ndarray, k0: jnp.ndarray,
                     dtype=jnp.bfloat16) -> jnp.ndarray:
    """uint8 codes + K0 scalar -> exact scaled values.  Pallas-safe.

    ``k0`` must be ``scaled_w8_k0(base)`` = (base + 126) << 23 (int32).
    This is the kernel hot path: 3 integer ops + sign or + zero select.
    """
    c = codes.astype(_I32)
    t = c & 0x7F
    bits = (t << 22) + k0
    bits = bits | ((c & 0x80) << 24)
    vals = jax.lax.bitcast_convert_type(bits, _F32)
    vals = jnp.where(t == 0, _F32(0), vals)
    return vals.astype(dtype)


def scaled_w8_k0(base: jnp.ndarray) -> jnp.ndarray:
    """Per-tensor decode constant: f32 exponent-field pre-bias."""
    return ((base.astype(_I32) + 126) << 23)


def dequantize_scaled_w8(w: ScaledW8, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Whole-tensor decode (XLA reference / prefill path)."""
    return decode_scaled_w8(w.codes, scaled_w8_k0(w.base), dtype)


@dataclasses.dataclass(frozen=True)
class ScaledW8Stack:
    """Several same-K ScaledW8 weights stacked row-wise into ONE code array.

    The decode-step multi-output GEMM (kernels/mixed_matmul.
    mixed_matmul_w8_stack) runs all consumers of one quantize site —
    q/k/v, or gate/up — as a single Pallas call whose grid walks the
    stacked weight strips; each logical weight owns a contiguous strip
    range and its own output buffer (clamped out index maps + revisit
    semantics).  vs three separate calls this saves two Mosaic
    entry/pipeline ramps, two reads of the shared activation image, and
    the qx HBM round-trip per site per layer (the reference amortizes
    launches the same way with its beta-chained GEMM sequence,
    mgemm/src/gemm.cu:26-78).

    codes: (sum padded_i, K) u8 — section i's rows padded to ``padded[i]``
      (a multiple of the stack's strip width) with zero codes (decode to
      exact 0.0, so padded rows are dead weight, never wrong values).
    bases: (n_sections,) i32 per-section exponent offsets.
    biases: tuple of per-section Optional (sections[i],) bf16 rows,
      applied by the caller-facing wrapper after the GEMM.
    sections / padded: static true and padded row counts per section.
    k4/k6/k8: the shared activation segment budgets.
    """

    codes: jnp.ndarray
    bases: jnp.ndarray
    biases: Tuple
    sections: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    padded: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    k4: int = dataclasses.field(default=0, metadata=dict(static=True))
    k6: int = dataclasses.field(default=0, metadata=dict(static=True))
    k8: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def k(self) -> int:
        return self.codes.shape[1]

    @property
    def n_sections(self) -> int:
        return len(self.sections)

    def segments(self) -> Tuple[int, int, int]:
        return (self.k4, self.k6, self.k8)


jax.tree_util.register_dataclass(
    ScaledW8Stack, data_fields=["codes", "bases", "biases"],
    meta_fields=["sections", "padded", "k4", "k6", "k8"])


def stack_strip_width(ns, k: int, n_out: int) -> int:
    """The strip width (bn) all sections of a stack share: the widest of
    512/256/128 that (a) divides every 128-aligned section row count and
    (b) fits the multi-output kernel's VMEM model at decode bm."""
    from ..kernels.mixed_matmul import w8_tile_plan
    _, bn = w8_tile_plan(32, max(ns), k, site=True, producer="rms",
                         n_out=n_out)
    align = lambda n: (n + 127) // 128 * 128
    while bn > 128 and any(align(n) % bn for n in ns):
        bn //= 2
    return bn


def stack_scaled_w8(ws, biases=None) -> ScaledW8Stack:
    """[ScaledW8, ...] (same K and segment budgets) -> ScaledW8Stack.

    One-time device concat at model-build/engine-init time — NEVER inside
    a step program (that would re-copy every weight byte each step).
    """
    ws = list(ws)
    assert len(ws) >= 2
    k = ws[0].k
    segs = ws[0].segments()
    for w in ws[1:]:
        assert w.k == k and w.segments() == segs, \
            "stacked weights must share K and segment budgets"
    if biases is None:
        biases = (None,) * len(ws)
    bn = stack_strip_width([w.rows for w in ws], k, len(ws))
    padded = tuple((w.rows + bn - 1) // bn * bn for w in ws)
    parts = []
    for w, np_ in zip(ws, padded):
        c = w.codes
        if np_ != w.rows:
            c = jnp.pad(c, ((0, np_ - w.rows), (0, 0)))
        parts.append(c)
    return ScaledW8Stack(
        codes=jnp.concatenate(parts, axis=0),
        bases=jnp.concatenate([w.base.reshape(1) for w in ws]).astype(_I32),
        biases=tuple(biases),
        sections=tuple(w.rows for w in ws), padded=padded,
        k4=segs[0], k6=segs[1], k8=segs[2])


@dataclasses.dataclass(frozen=True)
class GroupedW8:
    """Per-GROUP stacked ScaledW8 weights: one (E, sum padded_i, K) code
    array for E groups (MoE experts), each group's rows holding its own
    consumers' sections (w1|w3, or w2 alone).  Feeds the grouped
    block-diagonal kernel (kernels/mixed_matmul.mixed_matmul_w8_grouped).

    codes: (E, sum padded_i, K) u8; bases: (E, n_sections) i32;
    biases: tuple of per-section Optional (E, N_i) rows.
    """

    codes: jnp.ndarray
    bases: jnp.ndarray
    biases: Tuple
    sections: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    padded: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    k4: int = dataclasses.field(default=0, metadata=dict(static=True))
    k6: int = dataclasses.field(default=0, metadata=dict(static=True))
    k8: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def k(self) -> int:
        return self.codes.shape[2]

    @property
    def groups(self) -> int:
        return self.codes.shape[0]

    def segments(self) -> Tuple[int, int, int]:
        return (self.k4, self.k6, self.k8)


jax.tree_util.register_dataclass(
    GroupedW8, data_fields=["codes", "bases", "biases"],
    meta_fields=["sections", "padded", "k4", "k6", "k8"])


def group_scaled_w8(stacked_ws, biases=None) -> GroupedW8:
    """[stacked ScaledW8 with leading group dim, ...] -> GroupedW8.

    ``stacked_ws``: each a ScaledW8 whose codes are (E, N_i, K) and base
    (E, 1, 1) — the moe_ep.stack_hetero_experts representation.  One-time
    device concat along the row axis (engine init, never per step).
    """
    ws = list(stacked_ws)
    eg = ws[0].codes.shape[0]
    k = ws[0].codes.shape[2]
    segs = ws[0].segments()
    for w in ws[1:]:
        assert w.codes.shape[0] == eg and w.codes.shape[2] == k
        assert w.segments() == segs
    if biases is None:
        biases = (None,) * len(ws)
    ns = [w.codes.shape[1] for w in ws]
    bn = 512
    align = lambda n: (n + 127) // 128 * 128
    while bn > 128 and any(align(n) % bn for n in ns):
        bn //= 2
    padded = tuple((n + bn - 1) // bn * bn for n in ns)
    parts = []
    for w, np_ in zip(ws, padded):
        c = w.codes
        if np_ != c.shape[1]:
            c = jnp.pad(c, ((0, 0), (0, np_ - c.shape[1]), (0, 0)))
        parts.append(c)
    return GroupedW8(
        codes=jnp.concatenate(parts, axis=1),
        bases=jnp.concatenate(
            [w.base.reshape(eg, 1) for w in ws], axis=1).astype(_I32),
        biases=tuple(biases),
        sections=tuple(ns), padded=padded,
        k4=segs[0], k6=segs[1], k8=segs[2])


def dequantize_stack(st: ScaledW8Stack, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Whole-stack decode (rows in padded stacked order) — prefill path."""
    k0 = scaled_w8_k0(st.bases)                      # (n_sections,)
    rows = jnp.concatenate([jnp.full((p, 1), 1, _I32) * k0[i]
                            for i, p in enumerate(st.padded)])
    return decode_scaled_w8(st.codes, rows, dtype)


__all__ = [
    "ScaledW8",
    "ScaledW8Stack",
    "GroupedW8",
    "group_scaled_w8",
    "pack_scaled_w8",
    "pack_scaled_w8_host",
    "encode_scaled_values",
    "decode_scaled_w8",
    "scaled_w8_k0",
    "dequantize_scaled_w8",
    "stack_scaled_w8",
    "stack_strip_width",
    "dequantize_stack",
]
