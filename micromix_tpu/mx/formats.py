"""OCP Microscaling (MX) element format definitions.

MicroMix uses three MX element formats — MXFP4 (e2m1), MXFP6 (e3m2),
MXFP8 (e4m3fn) — all with a shared UE8M0 (unsigned power-of-two) scale per
32-element block.  Reference semantics: /root/reference/mgemm/src/reorder.cu:17-19
(FP4_MAX=6, FP6_MAX=28, FP8_MAX=448) and the CUTLASS
``float_e2m1_t/float_e3m2_t/float_e4m3_t/float_ue8m0_t`` types.

This module is pure metadata — no jax import — so it is usable from the
NumPy oracle, the jnp reference path, and Pallas kernels alike.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

BLOCK_SIZE = 32  # MX spec: 32 elements share one UE8M0 scale.

# Channel-segment alignment: calibration rounds p6_num / p8_num up to
# multiples of 128 (reference: reorder_indices.py:109-110).  128 is also the
# TPU lane width, so segment boundaries always fall on clean tile edges.
SEGMENT_ALIGN = 128


@dataclasses.dataclass(frozen=True)
class FormatInfo:
    """Static description of one MX element format.

    Attributes:
      name: canonical short name ("fp4" | "fp6" | "fp8").
      bits: container bits in the *spec* packing (4 / 6 / 8).
      exp_bits: exponent field width.
      mant_bits: mantissa field width.
      emin: minimum *normal* exponent (unbiased).  Subnormals live at
        ``m * 2**(emin - mant_bits)``.
      emax: maximum exponent (unbiased).
      max: largest finite magnitude.
      code_bits: bits used when stored as a uint8 "container" code on TPU
        (fp4 codes occupy the low 4 bits of a nibble pair, fp6 the low 6
        bits of a byte, fp8 the full byte).
    """

    name: str
    bits: int
    exp_bits: int
    mant_bits: int
    emin: int
    emax: int
    max: float

    @property
    def bias(self) -> int:
        return 1 - self.emin

    @property
    def code_bits(self) -> int:
        return 1 + self.exp_bits + self.mant_bits

    @property
    def min_subnormal(self) -> float:
        return 2.0 ** (self.emin - self.mant_bits)


# e2m1: exponents {0..3} biased by 1; max = 2^2 * 1.5 = 6.
FP4 = FormatInfo(name="fp4", bits=4, exp_bits=2, mant_bits=1, emin=0, emax=2, max=6.0)
# e3m2: exponents {0..7} biased by 3; max = 2^4 * 1.75 = 28.
FP6 = FormatInfo(name="fp6", bits=6, exp_bits=3, mant_bits=2, emin=-2, emax=4, max=28.0)
# e4m3fn: bias 7, top code (e=15, m=7) is NaN so max = 2^8 * 1.75 = 448.
FP8 = FormatInfo(name="fp8", bits=8, exp_bits=4, mant_bits=3, emin=-6, emax=8, max=448.0)

FORMATS: Dict[str, FormatInfo] = {f.name: f for f in (FP4, FP6, FP8)}

# UE8M0 scale factor: unsigned, 8 exponent bits, no mantissa.  Stored as the
# biased exponent byte: code = unbiased_exponent + 127.  Code 255 is NaN in
# ml_dtypes' float8_e8m0fnu, so usable exponents are [-127, 127].
UE8M0_BIAS = 127
UE8M0_EMIN = -127
UE8M0_EMAX = 127


def bits_per_element(fmt: FormatInfo) -> float:
    """Spec storage cost (used for the average-bits metric, not TPU layout)."""
    return float(fmt.bits)
