"""Golden tests: jnp MX numerics vs the NumPy/ml_dtypes oracle.

Locks the quantization semantics (reference: reorder.cu:176-248) before any
kernel work: scale = 2^ceil(log2(max/fmt_max)), 0.5 fallback, saturating RTN.
"""

import ml_dtypes
import numpy as np
import pytest

import jax.numpy as jnp

from micromix_tpu.mx import formats, numerics as nx, oracle
from micromix_tpu.mx.mxtensor import dequantize_mixed, mixed_matmul_xla, quantize_mixed

ALL_FMTS = [formats.FP4, formats.FP6, formats.FP8]
_MLD = {"fp4": ml_dtypes.float4_e2m1fn, "fp6": ml_dtypes.float6_e3m2fn,
        "fp8": ml_dtypes.float8_e4m3fn}


def _all_codes(fmt):
    """All finite code points of a format as float32, via ml_dtypes."""
    codes = np.arange(1 << fmt.code_bits, dtype=np.uint8)
    vals = codes.view(_MLD[fmt.name]).astype(np.float32)
    return codes[np.isfinite(vals)], vals[np.isfinite(vals)]


@pytest.mark.parametrize("fmt", ALL_FMTS, ids=lambda f: f.name)
def test_format_constants(fmt):
    info = ml_dtypes.finfo(_MLD[fmt.name])
    assert float(info.max) == fmt.max
    assert float(info.smallest_subnormal) == fmt.min_subnormal


@pytest.mark.parametrize("fmt", ALL_FMTS, ids=lambda f: f.name)
def test_decode_matches_ml_dtypes(fmt):
    codes, vals = _all_codes(fmt)
    got = np.asarray(nx.decode(jnp.asarray(codes), fmt))
    np.testing.assert_array_equal(got, vals)


@pytest.mark.parametrize("fmt", ALL_FMTS, ids=lambda f: f.name)
def test_encode_roundtrip_all_codes(fmt):
    _, vals = _all_codes(fmt)
    codes = np.asarray(nx.encode(jnp.asarray(vals), fmt))
    got = np.asarray(nx.decode(jnp.asarray(codes), fmt))
    np.testing.assert_array_equal(got, vals)


@pytest.mark.parametrize("fmt", ALL_FMTS, ids=lambda f: f.name)
def test_quantize_to_grid_matches_mldtypes_rtn(fmt, rng):
    # Dense sweep including exact midpoints, grid points, and saturation.
    x = np.concatenate([
        rng.uniform(-1.5 * fmt.max, 1.5 * fmt.max, 4096).astype(np.float32),
        rng.normal(0, fmt.min_subnormal * 4, 4096).astype(np.float32),
        np.linspace(-fmt.max * 1.2, fmt.max * 1.2, 2001).astype(np.float32),
    ])
    # exact midpoints between representable values to check ties-to-even
    _, vals = _all_codes(fmt)
    v = np.sort(np.unique(vals))
    mids = (v[1:] + v[:-1]) / 2
    x = np.concatenate([x, mids, v]).astype(np.float32)

    want = oracle.quantize_elem(x, fmt)
    got = np.asarray(nx.quantize_to_grid(jnp.asarray(x), fmt))
    np.testing.assert_array_equal(got, want)


def test_ceil_log2_exact_powers():
    v = np.exp2(np.arange(-20, 21, dtype=np.float32))
    got = np.asarray(nx.ceil_log2(jnp.asarray(v)))
    np.testing.assert_array_equal(got, np.arange(-20, 21))
    v2 = v * 1.0000001
    got2 = np.asarray(nx.ceil_log2(jnp.asarray(v2.astype(np.float32))))
    np.testing.assert_array_equal(got2, np.arange(-20, 21) + 1)


@pytest.mark.parametrize("fmt", ALL_FMTS, ids=lambda f: f.name)
def test_block_quantize_matches_oracle(fmt, rng):
    x = rng.normal(0, 3.0, (17, 256)).astype(np.float32)
    x[3, :32] = 0.0  # zero block -> 0.5 scale fallback
    x[5, 40] = 3000.0  # large outlier
    codes, scales = nx.quantize_blocks(jnp.asarray(x), fmt)
    ocodes, oscales = oracle.quantize_blocks(x, fmt)
    np.testing.assert_array_equal(np.asarray(scales), oscales)
    np.testing.assert_array_equal(np.asarray(codes), ocodes)
    dq = np.asarray(nx.dequantize_blocks(codes, scales, fmt))
    odq = oracle.dequantize_blocks(ocodes, oscales, fmt)
    np.testing.assert_array_equal(dq, odq)


def test_zero_block_scale_is_half():
    x = jnp.zeros((1, 32), jnp.float32)
    _, scales = nx.quantize_blocks(x, formats.FP4)
    # scale 0.5 -> exponent -1 -> byte 126 (reorder.cu:180 `scale = 0.5`)
    assert int(scales[0, 0]) == 126


@pytest.mark.parametrize("fmt", ALL_FMTS, ids=lambda f: f.name)
def test_fakequant_relative_error_bound(fmt, rng):
    x = rng.normal(0, 1.0, (64, 128)).astype(np.float32)
    y = np.asarray(nx.fakequant_blocks(jnp.asarray(x), fmt))
    # per-block max error <= ulp/2 at top-of-range: |err| <= max_block * 2^-(mant+? )
    blocks = x.reshape(-1, 32)
    yb = y.reshape(-1, 32)
    maxv = np.abs(blocks).max(-1, keepdims=True)
    step = maxv / (2.0 ** fmt.mant_bits)  # coarsest grid step given scale
    assert np.all(np.abs(yb - blocks) <= step + 1e-7)


def test_pack_unpack_fp4_roundtrip(rng):
    codes = rng.integers(0, 16, (5, 64)).astype(np.uint8)
    packed = nx.pack_fp4(jnp.asarray(codes))
    assert packed.shape == (5, 32)
    # split-plane: byte j = code[j] | code[j + 32] << 4
    np.testing.assert_array_equal(
        np.asarray(packed), codes[:, :32] | (codes[:, 32:] << 4))
    out = np.asarray(nx.unpack_fp4(packed))
    np.testing.assert_array_equal(out, codes)


def test_mixed_tensor_roundtrip_matches_oracle(rng):
    k4, k6, k8 = 128, 64, 64
    x = rng.normal(0, 1, (9, k4 + k6 + k8)).astype(np.float32)
    x[:, -k8:] *= 100  # outlier channels at the end, as after reorder
    for pack in (False, True):
        t = quantize_mixed(jnp.asarray(x), k4, k6, k8, pack_fp4=pack)
        dq = np.asarray(dequantize_mixed(t))
        segs = oracle.mixed_quantize(x, k4, k6, k8)
        odq = oracle.mixed_dequantize(segs, k4, k6, k8)
        np.testing.assert_array_equal(dq, odq)


def test_mixed_matmul_xla_matches_oracle(rng):
    k4, k6, k8 = 128, 64, 64
    m, n = 7, 33
    x = rng.normal(0, 1, (m, k4 + k6 + k8)).astype(np.float32)
    x[:, -k8:] *= 50
    w = rng.normal(0, 0.5, (n, k4 + k6 + k8)).astype(np.float32)
    a = quantize_mixed(jnp.asarray(x), k4, k6, k8)
    wq = quantize_mixed(jnp.asarray(w), k4, k6, k8, weight_fp4_only=True,
                        pack_fp4=True)
    y = np.asarray(mixed_matmul_xla(a, wq, out_dtype=jnp.float32))
    want = oracle.mixed_matmul_reference(x, w, k4, k6, k8, weight_fmt="fp4")
    np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-4)


def test_empty_segments(rng):
    # pure-fp8 (weight-only config 1 uses k4=k6=0)
    k = 128
    x = rng.normal(0, 1, (4, k)).astype(np.float32)
    t = quantize_mixed(jnp.asarray(x), 0, 0, k)
    assert t.k4 == 0 and t.k6 == 0 and t.k8 == k
    dq = np.asarray(dequantize_mixed(t))
    np.testing.assert_array_equal(dq, oracle.fakequant_blocks(x, formats.FP8))


def test_precision_budget_math(rng):
    value = np.abs(rng.normal(0, 1, (512, 1024))).astype(np.float32)
    value[:, -16:] *= 1000
    p4, p6, p8, avg = oracle.precision_budget(value, 1024)
    assert p4 + p6 + p8 == 1024
    assert p6 % 128 == 0 and p8 % 128 == 0
    assert 4.0 <= avg <= 8.0
