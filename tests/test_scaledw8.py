"""ScaledW8 decode-optimized weight layout: exactness + kernel parity.

The layout folds each UE8M0 block scale into per-element 8-bit codes
(mx/scaledw8.py); everything here locks it bit-for-bit against the
split-plane MixedTensor path and the XLA reference
(mxtensor.mixed_matmul_xla), the same protocol as
tests/test_mixed_matmul_kernel.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micromix_tpu.kernels.mixed_matmul import mixed_matmul, mixed_matmul_w8
from micromix_tpu.mx.mxtensor import (
    MixedTensor, dequantize_mixed, dequantize_mixed_device, mixed_matmul_xla,
    quantize_mixed)
from micromix_tpu.mx.scaledw8 import (
    ScaledW8, dequantize_scaled_w8, pack_scaled_w8)

M, N, K4, K6, K8 = 32, 512, 384, 64, 64
K = K4 + K6 + K8


def _operands(rng, m=M, n=N):
    x = rng.normal(0, 1, (m, K)).astype(np.float32)
    x[:, -K8:] *= 60.0
    w = rng.normal(0, 0.3, (n, K)).astype(np.float32)
    a = quantize_mixed(jnp.asarray(x), K4, K6, K8)
    wq = quantize_mixed(jnp.asarray(w), K4, K6, K8, weight_fp4_only=True,
                        pack_fp4=True)
    return a, wq


def test_pack_decode_exact(rng):
    _, wq = _operands(rng)
    w8 = pack_scaled_w8(wq)
    ref = np.asarray(dequantize_mixed_device(wq, jnp.float32))
    got = np.asarray(dequantize_scaled_w8(w8, jnp.float32))
    np.testing.assert_array_equal(ref, got)
    # canonical-order dequantize agrees across layouts too
    np.testing.assert_array_equal(np.asarray(dequantize_mixed(wq)),
                                  np.asarray(dequantize_mixed(w8)))


def test_kernel_bit_exact_vs_xla_reference(rng):
    a, wq = _operands(rng)
    w8 = pack_scaled_w8(wq)
    ref = np.asarray(mixed_matmul_xla(a, wq).astype(jnp.float32))
    # MixedTensor activation input (engine path)
    got = np.asarray(mixed_matmul(a, w8, prefill_threshold=1 << 30
                                  ).astype(jnp.float32))
    np.testing.assert_array_equal(ref, got)
    # pre-decoded bf16 activation input (project_all decode-once path)
    ad = dequantize_mixed_device(a, jnp.bfloat16)
    got2 = np.asarray(mixed_matmul_w8(ad, w8).astype(jnp.float32))
    np.testing.assert_array_equal(ref, got2)


def test_kernel_padded_m(rng):
    a, wq = _operands(rng, m=17)
    w8 = pack_scaled_w8(wq)
    ref = np.asarray(mixed_matmul_xla(a, wq).astype(jnp.float32))
    got = np.asarray(mixed_matmul(a, w8, prefill_threshold=1 << 30
                                  ).astype(jnp.float32))
    np.testing.assert_array_equal(ref, got)


def test_prefill_path_dense_dispatch(rng):
    a, wq = _operands(rng, m=64)
    w8 = pack_scaled_w8(wq)
    ref = np.asarray(mixed_matmul_xla(a, wq).astype(jnp.float32))
    got = np.asarray(mixed_matmul(a, w8, prefill_threshold=8
                                  ).astype(jnp.float32))
    np.testing.assert_array_equal(ref, got)


def test_zeros_and_negatives(rng):
    a, _ = _operands(rng)
    wz = np.zeros((N, K), np.float32)
    wz[0, :64] = -0.5
    wz[1, 128:160] = -3e-5
    wqz = quantize_mixed(jnp.asarray(wz), K4, K6, K8, weight_fp4_only=True,
                         pack_fp4=True)
    w8 = pack_scaled_w8(wqz)
    ref = np.asarray(mixed_matmul_xla(a, wqz).astype(jnp.float32))
    got = np.asarray(mixed_matmul(a, w8, prefill_threshold=1 << 30
                                  ).astype(jnp.float32))
    np.testing.assert_array_equal(ref, got)


def test_all_zero_tensor(rng):
    a, _ = _operands(rng)
    wqz = quantize_mixed(jnp.zeros((N, K)), K4, K6, K8,
                         weight_fp4_only=True, pack_fp4=True)
    w8 = pack_scaled_w8(wqz)
    got = np.asarray(mixed_matmul(a, w8, prefill_threshold=1 << 30))
    assert (got == 0).all()


def test_span_overflow_raises():
    w = np.ones((8, 128), np.float32)
    w[0, 0] = 1e30
    w[1, 32] = 1e-30
    wq = quantize_mixed(jnp.asarray(w), 128, 0, 0, weight_fp4_only=True,
                        pack_fp4=True)
    with pytest.raises(ValueError):
        pack_scaled_w8(wq, check=True)


def test_surgery_auto_layout(rng):
    """quantize_linear layout='auto' emits ScaledW8 and matches splitplane."""
    from micromix_tpu.models.surgery import SiteCalibration, quantize_linear

    w = jnp.asarray(rng.normal(0, 0.1, (N, K)), jnp.bfloat16)
    calib = SiteCalibration(np.arange(K, dtype=np.int32), K6, K8)
    lin_auto = quantize_linear(w, calib)
    lin_sp = quantize_linear(w, calib, layout="splitplane")
    assert isinstance(lin_auto.w, ScaledW8)
    assert isinstance(lin_sp.w, MixedTensor)
    x = jnp.asarray(rng.normal(0, 1, (8, K)), jnp.bfloat16)
    a = quantize_mixed(x.astype(jnp.float32), K4, K6, K8)
    ya = np.asarray(lin_auto(a).astype(jnp.float32))
    ys = np.asarray(lin_sp(a).astype(jnp.float32))
    np.testing.assert_array_equal(ya, ys)


def test_host_pack_matches_device_pack(rng):
    """pack_scaled_w8_host (numpy) is bit-identical to the jnp pack."""
    from micromix_tpu.mx.scaledw8 import pack_scaled_w8_host
    from micromix_tpu.utils.native import quantize_mixed_host

    w = rng.normal(0, 0.3, (N, K)).astype(np.float32)
    segs = quantize_mixed_host(w, K4, K6, K8, weight_fp4_only=True)
    host = pack_scaled_w8_host(segs, K4, K6, K8)
    wq = quantize_mixed(jnp.asarray(w), K4, K6, K8, weight_fp4_only=True,
                        pack_fp4=True)
    dev = pack_scaled_w8(wq)
    np.testing.assert_array_equal(np.asarray(host.codes),
                                  np.asarray(dev.codes))
    np.testing.assert_array_equal(np.asarray(host.base),
                                  np.asarray(dev.base))


def test_native_fused_scaledw8_matches_python(rng):
    """mx_quantize_scaledw8 (C++) == quantize_mixed_host + numpy pack ==
    device pack, bit for bit."""
    from micromix_tpu.utils.native import (
        native_available, quantize_scaledw8_host)

    if not native_available():
        pytest.skip("native library unavailable")
    w = rng.normal(0, 0.3, (N, K)).astype(np.float32)
    got = quantize_scaledw8_host(w, K4, K6, K8)
    assert got is not None
    codes, base = got
    wq = quantize_mixed(jnp.asarray(w), K4, K6, K8, weight_fp4_only=True,
                        pack_fp4=True)
    dev = pack_scaled_w8(wq)
    np.testing.assert_array_equal(codes, np.asarray(dev.codes))
    assert base == int(np.asarray(dev.base).reshape(()))
    # zero tensor: all codes 0, base 0
    z = quantize_scaledw8_host(np.zeros((8, K), np.float32), K4, K6, K8)
    assert z is not None and (z[0] == 0).all() and z[1] == 0


def test_weight_only_scaledw8_layout(rng):
    """Weight-only mxfp4 'scaledw8' layout == 'splitplane' numerics, and
    the WeightOnlyLinear ScaledW8 path == dequant + dot on the operands."""
    from micromix_tpu.models import (
        ModelConfig, forward, quantize_model_weight_only,
        random_dense_params)

    cfg = ModelConfig(arch="llama", vocab_size=64, hidden_size=128,
                      intermediate_size=256, num_layers=1, num_heads=2,
                      num_kv_heads=2, head_dim=64, rope_theta=10000.0,
                      rms_eps=1e-6)
    dense = random_dense_params(cfg, seed=52)
    sp = quantize_model_weight_only(dense, cfg, "mxfp4",
                                    layout="splitplane")
    w8 = quantize_model_weight_only(dense, cfg, "mxfp4", layout="scaledw8")
    lin_sp = sp["layers"][0]["q"]
    lin_w8 = w8["layers"][0]["q"]
    assert isinstance(lin_w8.w, ScaledW8) and isinstance(
        lin_sp.w, MixedTensor)
    # decoded weight images are bit-identical
    np.testing.assert_array_equal(
        np.asarray(dequantize_mixed(lin_sp.w, dtype=jnp.bfloat16)),
        np.asarray(dequantize_scaled_w8(lin_w8.w)))
    x = jnp.asarray(rng.normal(0, 1, (4, 128)), jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(lin_sp(x), np.float32), np.asarray(lin_w8(x), np.float32),
        rtol=2e-2, atol=2e-2)
    tokens = jnp.asarray(rng.integers(0, 64, (1, 8)), jnp.int32)
    np.testing.assert_allclose(
        np.asarray(forward(sp, cfg, tokens)),
        np.asarray(forward(w8, cfg, tokens)), rtol=5e-2, atol=5e-2)


def test_weight_only_scaledw8_checkpoint_roundtrip(tmp_path, rng):
    from micromix_tpu.models import (
        ModelConfig, forward, load_params, quantize_model_weight_only,
        random_dense_params, save_params)

    cfg = ModelConfig(arch="llama", vocab_size=64, hidden_size=128,
                      intermediate_size=256, num_layers=1, num_heads=2,
                      num_kv_heads=2, head_dim=64, rope_theta=10000.0,
                      rms_eps=1e-6)
    wq = quantize_model_weight_only(
        random_dense_params(cfg, seed=53), cfg, "mxfp4", layout="scaledw8")
    save_params(str(tmp_path / "wo8"), wq, cfg)
    loaded, cfg2, _ = load_params(str(tmp_path / "wo8"))
    assert cfg2 == cfg
    assert isinstance(loaded["layers"][0]["q"].w, ScaledW8)
    tokens = jnp.asarray(rng.integers(0, 64, (1, 8)), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(forward(wq, cfg, tokens)),
        np.asarray(forward(loaded, cfg, tokens)))
