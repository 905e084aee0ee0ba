"""Fused quantize ops + Pallas quantize kernel vs the mx reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micromix_tpu.kernels.quantize import quantize_mixed_pallas
from micromix_tpu.mx import layout as lay
from micromix_tpu.mx.mxtensor import dequantize_mixed, quantize_mixed
from micromix_tpu.ops.quantize_ops import (
    reorder_quantize_x,
    rmsnorm_quantize_x,
    silu_mul_quantize_x,
)

K4, K6, K8 = 256, 128, 128
K = K4 + K6 + K8


def _device_layout(xc):
    """canonical (M, K) -> device layout (segments block-interleaved)."""
    parts = []
    off = 0
    for kseg in (K4, K6, K8):
        parts.append(lay.interleave(xc[:, off:off + kseg]))
        off += kseg
    return jnp.concatenate(parts, axis=-1)


def test_pallas_quantize_matches_xla(rng):
    x = rng.normal(0, 2, (37, K)).astype(np.float32)
    x[:, -K8:] *= 50
    x[5, :64] = 0
    xd = _device_layout(jnp.asarray(x))
    got = quantize_mixed_pallas(xd, K4, K6, K8, interpret=True)
    want = quantize_mixed(jnp.asarray(x), K4, K6, K8)
    for f in ("fp4", "fp6", "fp8", "sf4", "sf6", "sf8"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(want, f)), err_msg=f)


def test_pallas_quantize_single_segment(rng):
    x = rng.normal(0, 1, (8, 128)).astype(np.float32)
    xd = lay.interleave(jnp.asarray(x))
    got = quantize_mixed_pallas(xd, 0, 0, 128, interpret=True)
    want = quantize_mixed(jnp.asarray(x), 0, 0, 128)
    np.testing.assert_array_equal(np.asarray(got.fp8), np.asarray(want.fp8))
    np.testing.assert_array_equal(np.asarray(got.sf8), np.asarray(want.sf8))


def test_reorder_quantize_x(rng):
    x = rng.normal(0, 1, (2, 5, K)).astype(np.float32)
    base_perm = rng.permutation(K).astype(np.int32)
    perm = lay.compose_segmented(base_perm, K4, K6, K8)
    t = reorder_quantize_x(jnp.asarray(x), jnp.asarray(perm), K4, K6, K8,
                           interpret=True)
    # reference: gather canonically then canonical quantize
    xc = x.reshape(-1, K)[:, base_perm]
    want = quantize_mixed(jnp.asarray(xc), K4, K6, K8)
    np.testing.assert_array_equal(np.asarray(t.fp4), np.asarray(want.fp4))
    np.testing.assert_array_equal(np.asarray(t.sf8), np.asarray(want.sf8))


def test_rmsnorm_quantize_x(rng):
    x = rng.normal(0, 1, (7, K)).astype(np.float32)
    gamma = rng.normal(1, 0.1, (K,)).astype(np.float32)
    base_perm = rng.permutation(K).astype(np.int32)
    perm = lay.compose_segmented(base_perm, K4, K6, K8)
    t = rmsnorm_quantize_x(jnp.asarray(x), jnp.asarray(gamma),
                           jnp.asarray(perm), K4, K6, K8, interpret=True)
    rvar = 1.0 / np.sqrt((x * x).mean(-1, keepdims=True) + 1e-6)
    y = (x * rvar * gamma)[:, base_perm]
    want = quantize_mixed(jnp.asarray(y), K4, K6, K8)
    dq_got = np.asarray(dequantize_mixed(t))
    dq_want = np.asarray(dequantize_mixed(want))
    np.testing.assert_allclose(dq_got, dq_want, rtol=1e-5, atol=1e-5)


def test_silu_mul_quantize_x(rng):
    g = rng.normal(0, 1, (7, K)).astype(np.float32)
    u = rng.normal(0, 1, (7, K)).astype(np.float32)
    t = silu_mul_quantize_x(jnp.asarray(g), jnp.asarray(u), K4, K6, K8,
                            interpret=True)
    # the op's input is device-layout by construction (gate/up rows are
    # permuted at load); reference = the XLA fallback path on the same data
    want = silu_mul_quantize_x(jnp.asarray(g), jnp.asarray(u), K4, K6, K8,
                               use_pallas=False)
    np.testing.assert_array_equal(
        np.asarray(dequantize_mixed(t)), np.asarray(dequantize_mixed(want)))
    # and it equals quantizing silu(g)*u (device layout) directly
    y = jax.nn.silu(jnp.asarray(g)) * jnp.asarray(u)
    want2 = quantize_mixed_pallas(y, K4, K6, K8, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(dequantize_mixed(t)), np.asarray(dequantize_mixed(want2)))


def test_fakequant_site_kernel_parity(rng):
    """kernels/fakequant.py (one fused Pallas call per site) must match
    the XLA fakequant chains on every producer variant."""
    import jax.numpy as jnp

    from micromix_tpu.kernels.fakequant import fakequant_site_pallas
    from micromix_tpu.ops.quantize_ops import (
        fakequant_device, reorder_fakequant_x, rmsnorm_fakequant_x,
        silu_mul_fakequant_x)

    m, (k4, k6, k8) = 8, (256, 64, 64)
    k = k4 + k6 + k8
    x = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.bfloat16)
    up = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.bfloat16)
    gamma = jnp.asarray(rng.normal(1, 0.1, (k,)), jnp.bfloat16)
    perm = jnp.asarray(rng.permutation(k), jnp.int32)

    # plain: bit-identical (no reduction-order freedom)
    got = fakequant_site_pallas(x, k4, k6, k8, interpret=True)
    want = fakequant_device(x, k4, k6, k8)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))

    # silu: bit-identical too (elementwise producer)
    got = fakequant_site_pallas(x, k4, k6, k8, producer="silu", up=up,
                                interpret=True)
    want = silu_mul_fakequant_x(x, up, k4, k6, k8)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))

    # rms: the row moment's reduction order may differ -> tight allclose,
    # and the quantized IMAGE is grid-snapped so most entries still match
    got = np.asarray(fakequant_site_pallas(
        jnp.take(x, perm, axis=1), k4, k6, k8, producer="rms",
        gamma=jnp.take(gamma.astype(jnp.float32), perm), eps=1e-6,
        interpret=True), np.float32)
    want = np.asarray(rmsnorm_fakequant_x(x, gamma, perm, k4, k6, k8,
                                          eps=1e-6), np.float32)
    np.testing.assert_allclose(got, want, rtol=0.07, atol=1e-3)
    assert (got == want).mean() > 0.98
