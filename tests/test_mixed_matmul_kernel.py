"""Pallas mixed-matmul kernel vs the pure-XLA reference path.

Mirrors the reference's kernel-vs-reference tier (mgemm/test.py and
bench_mxf4f6f8 --validate): same quantized operands, compare outputs.
Runs in interpreter mode on CPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from micromix_tpu.kernels import mixed_matmul
from micromix_tpu.mx.mxtensor import mixed_matmul_xla, quantize_mixed


def _mk(rng, m, n, k4, k6, k8, w_fp4_only=True):
    k = k4 + k6 + k8
    x = rng.normal(0, 1, (m, k)).astype(np.float32)
    if k8:
        x[:, -k8:] *= 60.0
    w = rng.normal(0, 0.3, (n, k)).astype(np.float32)
    a = quantize_mixed(jnp.asarray(x), k4, k6, k8)
    wq = quantize_mixed(jnp.asarray(w), k4, k6, k8,
                        weight_fp4_only=w_fp4_only, pack_fp4=True)
    return a, wq


@pytest.mark.parametrize("m,n,k4,k6,k8", [
    (8, 128, 256, 0, 0),      # fp4 only
    (8, 128, 0, 256, 0),      # fp6 only
    (8, 128, 0, 0, 256),      # fp8 only
    (16, 256, 256, 128, 128), # all three
    (1, 128, 128, 128, 128),  # single-token decode shape
    (100, 384, 512, 128, 128),# non-tile-aligned M
])
def test_kernel_matches_xla(rng, m, n, k4, k6, k8):
    a, wq = _mk(rng, m, n, k4, k6, k8)
    got = mixed_matmul(a, wq, out_dtype=jnp.float32, interpret=True)
    want = mixed_matmul_xla(a, wq, out_dtype=jnp.float32)
    assert got.shape == (m, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_kernel_symmetric_mixed_weights(rng):
    # the symmetric W4/6/8 mode (matmul_host, gemm.cu:26-53)
    a, wq = _mk(rng, 16, 128, 256, 128, 128, w_fp4_only=False)
    got = mixed_matmul(a, wq, out_dtype=jnp.float32, interpret=True)
    want = mixed_matmul_xla(a, wq, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_kernel_accuracy_vs_fp32(rng):
    # planted outlier channels: mixed quant must track the fp32 matmul
    m, n, k4, k6, k8 = 32, 256, 512, 128, 128
    k = k4 + k6 + k8
    x = rng.normal(0, 1, (m, k)).astype(np.float32)
    x[:, -k8:] *= 80
    w = rng.normal(0, 0.3, (n, k)).astype(np.float32)
    a = quantize_mixed(jnp.asarray(x), k4, k6, k8)
    wq = quantize_mixed(jnp.asarray(w), k4, k6, k8, weight_fp4_only=True,
                        pack_fp4=True)
    y = np.asarray(mixed_matmul(a, wq, out_dtype=jnp.float32, interpret=True))
    ref = x @ w.T
    rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    assert rel < 0.15, rel
