"""Flash prefill attention vs the masked XLA reference (interpreter mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from micromix_tpu.kernels import flash_attention
from micromix_tpu.models.common import attention, causal_mask


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(0, 1, shape), jnp.float32)


@pytest.mark.parametrize("s,h,hkv,d", [
    (64, 4, 4, 32),     # MHA
    (128, 8, 2, 64),    # GQA 4x
    (96, 4, 2, 64),     # S with non-pow2 blocking (32)
])
def test_flash_matches_reference(rng, s, h, hkv, d):
    q = _rand(rng, 1, s, h, d)
    k = _rand(rng, 1, s, hkv, d)
    v = _rand(rng, 1, s, hkv, d)
    ref = attention(q, k, v, causal_mask(s, s))
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-3)


def test_flash_sliding_window(rng):
    s, h, hkv, d, w = 128, 4, 2, 64, 48
    q = _rand(rng, 1, s, h, d)
    k = _rand(rng, 1, s, hkv, d)
    v = _rand(rng, 1, s, hkv, d)
    ref = attention(q, k, v, causal_mask(s, s, sliding_window=w))
    out = flash_attention(q, k, v, sliding_window=w, interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-3)


def test_flash_batched(rng):
    s, h, hkv, d = 64, 4, 2, 32
    q = _rand(rng, 3, s, h, d)
    k = _rand(rng, 3, s, hkv, d)
    v = _rand(rng, 3, s, hkv, d)
    ref = attention(q, k, v, causal_mask(s, s))
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-3)


def test_flash_bf16(rng):
    s, h, hkv, d = 64, 4, 2, 64
    q = _rand(rng, 1, s, h, d).astype(jnp.bfloat16)
    k = _rand(rng, 1, s, hkv, d).astype(jnp.bfloat16)
    v = _rand(rng, 1, s, hkv, d).astype(jnp.bfloat16)
    ref = attention(q, k, v, causal_mask(s, s))
    out = flash_attention(q, k, v, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_flash_ragged_s(rng):
    """S not a multiple of any block size: padded outside, sliced back."""
    s, h, hkv, d = 75, 4, 2, 64
    q = _rand(rng, 1, s, h, d)
    k = _rand(rng, 1, s, hkv, d)
    v = _rand(rng, 1, s, hkv, d)
    ref = attention(q, k, v, causal_mask(s, s))
    out = flash_attention(q, k, v, interpret=True)
    assert out.shape == (1, s, h, d)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-3)


def test_flash_streaming_long_s(rng):
    """S large enough that round-1's whole-stream VMEM residency would not
    fit keeps working: the kernel streams K/V in (BK, D) tiles."""
    s, h, hkv, d = 1024, 2, 1, 64
    q = _rand(rng, 1, s, h, d)
    k = _rand(rng, 1, s, hkv, d)
    v = _rand(rng, 1, s, hkv, d)
    ref = attention(q, k, v, causal_mask(s, s))
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-3)
