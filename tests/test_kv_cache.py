"""Quantized paged KV cache + decode attention (XLA ref vs Pallas kernel)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micromix_tpu.serve.attention import (
    paged_decode_attention,
    paged_decode_attention_xla,
)
from micromix_tpu.serve.kv_cache import (
    append_kv,
    gather_kv,
    kv_dequantize,
    kv_quantize,
    make_cache,
)
from micromix_tpu.models.common import quantize_int_group


@pytest.mark.parametrize("bits", [4, 8])
def test_kv_quantize_matches_fake_quant(rng, bits):
    x = jnp.asarray(rng.normal(0, 1, (6, 2, 128)), jnp.float32)
    codes, scale, zero = kv_quantize(x, bits)
    dq = kv_dequantize(codes, scale, zero, bits, dtype=jnp.float32)
    want = quantize_int_group(x, bits, group_size=128)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def _build_cache(rng, bits=4, b=3, hkv=2, d=128, ps=16, lens=(10, 32, 47)):
    mp = 4
    cache = make_cache(n_pages=b * mp + 1, page_size=ps, n_kv=hkv,
                       head_dim=d, max_seqs=b, max_pages_per_seq=mp,
                       bits=bits)
    # allocate pages: seq i gets pages [i*mp+1, ...] (page 0 kept as dummy)
    table = np.zeros((b, mp), np.int32)
    for i in range(b):
        table[i] = np.arange(mp) + i * mp + 1
    cache = cache.__class__(**{**cache.__dict__,
                               "page_table": jnp.asarray(table)})
    kvs = []
    for i, n in enumerate(lens):
        k = rng.normal(0, 1, (n, hkv, d)).astype(np.float32)
        v = rng.normal(0, 1, (n, hkv, d)).astype(np.float32)
        kvs.append((k, v))
        cache = append_kv(cache, jnp.full((n,), i, jnp.int32),
                          jnp.arange(n, dtype=jnp.int32),
                          jnp.asarray(k), jnp.asarray(v))
    return cache, kvs


def test_append_and_gather_roundtrip(rng):
    cache, kvs = _build_cache(rng)
    assert cache.lengths.tolist() == [10, 32, 47]
    k0, v0 = gather_kv(cache, 0, 16)
    want = quantize_int_group(jnp.asarray(kvs[0][0]), 4, 128)
    np.testing.assert_allclose(np.asarray(k0[:10], np.float32),
                               np.asarray(want, np.float32),
                               rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("bits", [4, 8])
def test_xla_decode_attention_vs_dense(rng, bits):
    """The paged XLA path must equal plain softmax attention over the
    (fake-quantized) KV."""
    cache, kvs = _build_cache(rng, bits=bits)
    b, hkv, d = 3, 2, 128
    h = 8
    q = jnp.asarray(rng.normal(0, 1, (b, h, d)), jnp.float32)
    out = paged_decode_attention_xla(q.astype(jnp.bfloat16), cache,
                                     jnp.arange(b))
    for i, (k, v) in enumerate(kvs):
        kq = np.asarray(quantize_int_group(jnp.asarray(k), bits, d))
        vq = np.asarray(quantize_int_group(jnp.asarray(v), bits, d))
        g = h // hkv
        qv = np.asarray(q[i]).reshape(hkv, g, d)
        s = np.einsum("kgd,tkd->kgt", qv, kq) / np.sqrt(d)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        o = np.einsum("kgt,tkd->kgd", p, vq).reshape(h, d)
        np.testing.assert_allclose(np.asarray(out[i], np.float32), o,
                                   rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("bits", [4, 8])
def test_pallas_decode_attention_matches_xla(rng, bits):
    cache, _ = _build_cache(rng, bits=bits)
    b, h, d = 3, 8, 128
    q = jnp.asarray(rng.normal(0, 1, (b, h, d)), jnp.bfloat16)
    want = paged_decode_attention_xla(q, cache, jnp.arange(b))
    got = paged_decode_attention(q, cache, jnp.arange(b), interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_pallas_decode_attention_sliding_window(rng):
    cache, _ = _build_cache(rng, bits=4)
    b, h, d = 3, 4, cache.head_dim
    q = jnp.asarray(rng.normal(0, 1, (b, h, d)), jnp.bfloat16)
    for w in (8, 24):
        want = paged_decode_attention_xla(q, cache, jnp.arange(b),
                                          sliding_window=w)
        got = paged_decode_attention(q, cache, jnp.arange(b),
                                     sliding_window=w, interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=3e-2, atol=3e-2)
    # window larger than any length == no window
    want = paged_decode_attention_xla(q, cache, jnp.arange(b))
    got = paged_decode_attention(q, cache, jnp.arange(b),
                                 sliding_window=4096, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_dense_bf16_cache_mode(rng):
    """bits=16: raw bf16 pages (FlashInfer *_f16 analog) — decode attention
    must match the quant-free dense attention exactly (up to f32 order)."""
    cache, kvs = _build_cache(rng, bits=16)
    b, h, d = 3, 4, cache.head_dim
    q = jnp.asarray(rng.normal(0, 1, (b, h, d)), jnp.bfloat16)
    want = paged_decode_attention_xla(q, cache, jnp.arange(b))
    got = paged_decode_attention(q, cache, jnp.arange(b), interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=3e-2, atol=3e-2)
    # and the cache stores exact bf16 values
    k0, _ = kvs[0]
    from micromix_tpu.serve.kv_cache import gather_kv
    kd, _ = gather_kv(cache, 0, 16)
    np.testing.assert_allclose(
        np.asarray(kd[:10], np.float32),
        np.asarray(jnp.asarray(k0[:10]).astype(jnp.bfloat16), np.float32))


def test_pallas_decode_attention_fused_rope(rng):
    """q-side RoPE fused in-kernel == rotating q outside then attending
    (up to the bf16 round the outside path pays between rope and dot)."""
    from micromix_tpu.models.common import rope_inv_freq
    from micromix_tpu.serve.runner import _rope1, _rope_angles
    from micromix_tpu.models.common import ModelConfig

    cache, _ = _build_cache(rng, bits=4)
    b, h, d = 3, 8, cache.head_dim
    cfg = ModelConfig(arch="llama", vocab_size=8, hidden_size=8,
                      intermediate_size=8, num_layers=1, num_heads=h,
                      num_kv_heads=cache.n_kv_heads, head_dim=d,
                      rope_theta=10000.0)
    positions = jnp.asarray([3, 7, 11], jnp.int32)
    inv = rope_inv_freq(d, cfg.rope_theta, None)
    q = jnp.asarray(rng.normal(0, 1, (b, h, d)), jnp.bfloat16)

    fused = paged_decode_attention(q, cache, jnp.arange(b),
                                   rope_positions=positions,
                                   rope_inv_freq=inv, interpret=True)
    cos = jnp.cos(_rope_angles(positions, cfg))
    sin = jnp.sin(_rope_angles(positions, cfg))
    qr = _rope1(q, cos, sin)
    unfused = paged_decode_attention(qr, cache, jnp.arange(b),
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(fused, np.float32),
                               np.asarray(unfused, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_append_kernel_parity(rng):
    """The Pallas append kernel (serve/append_kernel.py) must write
    byte-identical cache contents to the XLA DUS/scatter path."""
    import dataclasses

    import jax.numpy as jnp

    from micromix_tpu.serve.append_kernel import append_kv_kernel
    from micromix_tpu.serve.kv_cache import (_flat_slot_index, kv_quantize,
                                             make_cache)

    for bits in (4, 8, 16):
        cache = make_cache(9, 16, 2, 64, 3, 4, bits=bits)
        pt = np.zeros((3, 4), np.int32)
        pt[0] = [1, 2, 3, 4]
        pt[1] = [5, 6, 7, 8]
        cache = dataclasses.replace(cache, page_table=jnp.asarray(pt))
        # pairwise-distinct target pages (1, 5, 2, 6, 3, 7): the kernel's
        # contract for decode-step appends
        t = 6
        seq_ids = jnp.asarray([0, 1, 0, 1, 0, 1], jnp.int32)
        positions = jnp.asarray([0, 0, 17, 17, 39, 39], jnp.int32)
        k = jnp.asarray(rng.normal(0, 1, (t, 2, 64)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(0, 1, (t, 2, 64)), jnp.bfloat16)
        kq, ks, kz = kv_quantize(k, bits)
        vq, vs, vz = kv_quantize(v, bits)
        ksz = jnp.stack([ks, kz], axis=-1)
        vsz = jnp.stack([vs, vz], axis=-1)
        page_id, off = _flat_slot_index(cache, seq_ids, positions)

        got = append_kv_kernel(cache.k_codes, cache.v_codes, cache.k_sz,
                               cache.v_sz, page_id, off, kq, vq, ksz, vsz,
                               interpret=True)
        want = (cache.k_codes.at[page_id, :, :, off].set(kq),
                cache.v_codes.at[page_id, :, :, off].set(vq),
                cache.k_sz.at[page_id, :, :, off].set(ksz),
                cache.v_sz.at[page_id, :, :, off].set(vsz))
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
