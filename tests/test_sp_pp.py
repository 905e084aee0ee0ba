"""Sequence-parallel and pipeline-parallel forwards vs single-device forward.

Runs on the 8-virtual-CPU-device mesh (conftest.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micromix_tpu.models import (
    ModelConfig, default_calibration, forward, quantize_model,
    random_dense_params)
from micromix_tpu.parallel import (
    make_mesh, make_pp_mesh, pipeline_parallel_forward,
    sequence_parallel_forward)


def _cfg(**kw):
    base = dict(arch="llama", vocab_size=128, hidden_size=128,
                intermediate_size=256, num_layers=4, num_heads=4,
                num_kv_heads=2, head_dim=32, rope_theta=10000.0,
                rms_eps=1e-6)
    base.update(kw)
    return ModelConfig(**base)


def _tokens(rng, b, s, v):
    return jnp.asarray(rng.integers(0, v, (b, s)), jnp.int32)


def test_sp_dense_matches_forward(rng):
    cfg = _cfg()
    params = random_dense_params(cfg, seed=0)
    tokens = _tokens(rng, 2, 32, cfg.vocab_size)
    mesh = make_mesh(seq=4, devices=jax.devices()[:4])
    ref = forward(params, cfg, tokens)
    out = sequence_parallel_forward(params, cfg, tokens, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_sp_quantized_matches_forward(rng):
    cfg = _cfg(num_layers=2)
    params = quantize_model(random_dense_params(cfg, seed=1), cfg,
                            default_calibration(cfg, p6=32, p8=32, seed=1))
    tokens = _tokens(rng, 1, 32, cfg.vocab_size)
    mesh = make_mesh(seq=2, devices=jax.devices()[:2])
    ref = forward(params, cfg, tokens)
    out = sequence_parallel_forward(params, cfg, tokens, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=3e-2)


def test_pp_dense_matches_forward(rng):
    cfg = _cfg()
    params = random_dense_params(cfg, seed=2)
    tokens = _tokens(rng, 4, 16, cfg.vocab_size)
    mesh = make_pp_mesh(4, devices=jax.devices()[:4])
    ref = forward(params, cfg, tokens)
    out = pipeline_parallel_forward(params, cfg, tokens, mesh, n_micro=2,
                                    use_flash=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_pp_quantized_matches_forward(rng):
    cfg = _cfg(num_layers=2)
    params = quantize_model(random_dense_params(cfg, seed=3), cfg,
                            default_calibration(cfg, p6=32, p8=32, seed=3))
    tokens = _tokens(rng, 2, 16, cfg.vocab_size)
    mesh = make_pp_mesh(2, devices=jax.devices()[:2])
    ref = forward(params, cfg, tokens)
    out = pipeline_parallel_forward(params, cfg, tokens, mesh, n_micro=2,
                                    use_flash=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=3e-2)


def test_ring_attention_matches_gather_variant(rng):
    """Ring attention == gather-KV sequence parallelism (flash recurrence
    rounding only), dense and quantized, with and without a window."""
    import dataclasses
    from micromix_tpu.models import default_calibration, quantize_model
    from micromix_tpu.parallel import make_mesh
    from micromix_tpu.parallel.sp import sequence_parallel_forward

    cfg = ModelConfig(arch="llama", vocab_size=64, hidden_size=128,
                      intermediate_size=256, num_layers=2, num_heads=4,
                      num_kv_heads=2, head_dim=32, rope_theta=10000.0,
                      rms_eps=1e-6)
    dense = random_dense_params(cfg, seed=70)
    qparams = quantize_model(dense, cfg,
                             default_calibration(cfg, p6=0, p8=0))
    toks = jnp.asarray(rng.integers(0, 64, (1, 32)), jnp.int32)
    mesh = make_mesh(seq=4, devices=jax.devices()[:4])
    gather = sequence_parallel_forward(dense, cfg, toks, mesh)
    ring = sequence_parallel_forward(dense, cfg, toks, mesh, ring=True)
    np.testing.assert_allclose(np.asarray(ring, np.float32),
                               np.asarray(gather, np.float32),
                               rtol=3e-2, atol=3e-2)
    # quantized: the ~bf16-ulp attention difference between the two
    # recurrence orders flips occasional grid decisions at the quantize
    # sites, so individual logits can wiggle; demand high agreement, not
    # elementwise equality (same phenomenon as tests/test_hetero.py PP)
    gq = np.asarray(sequence_parallel_forward(qparams, cfg, toks, mesh),
                    np.float32)
    rq = np.asarray(
        sequence_parallel_forward(qparams, cfg, toks, mesh, ring=True),
        np.float32)
    # (measured: at 1 layer 75% of logits are bit-equal and the rest are
    # grid-step flips; 2 layers compound to corr ~0.977 on this tiny
    # random model whose logit range is ~0.3)
    assert np.corrcoef(gq.ravel(), rq.ravel())[0, 1] > 0.95
    np.testing.assert_allclose(rq, gq, rtol=0.5, atol=0.5)
    # sliding window crossing shard boundaries
    wcfg = dataclasses.replace(cfg, sliding_window=12)
    gather = sequence_parallel_forward(dense, wcfg, toks, mesh)
    ring = sequence_parallel_forward(dense, wcfg, toks, mesh, ring=True)
    np.testing.assert_allclose(np.asarray(ring, np.float32),
                               np.asarray(gather, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_ulysses_attention_matches_gather_variant(rng):
    """Ulysses (all-to-all head swap) == gather-KV sequence parallelism.
    Attention is EXACT full-sequence per head subset, so agreement is
    tighter than the ring recurrence; dense and quantized, with window."""
    import dataclasses
    from micromix_tpu.models import default_calibration, quantize_model
    from micromix_tpu.parallel import make_mesh
    from micromix_tpu.parallel.sp import sequence_parallel_forward

    cfg = ModelConfig(arch="llama", vocab_size=64, hidden_size=128,
                      intermediate_size=256, num_layers=2, num_heads=4,
                      num_kv_heads=4, head_dim=32, rope_theta=10000.0,
                      rms_eps=1e-6)
    dense = random_dense_params(cfg, seed=71)
    toks = jnp.asarray(rng.integers(0, 64, (1, 32)), jnp.int32)
    mesh = make_mesh(seq=4, devices=jax.devices()[:4])
    gather = sequence_parallel_forward(dense, cfg, toks, mesh)
    uly = sequence_parallel_forward(dense, cfg, toks, mesh, attn="ulysses")
    np.testing.assert_allclose(np.asarray(uly, np.float32),
                               np.asarray(gather, np.float32),
                               rtol=3e-2, atol=3e-2)

    qparams = quantize_model(dense, cfg,
                             default_calibration(cfg, p6=0, p8=0))
    qg = sequence_parallel_forward(qparams, cfg, toks, mesh)
    qu = sequence_parallel_forward(qparams, cfg, toks, mesh,
                                   attn="ulysses")
    close = np.isclose(np.asarray(qu, np.float32),
                       np.asarray(qg, np.float32), rtol=3e-2, atol=3e-2)
    assert close.mean() > 0.999

    # sliding window threads through (GQA: kv heads sharded too)
    wcfg = dataclasses.replace(cfg, num_kv_heads=2, sliding_window=12)
    wdense = random_dense_params(wcfg, seed=72)
    wmesh = make_mesh(seq=2, devices=jax.devices()[:2])
    wg = sequence_parallel_forward(wdense, wcfg, toks, wmesh)
    wu = sequence_parallel_forward(wdense, wcfg, toks, wmesh,
                                   attn="ulysses")
    np.testing.assert_allclose(np.asarray(wu, np.float32),
                               np.asarray(wg, np.float32),
                               rtol=3e-2, atol=3e-2)
