"""Expert-parallel serving: EP Mixtral engine vs the single-chip engine.

8-virtual-CPU-device mesh; the stacked experts are the SAME quantized
weights (quantize -> stack), so greedy generations must agree with the
single-chip engine (f32 expert-sum order differs only across the psum
boundary)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micromix_tpu.models import (
    ModelConfig, default_calibration, quantize_model, random_dense_params)
from micromix_tpu.parallel import make_mesh
from micromix_tpu.parallel.ep_serve import make_ep_engine, quantize_model_ep
from micromix_tpu.serve import Engine, Request


def _cfg(**kw):
    base = dict(arch="mixtral", vocab_size=128, hidden_size=128,
                intermediate_size=256, num_layers=2, num_heads=4,
                num_kv_heads=2, head_dim=32, rope_theta=10000.0,
                rms_eps=1e-6, num_experts=4, num_experts_per_tok=2)
    base.update(kw)
    return ModelConfig(**base)


def _reqs(rng, cfg, n=3):
    return [Request(req_id=i,
                    prompt=list(rng.integers(0, cfg.vocab_size, 5 + 2 * i)),
                    max_new_tokens=5)
            for i in range(n)]


def test_ep_engine_matches_single_chip(rng):
    cfg = _cfg()
    dense = random_dense_params(cfg, seed=90)
    calibs = default_calibration(cfg, p6=32, p8=32, seed=90)

    eng1 = Engine(quantize_model(dense, cfg, calibs), cfg, max_seqs=2,
                  page_size=16, max_pages_per_seq=8, prefill_buckets=(16,),
                  decode_chunk=2)
    out1 = [r.output for r in eng1.run(_reqs(np.random.default_rng(6), cfg))]

    mesh = make_mesh(expert=2, devices=jax.devices()[:2])
    eng2 = make_ep_engine(quantize_model_ep(dense, cfg, calibs), cfg, mesh,
                          max_seqs=2, page_size=16, max_pages_per_seq=8,
                          prefill_buckets=(16,), decode_chunk=2)
    out2 = [r.output for r in eng2.run(_reqs(np.random.default_rng(6), cfg))]
    assert out1 == out2


def test_ep_engine_capacity_dispatch_and_features(rng):
    """EP serving with fixed-capacity dispatch + chunked prefill (long
    prompt) + logprobs through the shard-mapped variants."""
    import dataclasses
    cfg = dataclasses.replace(_cfg(), moe_capacity_factor=2.0)
    dense = random_dense_params(cfg, seed=91)
    calibs = default_calibration(cfg, p6=32, p8=32, seed=91)
    mesh = make_mesh(expert=4, devices=jax.devices()[:4])
    eng = make_ep_engine(quantize_model_ep(dense, cfg, calibs), cfg, mesh,
                         max_seqs=2, page_size=16, max_pages_per_seq=8,
                         prefill_buckets=(16,), decode_chunk=2)
    long_prompt = list(np.random.default_rng(8).integers(
        0, cfg.vocab_size, 40))  # > largest bucket -> chunked hist prefill
    reqs = [Request(req_id=0, prompt=long_prompt, max_new_tokens=4,
                    logprobs=True),
            Request(req_id=1, prompt=list(np.random.default_rng(9).integers(
                0, cfg.vocab_size, 7)), max_new_tokens=4)]
    eng.run(reqs)
    for r in reqs:
        assert r.done and len(r.output) == 4
    assert len(reqs[0].token_logprobs) == 4
    assert all(np.isfinite(v) and v <= 0.0 for v in reqs[0].token_logprobs)
