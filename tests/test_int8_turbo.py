"""Int8 turbo mode (W8A8, s8 MXU) — the clearly-labeled speed extension.

Not MicroMix numerics; accuracy expectations are W8A8/SmoothQuant-class.
Locks: per-layer quantization error bounds, forward agreement with the
dense model, engine serving, checkpoint round-trip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micromix_tpu.models import (
    Int8TurboLinear, ModelConfig, forward, quantize_model_int8_turbo,
    random_dense_params)
from micromix_tpu.serve import Engine, Request


def _cfg(**kw):
    base = dict(arch="llama", vocab_size=128, hidden_size=128,
                intermediate_size=256, num_layers=2, num_heads=4,
                num_kv_heads=2, head_dim=32, rope_theta=10000.0,
                rms_eps=1e-6)
    base.update(kw)
    return ModelConfig(**base)


def test_linear_error_bound(rng):
    from micromix_tpu.models.common import DenseLinear
    from micromix_tpu.models.surgery import quantize_model_int8_turbo

    w = jnp.asarray(rng.normal(0, 0.1, (64, 128)), jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 1, (8, 128)), jnp.bfloat16)
    dense = DenseLinear(w=w, bias=None)
    cfg = _cfg(num_layers=1)
    p = {"embed": jnp.zeros((2, 128)), "final_ln": jnp.ones((128,)),
         "lm_head": jnp.zeros((2, 128)),
         "layers": [{"ln1": jnp.ones((128,)), "ln2": jnp.ones((128,)),
                     "q": dense, "k": dense, "v": dense,
                     "o": DenseLinear(w=jnp.asarray(
                         rng.normal(0, 0.1, (128, 128)), jnp.bfloat16)),
                     "gate": DenseLinear(w=jnp.asarray(
                         rng.normal(0, 0.1, (256, 128)), jnp.bfloat16)),
                     "up": DenseLinear(w=jnp.asarray(
                         rng.normal(0, 0.1, (256, 128)), jnp.bfloat16)),
                     "down": DenseLinear(w=jnp.asarray(
                         rng.normal(0, 0.1, (128, 256)), jnp.bfloat16))}]}
    turbo = quantize_model_int8_turbo(p, cfg)["layers"][0]["q"]
    assert isinstance(turbo, Int8TurboLinear)
    ref = np.asarray(dense(x), np.float32)
    got = np.asarray(turbo(x), np.float32)
    # w8a8 relative error ~1%: both operands keep >= 7 bits of precision
    denom = np.maximum(np.abs(ref), np.abs(ref).mean())
    assert (np.abs(got - ref) / denom).max() < 0.05


def test_forward_tracks_dense(rng):
    cfg = _cfg()
    dense = random_dense_params(cfg, seed=80)
    turbo = quantize_model_int8_turbo(dense, cfg)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 16)), jnp.int32)
    yd = np.asarray(forward(dense, cfg, toks, use_flash=False), np.float32)
    yt = np.asarray(forward(turbo, cfg, toks, use_flash=False), np.float32)
    assert np.corrcoef(yd.ravel(), yt.ravel())[0, 1] > 0.999
    np.testing.assert_allclose(yt, yd, rtol=0.1, atol=0.1)


def test_engine_serves_turbo_model(rng):
    cfg = _cfg(vocab_size=64)
    turbo = quantize_model_int8_turbo(random_dense_params(cfg, seed=81), cfg)
    eng = Engine(turbo, cfg, max_seqs=2, page_size=16, max_pages_per_seq=4,
                 prefill_buckets=(16,), decode_chunk=2)
    reqs = [Request(req_id=i, prompt=list(rng.integers(0, 64, 6)),
                    max_new_tokens=4) for i in range(2)]
    eng.run(reqs)
    assert all(r.done and len(r.output) == 4 for r in reqs)


def test_checkpoint_roundtrip(tmp_path, rng):
    from micromix_tpu.models import load_params, save_params

    cfg = _cfg(num_layers=1)
    turbo = quantize_model_int8_turbo(random_dense_params(cfg, seed=82), cfg)
    save_params(str(tmp_path / "ck"), turbo, cfg)
    loaded, cfg2, _ = load_params(str(tmp_path / "ck"))
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 8)), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(forward(turbo, cfg, toks, use_flash=False)),
        np.asarray(forward(loaded, cfg2, toks, use_flash=False)))
