"""Quantized-checkpoint round-trip tests (models/checkpoint.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micromix_tpu.models import (
    ModelConfig, default_calibration, forward, load_params, quantize_model,
    random_dense_params, save_params)


def _cfg(**kw):
    base = dict(arch="llama", vocab_size=128, hidden_size=256,
                intermediate_size=384, num_layers=2, num_heads=4,
                num_kv_heads=2, head_dim=64, rope_theta=10000.0,
                rms_eps=1e-5)
    base.update(kw)
    return ModelConfig(**base)


def _trees_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, (ta, tb)
    for x, y in zip(la, lb):
        assert x.dtype == y.dtype, (x.dtype, y.dtype)
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_quantized_roundtrip(tmp_path):
    cfg = _cfg()
    qparams = quantize_model(
        random_dense_params(cfg, seed=0), cfg,
        default_calibration(cfg, p6=32, p8=32, seed=0))
    save_params(str(tmp_path / "ck"), qparams, cfg, meta={"note": "t"})
    loaded, cfg2, meta = load_params(str(tmp_path / "ck"))
    assert cfg2 == cfg and meta == {"note": "t"}
    _trees_equal(qparams, loaded)

    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 8)),
        jnp.int32)
    y0 = forward(qparams, cfg, tokens)
    y1 = forward(loaded, cfg, tokens)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_dense_roundtrip(tmp_path):
    cfg = _cfg(arch="mixtral", num_experts=4, num_experts_per_tok=2)
    params = random_dense_params(cfg, seed=1)
    save_params(str(tmp_path / "d"), params, cfg)
    loaded, cfg2, _ = load_params(str(tmp_path / "d"))
    assert cfg2 == cfg
    _trees_equal(params, loaded)


def test_async_orbax_roundtrip(tmp_path, rng):
    """save_params_async (orbax background write) round-trips the
    quantized pytree bit-for-bit, including ScaledW8 leaves."""
    pytest.importorskip("orbax.checkpoint")
    from micromix_tpu.models import default_calibration, quantize_model
    from micromix_tpu.models.checkpoint import (
        load_params_async, save_params_async)

    cfg = _cfg(num_layers=1)
    params = quantize_model(random_dense_params(cfg, seed=90), cfg,
                            default_calibration(cfg, p6=32, p8=32))
    ck = save_params_async(str(tmp_path / "ck"), params, cfg)
    ck.wait_until_finished()
    loaded, cfg2, _ = load_params_async(str(tmp_path / "ck"))
    assert cfg2 == cfg
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_roundtrip_hetero_model(tmp_path, rng):
    """Hetero-budget pytrees (FakeQuantSite leaves) bake and restore."""
    from micromix_tpu.models.checkpoint import load_params, save_params
    from micromix_tpu.models.hetero import quantize_model_hetero
    from micromix_tpu.models.surgery import default_calibration

    cfg = _cfg()
    dense = random_dense_params(cfg, seed=31)
    het = quantize_model_hetero(dense, cfg,
                                default_calibration(cfg, p6=32, p8=32,
                                                    seed=2))
    save_params(str(tmp_path / "ck"), het, cfg)
    loaded, cfg2, _ = load_params(str(tmp_path / "ck"))
    assert cfg2 == cfg
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 12)), jnp.int32)
    a = forward(het, cfg, toks, use_flash=False)
    b = forward(loaded, cfg, toks, use_flash=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
