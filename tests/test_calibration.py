"""Calibration pipeline: stats capture, allocation, smoothing, artifacts."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from micromix_tpu.calib import (
    collect_calibration,
    load_calibration,
    save_calibration,
    smooth_params,
    stats_to_calibration,
)
from micromix_tpu.calib.allocate import average_bits
from micromix_tpu.models import (
    ATTN_IN,
    DOWN_IN,
    MLP_IN,
    ModelConfig,
    forward,
    quantize_model,
    random_dense_params,
)


def _cfg(**kw):
    base = dict(
        arch="llama", vocab_size=256, hidden_size=256, intermediate_size=384,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
        rope_theta=10000.0, rms_eps=1e-6,
    )
    base.update(kw)
    return ModelConfig(**base)


def _batches(rng, cfg, n=3, s=24):
    return [rng.integers(0, cfg.vocab_size, (1, s)) for _ in range(n)]


def test_calibration_end_to_end(rng, tmp_path):
    cfg = _cfg()
    params = random_dense_params(cfg, seed=3)
    stats = collect_calibration(params, cfg, _batches(rng, cfg))

    key = f"layer0/{ATTN_IN}"
    assert stats[key]["saliency"].shape == (cfg.hidden_size,)
    assert float(stats[key]["total"]) > 0
    assert float(stats[key]["below6"]) >= float(stats[key]["below4"])

    calibs = stats_to_calibration(stats, cfg)
    assert len(calibs) == cfg.num_layers
    c = calibs[0][ATTN_IN]
    assert sorted(c.reorder_index.tolist()) == list(range(cfg.hidden_size))
    assert c.p6_num % 128 == 0 and c.p8_num % 128 == 0
    bits = average_bits(calibs, cfg)
    assert 4.0 <= bits <= 8.0

    # determinism (reference has no such test; we add it per SURVEY §4)
    stats2 = collect_calibration(params, cfg, _batches(
        np.random.default_rng(0), cfg))
    calibs2 = stats_to_calibration(stats2, cfg)
    np.testing.assert_array_equal(calibs[0][ATTN_IN].reorder_index,
                                  calibs2[0][ATTN_IN].reorder_index)

    # artifact roundtrip
    path = os.path.join(tmp_path, "calib.npz")
    save_calibration(path, calibs, stats)
    loaded, absmax = load_calibration(path)
    np.testing.assert_array_equal(loaded[1][DOWN_IN].reorder_index,
                                  calibs[1][DOWN_IN].reorder_index)
    assert loaded[0][MLP_IN].p8_num == calibs[0][MLP_IN].p8_num
    assert f"layer0/{ATTN_IN}" in absmax

    # quantize with calibrated budgets; forward stays sane
    qparams = quantize_model(params, cfg, calibs)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 16)), jnp.int32)
    ref = np.asarray(forward(params, cfg, toks))
    got = np.asarray(forward(qparams, cfg, toks))
    assert np.isfinite(got).all()
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.7, corr


def test_smoothing_preserves_function(rng):
    """Smoothing rescales ln/W inversely -> dense forward must be unchanged
    (up to bf16 rounding)."""
    cfg = _cfg()
    params = random_dense_params(cfg, seed=4)
    stats = collect_calibration(params, cfg, _batches(rng, cfg, n=2))
    smoothed = smooth_params(params, cfg, stats, alpha=0.5)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 16)), jnp.int32)
    ref = np.asarray(forward(params, cfg, toks))
    got = np.asarray(forward(smoothed, cfg, toks))
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.999, corr


def test_calibration_moe_routed_masks(rng):
    cfg = _cfg(arch="mixtral", num_experts=4, num_experts_per_tok=2)
    params = random_dense_params(cfg, seed=5)
    stats = collect_calibration(params, cfg, _batches(rng, cfg, n=2))
    calibs = stats_to_calibration(stats, cfg)
    assert f"expert0_{MLP_IN}" in calibs[0]
    # every expert site got some tokens or fell back to all-fp8
    for e in range(cfg.num_experts):
        c = calibs[0][f"expert{e}_{MLP_IN}"]
        k4, k6, k8 = c.splits(cfg.hidden_size)
        assert k4 + k6 + k8 == cfg.hidden_size
    qparams = quantize_model(params, cfg, calibs)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 16)), jnp.int32)
    got = np.asarray(forward(qparams, cfg, toks))
    assert np.isfinite(got).all()
