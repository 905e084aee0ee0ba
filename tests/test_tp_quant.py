"""TP v2 (K-sharded o/down + psum, shard-local quantization) correctness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micromix_tpu.models import (
    ModelConfig, default_calibration, forward, quantize_model,
    random_dense_params)
from micromix_tpu.models.surgery import SiteCalibration
from micromix_tpu.parallel import make_mesh
from micromix_tpu.parallel.tp_quant import (
    quantize_model_tp, shard_params_tp, sharded_forward_tp,
    split_site_calibration)


def _cfg(**kw):
    base = dict(arch="llama", vocab_size=128, hidden_size=128,
                intermediate_size=256, num_layers=2, num_heads=4,
                num_kv_heads=2, head_dim=32, rope_theta=10000.0,
                rms_eps=1e-6)
    base.update(kw)
    return ModelConfig(**base)


def test_split_site_calibration():
    k, tp = 256, 2
    rng = np.random.default_rng(0)
    order = rng.permutation(k).astype(np.int32)
    calib = SiteCalibration(order, p6_num=128, p8_num=128)
    locals_ = split_site_calibration(calib, k, tp)
    assert len(locals_) == tp
    for i, c in enumerate(locals_):
        assert c.p6_num == 64 and c.p8_num == 64  # 128/2, already 32-aligned
        assert len(c.reorder_index) == k // tp
        # local indices are a permutation of [0, k/tp)
        assert sorted(c.reorder_index) == list(range(k // tp))
        # order preservation: global saliency rank increases along the list
        shard_srcs = [s for s in order if s // (k // tp) == i]
        np.testing.assert_array_equal(
            np.asarray(c.reorder_index),
            np.asarray(shard_srcs) - i * (k // tp))


def test_tp2_matches_single_chip_identity_fp4(rng):
    """Identity calibration + k4-only budgets: shard-local quantization
    groups coincide with global ones -> TP-v2 equals the single-chip
    quantized forward (up to f32 accumulation order)."""
    cfg = _cfg()
    dense = random_dense_params(cfg, seed=0)
    calibs = default_calibration(cfg, p6=0, p8=0)  # identity perm
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 16)), jnp.int32)

    ref = forward(quantize_model(dense, cfg, calibs), cfg, tokens)

    tp = 2
    mesh = make_mesh(data=1, model=tp, devices=jax.devices()[:tp])
    tparams = shard_params_tp(quantize_model_tp(dense, cfg, calibs, tp),
                              mesh)
    out = sharded_forward_tp(tparams, cfg, tokens, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_tp2_mixed_budgets_close_to_dense(rng):
    """Saliency calibration with fp6/fp8 budgets: shard-local allocation
    differs from global but must stay within quantization error of the
    bf16 model (and be finite)."""
    cfg = _cfg(num_heads=8, num_kv_heads=4, head_dim=32, hidden_size=256,
               intermediate_size=512)
    dense = random_dense_params(cfg, seed=1)
    calibs = default_calibration(cfg, p6=128, p8=128, seed=3)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)

    ref_dense = np.asarray(forward(dense, cfg, tokens)).ravel()
    ref_quant = np.asarray(
        forward(quantize_model(dense, cfg, calibs), cfg, tokens)).ravel()

    tp = 4
    mesh = make_mesh(data=1, model=tp, devices=jax.devices()[:tp])
    tparams = shard_params_tp(quantize_model_tp(dense, cfg, calibs, tp),
                              mesh)
    out = sharded_forward_tp(tparams, cfg, tokens, mesh)
    a = np.asarray(out).ravel()
    assert np.isfinite(a).all()
    # shard-local allocation tracks the single-chip quantized model closely
    assert np.corrcoef(a, ref_quant)[0, 1] > 0.97
    # and degrades accuracy vs bf16 no more than global allocation does
    corr_tp = np.corrcoef(a, ref_dense)[0, 1]
    corr_global = np.corrcoef(ref_quant, ref_dense)[0, 1]
    assert corr_tp > corr_global - 0.02, (corr_tp, corr_global)


def test_tp2_dp_combo(rng):
    cfg = _cfg()
    dense = random_dense_params(cfg, seed=2)
    calibs = default_calibration(cfg, p6=0, p8=0)
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    tparams = shard_params_tp(quantize_model_tp(dense, cfg, calibs, 2),
                              mesh)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 8)), jnp.int32)
    out = sharded_forward_tp(tparams, cfg, tokens, mesh)
    assert out.shape == (2, 8, cfg.vocab_size)
    ref = forward(quantize_model(dense, cfg, calibs), cfg, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


# ---------------------------------------------------------------------------
# Hetero TP (parallel/tp_hetero.py): budgets-as-data shard-local allocation
# ---------------------------------------------------------------------------


def test_split_site_calibration_hetero_tracks_global():
    """Shard budgets follow the GLOBAL format membership, not an even
    split: put every fp8 channel on shard 0 and check the counts."""
    from micromix_tpu.parallel.tp_hetero import split_site_calibration_hetero

    k, tp = 256, 2
    k_l = k // tp
    # ascending saliency order: shard-1 channels first (fp4), then shard-0
    # channels (the last 64 positions -> fp8 under p8_num=64)
    order = np.concatenate([np.arange(k_l, k), np.arange(0, k_l)])
    calib = SiteCalibration(order.astype(np.int32), p6_num=0, p8_num=64)
    locals_ = split_site_calibration_hetero(calib, k, tp)
    assert locals_[0].p8_num == 64      # all fp8 channels live on shard 0
    assert locals_[1].p8_num == 0       # none on shard 1
    # segmented split would have forced 32/32 on both shards
    for c in locals_:
        assert sorted(c.reorder_index) == list(range(k_l))


def test_tph_matches_single_chip_identity_fp4(rng):
    """Identity calibration + k4-only budgets: shard-local canonical
    blocks coincide with global ones -> hetero TP equals the single-chip
    hetero forward (up to f32 accumulation order)."""
    from micromix_tpu.models.hetero import quantize_model_hetero
    from micromix_tpu.parallel.tp_hetero import (
        quantize_model_tp_hetero, shard_params_tp_hetero,
        sharded_forward_tp_hetero)

    cfg = _cfg()
    dense = random_dense_params(cfg, seed=0)
    calibs = default_calibration(cfg, p6=0, p8=0)  # identity perm
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 16)), jnp.int32)

    # the reference must be JITTED: eager and compiled fakequant legally
    # round bf16 differently and quantization amplifies the flips (same
    # rationale as test_pp_stacks_heterogeneous_budgets's loose bound) —
    # against the jitted single-chip forward the TP program is bit-tight
    ref = jax.jit(lambda p, t: forward(p, cfg, t, use_flash=False))(
        quantize_model_hetero(dense, cfg, calibs), tokens)

    tp = 2
    mesh = make_mesh(data=1, model=tp, devices=jax.devices()[:tp])
    tparams = shard_params_tp_hetero(
        quantize_model_tp_hetero(dense, cfg, calibs, tp), mesh)
    out = sharded_forward_tp_hetero(tparams, cfg, tokens, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_tph_mixed_budgets_close_to_global(rng):
    """Saliency calibration with fp6/fp8 budgets: per-shard budgets keep
    the global format map, so the sharded forward should track the
    single-chip hetero model at least as well as segmented TP tracks its
    global model."""
    from micromix_tpu.models.hetero import quantize_model_hetero
    from micromix_tpu.parallel.tp_hetero import (
        quantize_model_tp_hetero, shard_params_tp_hetero,
        sharded_forward_tp_hetero)

    cfg = _cfg(num_heads=8, num_kv_heads=4, head_dim=32, hidden_size=256,
               intermediate_size=512)
    dense = random_dense_params(cfg, seed=1)
    calibs = default_calibration(cfg, p6=128, p8=128, seed=3)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)

    ref_dense = np.asarray(forward(dense, cfg, tokens)).ravel()
    ref_het = np.asarray(jax.jit(
        lambda p, t: forward(p, cfg, t, use_flash=False))(
            quantize_model_hetero(dense, cfg, calibs), tokens)).ravel()

    tp = 4
    mesh = make_mesh(data=1, model=tp, devices=jax.devices()[:tp])
    tparams = shard_params_tp_hetero(
        quantize_model_tp_hetero(dense, cfg, calibs, tp), mesh)
    out = sharded_forward_tp_hetero(tparams, cfg, tokens, mesh)
    a = np.asarray(out).ravel()
    assert np.isfinite(a).all()
    assert np.corrcoef(a, ref_het)[0, 1] > 0.97
    corr_tp = np.corrcoef(a, ref_dense)[0, 1]
    corr_global = np.corrcoef(ref_het, ref_dense)[0, 1]
    assert corr_tp > corr_global - 0.02, (corr_tp, corr_global)
