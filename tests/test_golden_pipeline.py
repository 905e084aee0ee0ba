"""Golden end-to-end regression lock (VERDICT r1 item 4c).

Runs the FULL reference pipeline — calibrate (activation stats on a fixed
synthetic stream) -> smooth (SmoothQuant alpha=0.5) -> quantize (mixed
MXFP4/6/8 surgery) -> evaluate (windowed perplexity) — on a fixed synthetic
model and locks the resulting numbers.  A silent numerics regression
anywhere in the chain (stats accumulation, threshold math, smoothing
scales, quantizer, kernels, ppl evaluator) moves these values.

Golden values recorded 2026-08-17 (CPU float semantics; the pipeline is
deterministic given the fixed seeds).  Tolerances are tight but nonzero:
XLA op-fusion changes across jax versions can legally move bf16 rounding.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from micromix_tpu.calib.allocate import average_bits, stats_to_calibration
from micromix_tpu.calib.smooth import smooth_params
from micromix_tpu.calib.stats import collect_calibration
from micromix_tpu.eval.datasets import synthetic_tokens
from micromix_tpu.eval.ppl import eval_ppl
from micromix_tpu.models import (
    ModelConfig, quantize_model, random_dense_params)

# ---- golden numbers (update ONLY with a justified numerics change) ----
# re-record with: PRINT_GOLDEN=1 pytest -s tests/test_golden_pipeline.py
GOLDEN = {
    "dense_ppl": 260.6976,
    "quant_ppl": 260.1685,
    "avg_bits": 7.6,   # random activations have no outlier structure, so
                       # the thresholds push most channels to fp8
}


def _pipeline():
    cfg = ModelConfig(arch="llama", vocab_size=256, hidden_size=128,
                      intermediate_size=256, num_layers=2, num_heads=4,
                      num_kv_heads=2, head_dim=32, rope_theta=10000.0,
                      rms_eps=1e-6)
    params = random_dense_params(cfg, seed=77)
    stream = synthetic_tokens(cfg.vocab_size, 2048, seed=77)

    # 1. calibrate: per-channel stats over 4 windows of 64 tokens
    calib_batches = [stream[i * 64:(i + 1) * 64][None, :] for i in range(4)]
    stats = collect_calibration(params, cfg, calib_batches)
    calibs = stats_to_calibration(stats, cfg)
    bits = average_bits(calibs, cfg)

    # 2. smooth (uses the same stats' absmax)
    smoothed = smooth_params(params, cfg, stats, alpha=0.5)

    # 3. quantize
    qparams = quantize_model(smoothed, cfg, calibs)

    # 4. evaluate
    dense_ppl = eval_ppl(params, cfg, stream[:512], seqlen=128)
    quant_ppl = eval_ppl(qparams, cfg, stream[:512], seqlen=128)
    return bits, float(dense_ppl), float(quant_ppl)


def test_golden_pipeline_numbers():
    bits, dense_ppl, quant_ppl = _pipeline()
    import os
    if os.environ.get("PRINT_GOLDEN"):
        print(f"\nGOLDEN: dense_ppl={dense_ppl:.4f} "
              f"quant_ppl={quant_ppl:.4f} avg_bits={bits:.4f}")
    assert np.isfinite(dense_ppl) and np.isfinite(quant_ppl)
    # the quantized model must track the dense one on this easy stream
    assert quant_ppl < dense_ppl * 1.25
    np.testing.assert_allclose(bits, GOLDEN["avg_bits"], rtol=1e-6)
    np.testing.assert_allclose(dense_ppl, GOLDEN["dense_ppl"], rtol=2e-3)
    np.testing.assert_allclose(quant_ppl, GOLDEN["quant_ppl"], rtol=2e-3)


def _moe_pipeline():
    cfg = ModelConfig(arch="mixtral", vocab_size=256, hidden_size=128,
                      intermediate_size=256, num_layers=2, num_heads=4,
                      num_kv_heads=2, head_dim=32, rope_theta=10000.0,
                      rms_eps=1e-6, num_experts=4, num_experts_per_tok=2)
    params = random_dense_params(cfg, seed=78)
    stream = synthetic_tokens(cfg.vocab_size, 1024, seed=78)
    calib_batches = [stream[i * 64:(i + 1) * 64][None, :] for i in range(4)]
    stats = collect_calibration(params, cfg, calib_batches)
    calibs = stats_to_calibration(stats, cfg)
    smoothed = smooth_params(params, cfg, stats, alpha=0.5)
    qparams = quantize_model(smoothed, cfg, calibs)
    dense_ppl = eval_ppl(params, cfg, stream[:512], seqlen=128)
    quant_ppl = eval_ppl(qparams, cfg, stream[:512], seqlen=128)
    return float(dense_ppl), float(quant_ppl)


GOLDEN_MOE = {  # recorded 2026-08-17 (CPU float semantics, fixed seeds)
    "dense_ppl": 261.7330,
    "quant_ppl": 263.1772,
}


def test_golden_moe_pipeline_numbers():
    """Mixtral (MoE) calibrate -> smooth (incl. expert fan-out) ->
    quantize -> ppl, locked like the Llama golden."""
    dense_ppl, quant_ppl = _moe_pipeline()
    import os
    if os.environ.get("PRINT_GOLDEN"):
        print(f"\nGOLDEN_MOE: dense_ppl={dense_ppl:.4f} "
              f"quant_ppl={quant_ppl:.4f}")
        return
    assert np.isfinite(dense_ppl) and np.isfinite(quant_ppl)
    assert quant_ppl < dense_ppl * 1.25
    np.testing.assert_allclose(dense_ppl, GOLDEN_MOE["dense_ppl"], rtol=2e-3)
    np.testing.assert_allclose(quant_ppl, GOLDEN_MOE["quant_ppl"], rtol=2e-3)


def test_hetero_representation_tracks_segmented():
    """The budgets-as-data (FakeQuantSite) representation and the
    segmented (packed-kernel) representation of the SAME calibrated
    model must yield near-identical perplexity — they encode the same
    MX format assignment, differing only in execution strategy."""
    from micromix_tpu.models.hetero import quantize_model_hetero

    cfg = ModelConfig(arch="llama", vocab_size=256, hidden_size=128,
                      intermediate_size=256, num_layers=2, num_heads=4,
                      num_kv_heads=2, head_dim=32, rope_theta=10000.0,
                      rms_eps=1e-6)
    params = random_dense_params(cfg, seed=77)
    stream = synthetic_tokens(cfg.vocab_size, 1024, seed=77)
    calib_batches = [stream[i * 64:(i + 1) * 64][None, :] for i in range(4)]
    stats = collect_calibration(params, cfg, calib_batches)
    calibs = stats_to_calibration(stats, cfg)
    seg = quantize_model(params, cfg, calibs)
    het = quantize_model_hetero(params, cfg, calibs)
    ppl_seg = float(eval_ppl(seg, cfg, stream[:512], seqlen=128))
    ppl_het = float(eval_ppl(het, cfg, stream[:512], seqlen=128))
    assert abs(ppl_seg - ppl_het) / ppl_seg < 0.01, (ppl_seg, ppl_het)
