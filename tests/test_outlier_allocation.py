"""Mixed-precision allocation on outlier-structured activations.

THE test that fails if precision allocation stops working (VERDICT r3
missing #2 / next-step 3).  The reference's numeric tier plants large-
magnitude trailing channels before checking quantized-matmul error
(mgemm/test.py:13-20); here the same idea runs at MODEL level through
the full pipeline — calibrate -> smooth -> quantize -> perplexity — on a
synthetic model whose residual stream carries planted outlier channels
(the structure real LLMs exhibit and MicroMix exists to exploit,
reorder_indices.py:35-111):

  1. calibration's saliency sort must place the planted channels in the
     MXFP8 segment at every hidden-state site;
  2. the resulting budget must be genuinely mixed (~4.x avg bits, not
     the all-fp8 collapse random activations produce — the r3 golden
     pipeline's blind spot);
  3. dppl(mixed) must be a small fraction of dppl(all-MXFP4) and close
     to dppl(all-MXFP8): the mixed budget holds perplexity where fp4
     alone does not, at roughly half fp8's activation bits.

Golden margins recorded 2026-08-20 (CPU float semantics, fixed seeds)
are in BASELINE.md "Outlier-structured synthetic accuracy".
"""

import numpy as np

import jax.numpy as jnp

from micromix_tpu.calib.allocate import average_bits, stats_to_calibration
from micromix_tpu.calib.smooth import smooth_params
from micromix_tpu.calib.stats import collect_calibration
from micromix_tpu.eval.datasets import synthetic_tokens
from micromix_tpu.eval.ppl import eval_ppl
from micromix_tpu.models import (
    ModelConfig, quantize_model, random_dense_params)
from micromix_tpu.models.surgery import ATTN_IN, MLP_IN, SiteCalibration

OUTLIER_SCALE = 24.0
N_OUTLIERS = 32


def _planted_model():
    """2-layer llama-shaped model whose embedding (and thus residual
    stream) carries N_OUTLIERS channels at ~24x typical magnitude."""
    cfg = ModelConfig(arch="llama", vocab_size=512, hidden_size=1024,
                      intermediate_size=2048, num_layers=2, num_heads=8,
                      num_kv_heads=4, head_dim=128, rope_theta=10000.0,
                      rms_eps=1e-6)
    params = random_dense_params(cfg, seed=123)
    rng = np.random.default_rng(123)
    outlier_idx = np.sort(rng.choice(cfg.hidden_size, N_OUTLIERS,
                                     replace=False)).astype(np.int32)
    emb = np.asarray(params["embed"], np.float32)
    emb[:, outlier_idx] *= OUTLIER_SCALE
    params["embed"] = jnp.asarray(emb, jnp.bfloat16)
    # persistent outliers: every residual write (attn o_proj, mlp
    # down_proj) reinforces the same channels, as real LLMs' outlier
    # channels do — scale those OUTPUT rows.  lm_head stays UNSCALED
    # (scaling it would just blow up the logit range, not plant
    # activation structure).
    for lyr in params["layers"]:
        for name in ("o", "down"):
            w = np.asarray(lyr[name].w, np.float32)
            w[outlier_idx] *= OUTLIER_SCALE
            lyr[name] = type(lyr[name])(w=jnp.asarray(w, jnp.bfloat16),
                                        bias=lyr[name].bias)
    return cfg, params, outlier_idx


def _force_uniform(calibs, p6_frac, p8_frac):
    """Same saliency order, forced segment sizes (0/0 = all-fp4,
    0/1 = all-fp8) — isolates the allocation decision itself."""
    out = []
    for lc in calibs:
        out.append({
            name: SiteCalibration(
                c.reorder_index,
                int(len(c.reorder_index) * p6_frac),
                int(len(c.reorder_index) * p8_frac))
            for name, c in lc.items()
        })
    return out


def test_outlier_allocation_and_ppl():
    cfg, params, outlier_idx = _planted_model()
    stream = synthetic_tokens(cfg.vocab_size, 2048, seed=123)
    calib_batches = [stream[i * 64:(i + 1) * 64][None, :] for i in range(4)]
    stats = collect_calibration(params, cfg, calib_batches)
    calibs = stats_to_calibration(stats, cfg)
    bits = average_bits(calibs, cfg)

    # 1. the planted channels land in the fp8 (tail) segment of every
    #    hidden-state site's saliency order
    for i in range(cfg.num_layers):
        for name in (ATTN_IN, MLP_IN):
            c = calibs[i][name]
            k = len(c.reorder_index)
            k4, k6, k8 = c.splits(k)
            assert k8 >= N_OUTLIERS, (i, name, c.splits(k))
            tail = set(np.asarray(c.reorder_index)[k4 + k6:].tolist())
            hit = sum(int(ch) in tail for ch in outlier_idx)
            # layer 0 sees the planted structure undiluted; deeper layers'
            # residual streams may promote a few organic channels past it
            want = N_OUTLIERS if i == 0 else int(0.85 * N_OUTLIERS)
            assert hit >= want, (i, name, hit)

    # 2. the budget is genuinely mixed: most channels fp4, a thin fp8 tail
    assert 4.2 < bits < 5.8, bits

    # 3. perplexity: mixed tracks all-fp8; all-fp4 falls off a cliff
    smoothed = smooth_params(params, cfg, stats, alpha=0.5)
    dense_ppl = float(eval_ppl(params, cfg, stream[:512], seqlen=128))
    ppl_mixed = float(eval_ppl(quantize_model(smoothed, cfg, calibs),
                               cfg, stream[:512], seqlen=128))
    ppl_fp4 = float(eval_ppl(
        quantize_model(smoothed, cfg, _force_uniform(calibs, 0.0, 0.0)),
        cfg, stream[:512], seqlen=128))
    ppl_fp8 = float(eval_ppl(
        quantize_model(smoothed, cfg, _force_uniform(calibs, 0.0, 1.0)),
        cfg, stream[:512], seqlen=128))

    d_mixed = ppl_mixed - dense_ppl
    d_fp4 = ppl_fp4 - dense_ppl
    d_fp8 = ppl_fp8 - dense_ppl
    import os
    if os.environ.get("PRINT_GOLDEN"):
        print(f"\nOUTLIER: dense={dense_ppl:.4f} mixed={ppl_mixed:.4f} "
              f"fp4={ppl_fp4:.4f} fp8={ppl_fp8:.4f} avg_bits={bits:.2f}")
    assert np.isfinite([dense_ppl, ppl_mixed, ppl_fp4, ppl_fp8]).all()
    # Weights are MXFP4 in every config, so dppl(all-fp8-activations) is
    # the shared weight-quantization floor; the ACTIVATION-allocation
    # signal is each config's excess over it.  Recorded 2026-08-20:
    # dense=604.81 mixed=623.12 fp4=637.32 fp8=621.46, avg_bits=5.10
    # -> excess(fp4)=15.9, excess(mixed)=1.7 (a 10x separation).
    ex_mixed = d_mixed - d_fp8
    ex_fp4 = d_fp4 - d_fp8
    # all-fp4 activations must degrade materially past the weight floor
    # (otherwise the comparison is vacuous)
    assert ex_fp4 > 8.0, (d_fp4, d_fp8)
    # the calibrated ~5-bit mixed budget recovers (almost) all of that
    # damage: dppl(mixed) << dppl(all-fp4), ~= dppl(all-fp8)
    assert ex_mixed < 0.25 * ex_fp4, (ex_mixed, ex_fp4)
    assert d_mixed < d_fp8 * 1.25, (d_mixed, d_fp8)
