"""Model-zoo tests: dense reference forward vs MX-quantized forward.

The quantized forward with generous precision budgets must track the bf16
reference closely (the e2e-accuracy-as-integration-test tier, SURVEY §4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micromix_tpu.models import (
    ModelConfig,
    default_calibration,
    forward,
    quantize_model,
    random_dense_params,
)


def _cfg(arch="llama", **kw):
    base = dict(
        arch=arch, vocab_size=512, hidden_size=256, intermediate_size=384,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
        rope_theta=10000.0, rms_eps=1e-6,
    )
    base.update(kw)
    return ModelConfig(**base)


def _logit_corr(a, b):
    a = a.reshape(-1).astype(np.float64)
    b = b.reshape(-1).astype(np.float64)
    return np.corrcoef(a, b)[0, 1]


@pytest.mark.parametrize("arch,kw", [
    ("llama", {}),
    ("qwen2", dict(qkv_bias=True, sliding_window=64)),
    ("mixtral", dict(num_experts=4, num_experts_per_tok=2)),
])
def test_quantized_forward_tracks_dense(rng, arch, kw):
    cfg = _cfg(arch, **kw)
    params = random_dense_params(cfg, seed=1)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 32)), jnp.int32)
    ref = np.asarray(forward(params, cfg, tokens))
    assert np.isfinite(ref).all()

    # full-precision budget: fp8 activations + symmetric fp8 weights
    calibs8 = default_calibration(cfg, p6=0, p8=cfg.hidden_size, seed=7)
    q8 = quantize_model(params, cfg, calibs8, weight_fp4_only=False)
    got8 = np.asarray(forward(q8, cfg, tokens))
    assert np.isfinite(got8).all()
    corr8 = _logit_corr(ref, got8)
    assert corr8 > 0.97, f"fp8 logit corr {corr8}"

    # mixed budget with fp4 weights: still sane, and strictly worse than fp8
    # (random weights amplify MX error far more than real LLM weights)
    calibs4 = default_calibration(cfg, p6=0, p8=128, seed=7)
    q4 = quantize_model(params, cfg, calibs4)
    got4 = np.asarray(forward(q4, cfg, tokens))
    assert np.isfinite(got4).all()
    corr4 = _logit_corr(ref, got4)
    assert 0.7 < corr4 < corr8, f"mixed logit corr {corr4} vs fp8 {corr8}"


def test_kv_fake_quant_close(rng):
    cfg = _cfg()
    params = random_dense_params(cfg, seed=2)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 16)), jnp.int32)
    ref = np.asarray(forward(params, cfg, tokens))
    kvq = np.asarray(forward(params, cfg, tokens, kv_quant_bits=4))
    corr = _logit_corr(ref, kvq)
    assert corr > 0.95, corr
    assert not np.array_equal(ref, kvq)  # it must actually do something


def test_quantize_int_group_matches_reference_semantics(rng):
    from micromix_tpu.models import quantize_int_group
    x = rng.normal(0, 1, (4, 8, 128)).astype(np.float32)
    y = np.asarray(quantize_int_group(jnp.asarray(x), 4, 128))
    # numpy reimplementation of the asymmetric int4 grid
    xf = x.reshape(-1, 128)
    gmax, gmin = xf.max(-1, keepdims=True), xf.min(-1, keepdims=True)
    scales = np.maximum(gmax - gmin, 1e-5) / 15.0
    base = np.clip(np.round(-gmin / scales), 0, 15)
    q = np.clip(np.round(xf / scales) + base, 0, 15)
    want = ((q - base) * scales).reshape(x.shape)
    np.testing.assert_allclose(y, want, rtol=1e-6, atol=1e-6)


def test_identity_vs_random_reorder_equivalent_dense_math(rng):
    """With identical splits, a random reorder must not change the *dense*
    matmul result (permutation invariance) — only block membership."""
    from micromix_tpu.models import (
        SiteCalibration, quantize_linear)
    from micromix_tpu.mx.mxtensor import dequantize_mixed
    k, n = 256, 128
    w = jnp.asarray(rng.normal(0, 0.1, (n, k)), jnp.float32)
    perm = rng.permutation(k).astype(np.int32)
    lin = quantize_linear(w, SiteCalibration(perm, 0, 0))
    wdq = np.asarray(dequantize_mixed(lin.w))  # (n, k) in permuted order
    # un-permute and compare to quantizing without reorder up to block noise
    unperm = np.empty_like(wdq)
    unperm[:, perm] = wdq
    rel = np.linalg.norm(unperm - np.asarray(w)) / np.linalg.norm(np.asarray(w))
    assert rel < 0.2


def test_weight_only_mxfp8_close_to_dense(rng):
    """BASELINE config 1: MXFP8 weight-only is near-lossless vs bf16."""
    import numpy as np
    import jax.numpy as jnp
    from micromix_tpu.models import (
        ModelConfig, forward, quantize_model_weight_only,
        random_dense_params)

    cfg = ModelConfig(arch="llama", vocab_size=128, hidden_size=128,
                      intermediate_size=256, num_layers=2, num_heads=4,
                      num_kv_heads=2, head_dim=32, rope_theta=10000.0,
                      rms_eps=1e-6)
    dense = random_dense_params(cfg, seed=50)
    tokens = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, (1, 16)),
        jnp.int32)
    ref = np.asarray(forward(dense, cfg, tokens))
    for fmt, tol in (("mxfp8", 0.15), ("mxfp6", 0.3), ("mxfp4", 2.5)):
        wq = quantize_model_weight_only(dense, cfg, fmt)
        out = np.asarray(forward(wq, cfg, tokens))
        err = np.abs(out - ref).max()
        assert err < tol, (fmt, err)
    # error ordering sanity: more bits -> closer to bf16
    e = {}
    for fmt in ("mxfp8", "mxfp6", "mxfp4"):
        out = np.asarray(forward(
            quantize_model_weight_only(dense, cfg, fmt), cfg, tokens))
        e[fmt] = float(np.abs(out - ref).mean())
    assert e["mxfp8"] < e["mxfp6"] < e["mxfp4"], e


def test_weight_only_checkpoint_roundtrip(tmp_path, rng):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from micromix_tpu.models import (
        ModelConfig, forward, load_params, quantize_model_weight_only,
        random_dense_params, save_params)

    cfg = ModelConfig(arch="llama", vocab_size=64, hidden_size=128,
                      intermediate_size=256, num_layers=1, num_heads=2,
                      num_kv_heads=2, head_dim=64, rope_theta=10000.0,
                      rms_eps=1e-6)
    wq = quantize_model_weight_only(random_dense_params(cfg, seed=51), cfg)
    save_params(str(tmp_path / "wo"), wq, cfg)
    loaded, cfg2, _ = load_params(str(tmp_path / "wo"))
    assert cfg2 == cfg
    tokens = jnp.asarray(rng.integers(0, 64, (1, 8)), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(forward(wq, cfg, tokens)),
        np.asarray(forward(loaded, cfg, tokens)))


def test_rope_scaling_llama3():
    """rope_inv_freq llama3 rule vs an independent NumPy reference (HF
    _compute_llama3_parameters), plus loader config parsing."""
    import numpy as np
    from micromix_tpu.models.common import rope_inv_freq
    from micromix_tpu.models.loader import _parse_rope_scaling

    head_dim, theta = 128, 500000.0
    factor, low_f, high_f, orig = 8.0, 1.0, 4.0, 8192
    got = np.asarray(rope_inv_freq(
        head_dim, theta, ("llama3", factor, low_f, high_f, orig)))

    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2) / head_dim))
    wavelen = 2 * np.pi / inv
    ref = []
    for i, f in enumerate(inv):
        wl = wavelen[i]
        if wl < orig / high_f:
            ref.append(f)
        elif wl > orig / low_f:
            ref.append(f / factor)
        else:
            smooth = (orig / wl - low_f) / (high_f - low_f)
            ref.append((1 - smooth) * f / factor + smooth * f)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-6)

    # linear scaling
    lin = np.asarray(rope_inv_freq(head_dim, theta, ("linear", 4.0)))
    np.testing.assert_allclose(lin, inv / 4.0, rtol=1e-6)

    # HF config dict parsing (Llama-3.1 style)
    rs = _parse_rope_scaling({
        "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
        "high_freq_factor": 4.0, "original_max_position_embeddings": 8192})
    assert rs == ("llama3", 8.0, 1.0, 4.0, 8192)
    assert _parse_rope_scaling(None) is None
    assert _parse_rope_scaling({"rope_type": "default"}) is None


def test_rope_scaling_through_forward_and_checkpoint(tmp_path, rng):
    import numpy as np
    import jax.numpy as jnp
    from micromix_tpu.models import (
        ModelConfig, forward, load_params, random_dense_params, save_params)

    cfg = ModelConfig(arch="llama", vocab_size=64, hidden_size=128,
                      intermediate_size=256, num_layers=1, num_heads=2,
                      num_kv_heads=2, head_dim=64, rope_theta=500000.0,
                      rms_eps=1e-6,
                      rope_scaling=("llama3", 8.0, 1.0, 4.0, 8192))
    params = random_dense_params(cfg, seed=60)
    tokens = jnp.asarray(rng.integers(0, 64, (1, 8)), jnp.int32)
    out = forward(params, cfg, tokens)
    assert np.isfinite(np.asarray(out)).all()
    # scaling changes the numerics vs unscaled
    cfg0 = ModelConfig(**{**cfg.__dict__, "rope_scaling": None})
    out0 = forward(params, cfg0, tokens)
    assert np.abs(np.asarray(out) - np.asarray(out0)).max() > 1e-4
    # config round-trips through the checkpoint (tuple vs json list)
    save_params(str(tmp_path / "rs"), params, cfg)
    _, cfg2, _ = load_params(str(tmp_path / "rs"))
    assert cfg2 == cfg
