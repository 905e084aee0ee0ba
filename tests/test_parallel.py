"""Multi-chip sharding on the 8-virtual-device CPU mesh (SURVEY §4 tier e)."""

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
from micromix_tpu.parallel import (
    ep_moe_forward,
    make_mesh,
    shard_quantized_params,
    sharded_quantized_forward,
    stack_dense_experts,
)


def _cfg(**kw):
    base = dict(
        arch="llama", vocab_size=256, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=64,
        rope_theta=10000.0, rms_eps=1e-6,
    )
    base.update(kw)
    return ModelConfig(**base)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_tp_dp_quantized_forward_matches_single_device(rng):
    cfg = _cfg()
    params = random_dense_params(cfg, seed=11)
    calibs = default_calibration(cfg, p6=0, p8=128, seed=3)
    qparams = quantize_model(params, cfg, calibs)

    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 16)), jnp.int32)
    want = np.asarray(forward(qparams, cfg, tokens))

    mesh = make_mesh(data=2, model=4)
    sharded = shard_quantized_params(qparams, mesh)
    got = np.asarray(sharded_quantized_forward(sharded, cfg, tokens, mesh))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.999, corr


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_ep_moe_matches_dense(rng):
    cfg = _cfg(arch="mixtral", num_experts=4, num_experts_per_tok=2)
    params = random_dense_params(cfg, seed=12)
    layer = params["layers"][0]
    x = jnp.asarray(rng.normal(0, 1, (8, cfg.hidden_size)), jnp.bfloat16)

    mesh = make_mesh(data=1, model=1, expert=4)
    stacked = stack_dense_experts(layer["experts"])
    got = np.asarray(ep_moe_forward(x, layer["ln2"], layer["router"],
                                    stacked, cfg, mesh))

    # single-device reference via the transformer moe block
    from micromix_tpu.models.transformer import moe_block
    want = np.asarray(
        moe_block(x[None], layer, cfg)[0])
    np.testing.assert_allclose(got.astype(np.float32),
                               want.astype(np.float32), rtol=5e-2, atol=5e-2)


def test_ep_quantized_matches_moe_block(rng):
    """Expert-sharded quantized MoE == single-device quantized moe_block."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from micromix_tpu.models import (
        ModelConfig, default_calibration, quantize_model,
        random_dense_params)
    from micromix_tpu.models.transformer import moe_block
    from micromix_tpu.parallel import (
        ep_moe_forward_quant, make_mesh, stack_quant_experts)

    cfg = ModelConfig(arch="mixtral", vocab_size=64, hidden_size=128,
                      intermediate_size=256, num_layers=1, num_heads=4,
                      num_kv_heads=4, head_dim=32, rope_theta=10000.0,
                      rms_eps=1e-6, num_experts=4, num_experts_per_tok=2)
    qparams = quantize_model(
        random_dense_params(cfg, seed=4), cfg,
        default_calibration(cfg, p6=32, p8=32, seed=4))
    layer = qparams["layers"][0]
    x = jnp.asarray(rng.normal(0, 1, (1, 8, cfg.hidden_size)), jnp.bfloat16)

    ref = moe_block(x, layer, cfg)
    for ep in (2, 4):
        mesh = make_mesh(expert=ep, devices=jax.devices()[:ep])
        got = ep_moe_forward_quant(
            x.reshape(-1, cfg.hidden_size), layer["ln2"], layer["router"],
            stack_quant_experts(layer["experts"]), cfg, mesh)
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.asarray(ref.reshape(-1, cfg.hidden_size), np.float32),
            rtol=3e-2, atol=3e-2)
