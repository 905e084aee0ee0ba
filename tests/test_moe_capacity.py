"""Capacity-based MoE dispatch (VERDICT r1 item 6).

The dense-dispatch form runs every expert on every token (num_experts x
FLOPs/token); capacity dispatch gathers at most C routed tokens per expert
(GShard semantics), bringing FLOPs/token to ~top_k * capacity_factor.
With factor >= E/top_k capacity covers all routed tokens, so numerics must
match dense dispatch.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micromix_tpu.models import (
    ModelConfig, default_calibration, quantize_model, random_dense_params)
from micromix_tpu.models.transformer import (
    capacity_dispatch, forward, moe_capacity)


def _cfg(factor=None):
    return ModelConfig(arch="mixtral", vocab_size=128, hidden_size=128,
                       intermediate_size=256, num_layers=1, num_heads=4,
                       num_kv_heads=2, head_dim=32, rope_theta=10000.0,
                       rms_eps=1e-6, num_experts=4, num_experts_per_tok=2,
                       moe_capacity_factor=factor)


def test_capacity_dispatch_table():
    # 4 tokens, 2 experts; token->expert weights
    w = jnp.asarray([[0.7, 0.0],
                     [0.6, 0.4],
                     [0.0, 1.0],
                     [0.5, 0.5]], jnp.float32)
    idx, gate = capacity_dispatch(w, 2)
    # expert 0: tokens 0, 1 fill its 2 slots; token 3 dropped
    np.testing.assert_array_equal(np.asarray(idx[0]), [0, 1])
    np.testing.assert_allclose(np.asarray(gate[0]), [0.7, 0.6])
    # expert 1: tokens 1, 2; token 3 dropped
    np.testing.assert_array_equal(np.asarray(idx[1]), [1, 2])
    np.testing.assert_allclose(np.asarray(gate[1]), [0.4, 1.0])
    # full capacity: nothing dropped, empty slots marked T
    idx4, gate4 = capacity_dispatch(w, 4)
    np.testing.assert_array_equal(np.asarray(idx4[0]), [0, 1, 3, 4])
    assert float(gate4[0, 3]) == 0.0


def test_capacity_flops_budget():
    cfg = _cfg(1.25)
    t = 256
    c = moe_capacity(cfg, t)
    ideal = t * cfg.num_experts_per_tok / cfg.num_experts
    # total processed rows E*C within ~1.2-1.3x of the top-k ideal T*top_k
    assert c <= ideal * 1.25 + 8
    assert cfg.num_experts * c <= t * cfg.num_experts_per_tok * 1.3 + 64


@pytest.mark.parametrize("quant", [False, True])
def test_generous_capacity_matches_dense_dispatch(rng, quant):
    cfg_d = _cfg(None)
    # factor = E / top_k -> capacity = T -> no token ever dropped
    cfg_c = _cfg(float(cfg_d.num_experts) / cfg_d.num_experts_per_tok)
    dense = random_dense_params(cfg_d, seed=5)
    if quant:
        calibs = default_calibration(cfg_d, p6=0, p8=0)
        params = quantize_model(dense, cfg_d, calibs)
    else:
        params = dense
    toks = jnp.asarray(rng.integers(0, cfg_d.vocab_size, (1, 24)), jnp.int32)
    yd = forward(params, cfg_d, toks, use_flash=False)
    yc = forward(params, cfg_c, toks, use_flash=False)
    np.testing.assert_allclose(np.asarray(yc, np.float32),
                               np.asarray(yd, np.float32),
                               rtol=2e-3, atol=2e-3)


def test_tight_capacity_drops_but_finite(rng):
    cfg = _cfg(0.6)
    params = random_dense_params(cfg, seed=6)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 32)), jnp.int32)
    y = forward(params, cfg, toks, use_flash=False)
    assert bool(jnp.isfinite(y).all())


def test_ep_capacity_matches_single_device(rng):
    """Expert-parallel capacity dispatch == single-device capacity path."""
    from micromix_tpu.models.surgery import quantize_layer
    from micromix_tpu.parallel import make_mesh
    from micromix_tpu.parallel.moe_ep import (
        ep_moe_forward_quant, stack_quant_experts)
    from micromix_tpu.models.common import rmsnorm
    from micromix_tpu.models.transformer import moe_block

    cfg = _cfg(1.5)
    dense = random_dense_params(cfg, seed=7)
    calibs = default_calibration(cfg, p6=0, p8=0)
    qlayer = quantize_model(dense, cfg, calibs)["layers"][0]

    x = jnp.asarray(rng.normal(0, 1, (16, cfg.hidden_size)), jnp.bfloat16)
    ref = moe_block(x[None], qlayer, cfg)[0]

    mesh = make_mesh(data=1, model=1, expert=2, devices=jax.devices()[:2])
    stacked = stack_quant_experts(qlayer["experts"])
    got = ep_moe_forward_quant(x, qlayer["ln2"], dense["layers"][0]["router"],
                               stacked, cfg, mesh)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)
