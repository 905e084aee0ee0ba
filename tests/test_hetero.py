"""Heterogeneous-budget quantization (models/hetero.py) + PP stacking.

VERDICT r1 item 3: pipeline parallelism must run a model whose layers have
DIFFERENT (k4, k6, k8).  These tests lock (a) fakequant numerics against
the NumPy oracle's segmented mixed quantization, (b) the hetero forward
against the standard segmented quantized forward, and (c) the PP-stacked
forward against the unstacked forward on the same hetero params.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micromix_tpu.models import ModelConfig, random_dense_params
from micromix_tpu.models.hetero import (
    FakeQuantSite, fakequant_site, make_fakequant_site,
    quantize_model_hetero)
from micromix_tpu.models.surgery import (
    ATTN_IN, DOWN_IN, MLP_IN, O_IN, SiteCalibration, default_calibration,
    quantize_model)
from micromix_tpu.models.transformer import forward
from micromix_tpu.mx import oracle


def _cfg(layers=2):
    return ModelConfig(arch="llama", vocab_size=128, hidden_size=128,
                       intermediate_size=256, num_layers=layers, num_heads=4,
                       num_kv_heads=2, head_dim=32, rope_theta=10000.0,
                       rms_eps=1e-6)


def _hetero_calibs(cfg, seed=0):
    """Per-layer DIFFERENT budgets (the thing round 1 couldn't stack)."""
    rng = np.random.default_rng(seed)
    base = default_calibration(cfg, p6=0, p8=0, seed=seed)
    budgets = [(0, 0), (32, 32), (64, 32), (32, 64)]
    for i, c in enumerate(base):
        p6, p8 = budgets[i % len(budgets)]
        for k in c:
            c[k] = SiteCalibration(c[k].reorder_index, p6, p8)
    return base


def test_fakequant_matches_oracle_segments(rng):
    k, p6, p8 = 128, 32, 32
    perm = rng.permutation(k).astype(np.int32)
    calib = SiteCalibration(perm, p6, p8)
    site = make_fakequant_site(calib, k)
    x = rng.normal(0, 1, (8, k)).astype(np.float32)
    got = np.asarray(fakequant_site(jnp.asarray(x), site), np.float32)
    # oracle: quantize the sorted channels segment-wise, same block split
    xs = x[:, perm]
    segs = oracle.mixed_quantize(xs, k - p6 - p8, p6, p8)
    # weight_fp4_only=False is the ACTIVATION grid (fp4/fp6/fp8 per segment)
    ref = oracle.mixed_dequantize(segs, k - p6 - p8, p6, p8)
    ref16 = np.asarray(jnp.asarray(ref).astype(jnp.bfloat16), np.float32)
    np.testing.assert_array_equal(got, ref16)


def test_hetero_forward_close_to_segmented(rng):
    """Same calibration, hetero vs standard representation: identical
    quantization decisions, only K-summation order differs."""
    cfg = _cfg()
    dense = random_dense_params(cfg, seed=7)
    calibs = default_calibration(cfg, p6=32, p8=32, seed=3)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 16)), jnp.int32)
    std = forward(quantize_model(dense, cfg, calibs), cfg, toks,
                  use_flash=False)
    het = forward(quantize_model_hetero(dense, cfg, calibs), cfg, toks,
                  use_flash=False)
    # same quantization decisions; only the K contraction order differs
    np.testing.assert_allclose(np.asarray(het, np.float32),
                               np.asarray(std, np.float32),
                               rtol=1e-4, atol=1e-4)


def test_pp_stacks_heterogeneous_budgets(rng):
    """The capability gap itself: stack + pipeline layers with different
    (k4, k6, k8), numerics locked to the unstacked forward."""
    from micromix_tpu.parallel import make_pp_mesh, pipeline_parallel_forward
    from micromix_tpu.parallel.pp import stack_layers

    cfg = _cfg(layers=4)
    dense = random_dense_params(cfg, seed=9)
    calibs = _hetero_calibs(cfg)
    het = quantize_model_hetero(dense, cfg, calibs)
    # the stack that round 1's representation could not build
    stack_layers(het["layers"])

    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)
    mesh1 = make_pp_mesh(1, devices=jax.devices()[:1])
    mesh2 = make_pp_mesh(2, devices=jax.devices()[:2])
    # the hard lock: 2-stage pipelining is BIT-IDENTICAL to the same
    # program on one stage — stacking, ppermute handoffs, microbatch
    # scheduling and per-layer budget selection add no numerics
    out1 = pipeline_parallel_forward(het, cfg, toks, mesh1, n_micro=1,
                                     use_flash=False)
    out2 = pipeline_parallel_forward(het, cfg, toks, mesh2, n_micro=2,
                                     use_flash=False)
    np.testing.assert_array_equal(np.asarray(out1, np.float32),
                                  np.asarray(out2, np.float32))
    # loose sanity vs the unstacked forward: different compiled programs
    # legally round bf16 differently, and quantization amplifies flips
    # (docstring of parallel/pp._pp_local.apply_stage)
    ref = forward(het, cfg, toks, use_flash=False)
    np.testing.assert_allclose(np.asarray(out2, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.3, atol=0.3)


def _moe_cfg(capacity=None):
    return ModelConfig(arch="mixtral", vocab_size=64, hidden_size=128,
                       intermediate_size=256, num_layers=1, num_heads=4,
                       num_kv_heads=4, head_dim=32, rope_theta=10000.0,
                       rms_eps=1e-6, num_experts=4, num_experts_per_tok=2,
                       moe_capacity_factor=capacity)


def _expert_hetero_calibs(cfg, seed=5):
    """Per-EXPERT different budgets (what stack_quant_experts rejects)."""
    base = default_calibration(cfg, p6=0, p8=0, seed=seed)
    budgets = [(0, 0), (32, 32), (64, 32), (32, 64)]
    for c in base:
        for e in range(cfg.num_experts):
            p6, p8 = budgets[e % len(budgets)]
            for key in (f"expert{e}_{MLP_IN}", f"expert{e}_{DOWN_IN}"):
                c[key] = SiteCalibration(c[key].reorder_index, p6, p8)
    return base


def test_hetero_moe_forward_close_to_segmented(rng):
    """Mixtral hetero representation vs segmented, same calibration."""
    cfg = _moe_cfg()
    dense = random_dense_params(cfg, seed=11)
    calibs = default_calibration(cfg, p6=32, p8=32, seed=6)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 16)), jnp.int32)
    std = forward(quantize_model(dense, cfg, calibs), cfg, toks,
                  use_flash=False)
    het = forward(quantize_model_hetero(dense, cfg, calibs), cfg, toks,
                  use_flash=False)
    np.testing.assert_allclose(np.asarray(het, np.float32),
                               np.asarray(std, np.float32),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("capacity", [None, 1.5])
def test_hetero_expert_parallel_matches_single_device(rng, capacity):
    """EP over experts with DIFFERENT per-expert budgets — the TP/EP half
    of the round-1 hetero capability gap (TODO 11).  Sharded == local."""
    from micromix_tpu.parallel import make_mesh
    from micromix_tpu.parallel.moe_ep import (
        ep_moe_forward_hetero, stack_hetero_experts)
    from micromix_tpu.models.transformer import moe_block

    cfg = _moe_cfg(capacity)
    dense = random_dense_params(cfg, seed=12)
    calibs = _expert_hetero_calibs(cfg)
    het = quantize_model_hetero(dense, cfg, calibs)
    layer = het["layers"][0]
    stacked = stack_hetero_experts(layer["experts"])

    x = jnp.asarray(rng.normal(0, 1, (1, 16, cfg.hidden_size)), jnp.bfloat16)
    ref = moe_block(x, layer, cfg)
    for ep in (2, 4):
        mesh = make_mesh(expert=ep, devices=jax.devices()[:ep])
        got = ep_moe_forward_hetero(
            x.reshape(-1, cfg.hidden_size), layer["ln2"], layer["router"],
            stacked, cfg, mesh)
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.asarray(ref.reshape(-1, cfg.hidden_size), np.float32),
            rtol=3e-2, atol=3e-2)


def test_engine_serves_hetero_model(rng):
    """The serving engine runs a heterogeneous-budget model end to end:
    project_all / mlp_block dispatch on FakeQuantSite, so prefill and the
    paged decode path work unchanged on hetero params."""
    from micromix_tpu.serve import Engine, Request

    cfg = _cfg()
    dense = random_dense_params(cfg, seed=21)
    het = quantize_model_hetero(dense, cfg, _hetero_calibs(cfg))
    prompt = list(rng.integers(0, cfg.vocab_size, 12))
    eng = Engine(het, cfg, max_seqs=2, page_size=16, max_pages_per_seq=8,
                 prefill_buckets=(16, 32))
    reqs = [Request(req_id=i, prompt=prompt, max_new_tokens=4)
            for i in range(2)]
    eng.run(reqs)
    for r in reqs:
        assert len(r.output) == 4
    # both slots saw the same prompt -> identical greedy streams
    assert reqs[0].output == reqs[1].output
    # prefill logits track the (jitted) full forward; argmax equality is
    # too fragile on a random model (eager/compiled fakequant decision
    # flips move near-tied top logits), so lock at the logit level
    import dataclasses
    from micromix_tpu.serve.kv_cache import make_cache
    from micromix_tpu.serve.runner import prefill
    caches = [make_cache(17, 16, cfg.num_kv_heads, cfg.head_dim, 2, 8,
                         bits=4) for _ in range(cfg.num_layers)]
    row = jnp.asarray([1, 2, 0, 0, 0, 0, 0, 0], jnp.int32)
    caches = [dataclasses.replace(c, page_table=c.page_table.at[0].set(row))
              for c in caches]
    toks = np.zeros((1, 16), np.int32)
    toks[0, :12] = prompt
    lg, _ = jax.jit(lambda p_, t: prefill(p_, cfg, caches, t, jnp.int32(0),
                                          jnp.int32(0), jnp.int32(11)))(
        het, jnp.asarray(toks))
    ref = jax.jit(lambda p_, t: forward(p_, cfg, t, use_flash=False))(
        het, jnp.asarray([prompt], jnp.int32))
    a = np.asarray(lg[0], np.float32)
    b = np.asarray(ref[0, -1], np.float32)
    assert np.corrcoef(a, b)[0, 1] > 0.99
    np.testing.assert_allclose(a, b, atol=0.2, rtol=0.1)
