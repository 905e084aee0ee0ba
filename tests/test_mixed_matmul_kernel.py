"""Pallas mixed-matmul kernel vs the pure-XLA reference path.

Mirrors the reference's kernel-vs-reference tier (mgemm/test.py and
bench_mxf4f6f8 --validate): same quantized operands, compare outputs.
Runs in interpreter mode on CPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from micromix_tpu.kernels import mixed_matmul
from micromix_tpu.mx.mxtensor import mixed_matmul_xla, quantize_mixed


def _mk(rng, m, n, k4, k6, k8, w_fp4_only=True):
    k = k4 + k6 + k8
    x = rng.normal(0, 1, (m, k)).astype(np.float32)
    if k8:
        x[:, -k8:] *= 60.0
    w = rng.normal(0, 0.3, (n, k)).astype(np.float32)
    a = quantize_mixed(jnp.asarray(x), k4, k6, k8)
    wq = quantize_mixed(jnp.asarray(w), k4, k6, k8,
                        weight_fp4_only=w_fp4_only, pack_fp4=True)
    return a, wq


@pytest.mark.parametrize("m,n,k4,k6,k8", [
    (8, 128, 256, 0, 0),      # fp4 only
    (8, 128, 0, 256, 0),      # fp6 only
    (8, 128, 0, 0, 256),      # fp8 only
    (16, 256, 256, 128, 128), # all three
    (1, 128, 128, 128, 128),  # single-token decode shape
    (100, 384, 512, 128, 128),# non-tile-aligned M
])
def test_kernel_matches_xla(rng, m, n, k4, k6, k8):
    a, wq = _mk(rng, m, n, k4, k6, k8)
    got = mixed_matmul(a, wq, out_dtype=jnp.float32, interpret=True)
    want = mixed_matmul_xla(a, wq, out_dtype=jnp.float32)
    assert got.shape == (m, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_kernel_symmetric_mixed_weights(rng):
    # the symmetric W4/6/8 mode (matmul_host, gemm.cu:26-53)
    a, wq = _mk(rng, 16, 128, 256, 128, 128, w_fp4_only=False)
    got = mixed_matmul(a, wq, out_dtype=jnp.float32, interpret=True)
    want = mixed_matmul_xla(a, wq, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_kernel_accuracy_vs_fp32(rng):
    # planted outlier channels: mixed quant must track the fp32 matmul
    m, n, k4, k6, k8 = 32, 256, 512, 128, 128
    k = k4 + k6 + k8
    x = rng.normal(0, 1, (m, k)).astype(np.float32)
    x[:, -k8:] *= 80
    w = rng.normal(0, 0.3, (n, k)).astype(np.float32)
    a = quantize_mixed(jnp.asarray(x), k4, k6, k8)
    wq = quantize_mixed(jnp.asarray(w), k4, k6, k8, weight_fp4_only=True,
                        pack_fp4=True)
    y = np.asarray(mixed_matmul(a, wq, out_dtype=jnp.float32, interpret=True))
    ref = x @ w.T
    rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    assert rel < 0.15, rel


# ---------------------------------------------------------------------------
# Fused site + ScaledW8 GEMM (kernels/mixed_matmul.mixed_matmul_w8_site)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("producer", ["plain", "rms", "silu"])
@pytest.mark.parametrize("m,n,k4,k6,k8", [
    (8, 256, 256, 0, 0),
    (8, 256, 256, 128, 128),
    (3, 384, 128, 128, 128),   # non-tile-aligned M and N
])
def test_fused_site_gemm_matches_unfused(rng, producer, m, n, k4, k6, k8):
    """mixed_matmul_w8_site == fakequant site -> mixed_matmul_w8, exactly."""
    from micromix_tpu.kernels.fakequant import fakequant_site_pallas
    from micromix_tpu.kernels.mixed_matmul import (
        mixed_matmul_w8, mixed_matmul_w8_site)
    from micromix_tpu.mx.scaledw8 import pack_scaled_w8

    k = k4 + k6 + k8
    x = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(1, 0.1, (k,)).astype(np.float32))
    up = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32) / 4
                     ).astype(jnp.bfloat16)
    wq = quantize_mixed(jnp.asarray(rng.normal(0, 0.3, (n, k)).astype(
        np.float32)), k4, k6, k8, weight_fp4_only=True, pack_fp4=True)
    w8 = pack_scaled_w8(wq)

    kw = {}
    if producer == "rms":
        x_in = x.astype(jnp.bfloat16)
        kw["gamma"] = gamma
    elif producer == "silu":
        x_in = x.astype(jnp.bfloat16)
        kw["up"] = up
    else:
        x_in = x.astype(jnp.bfloat16)
    qx_ref = fakequant_site_pallas(
        x_in, k4, k6, k8, producer=producer,
        gamma=kw.get("gamma"), up=kw.get("up"), interpret=True)
    want = mixed_matmul_w8(qx_ref, w8, interpret=True)

    got, qx = mixed_matmul_w8_site(x_in, w8, producer=producer,
                                   emit_qx=True, interpret=True, **kw)
    assert got.shape == (m, n) and qx.shape == (m, k)
    np.testing.assert_array_equal(np.asarray(qx), np.asarray(qx_ref))
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_fused_site_gemm_no_emit(rng):
    from micromix_tpu.kernels.mixed_matmul import mixed_matmul_w8_site
    from micromix_tpu.mx.scaledw8 import pack_scaled_w8
    k4, k6, k8 = 128, 128, 0
    k = k4 + k6 + k8
    x = jnp.asarray(rng.normal(0, 1, (4, k)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    wq = quantize_mixed(jnp.asarray(rng.normal(0, 0.3, (128, k)).astype(
        np.float32)), k4, k6, k8, weight_fp4_only=True, pack_fp4=True)
    w8 = pack_scaled_w8(wq)
    out_pair, qx = mixed_matmul_w8_site(x, w8, emit_qx=True, interpret=True)
    out_solo = mixed_matmul_w8_site(x, w8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_solo), np.asarray(out_pair))


@pytest.mark.parametrize("producer", ["plain", "rms"])
def test_fused_site_gemm_benes_matches_take(rng, producer):
    """benes=packed route + UNPERMUTED inputs == jnp.take outside, exactly
    (pure lane routing, no arithmetic)."""
    from micromix_tpu.kernels.mixed_matmul import mixed_matmul_w8_site
    from micromix_tpu.mx.benes import benes_route, pack_masks
    from micromix_tpu.mx.scaledw8 import pack_scaled_w8

    k4, k6, k8 = 256, 128, 128
    k = k4 + k6 + k8
    m, n = 5, 256
    perm = rng.permutation(k)
    _, masks = benes_route(perm)
    packed = jnp.asarray(pack_masks(masks))
    x = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    gamma = jnp.asarray(rng.normal(1, 0.1, (k,)).astype(np.float32))
    wq = quantize_mixed(jnp.asarray(rng.normal(0, 0.3, (n, k)).astype(
        np.float32)), k4, k6, k8, weight_fp4_only=True, pack_fp4=True)
    w8 = pack_scaled_w8(wq)

    kw = {} if producer == "plain" else dict(producer="rms", gamma=gamma)
    kw_t = dict(kw)
    if producer == "rms":
        kw_t["gamma"] = jnp.take(gamma, jnp.asarray(perm), axis=0)
    want, qx_w = mixed_matmul_w8_site(
        jnp.take(x, jnp.asarray(perm), axis=1), w8, emit_qx=True,
        interpret=True, **kw_t)
    got, qx_g = mixed_matmul_w8_site(x, w8, emit_qx=True, benes=packed,
                                     interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(qx_g), np.asarray(qx_w))
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_project_all_uses_benes(rng, monkeypatch):
    """project_all's fused path with QuantSite.benes == the take path."""
    import micromix_tpu.ops.quantize_ops as Q
    from micromix_tpu.models.common import project_all
    from micromix_tpu.models.surgery import SiteCalibration, make_site

    k4, k6, k8 = 256, 128, 128
    k = k4 + k6 + k8
    lins = _mk_w8_linears(rng, k4, k6, k8, [256, 128])
    calib = SiteCalibration(
        rng.permutation(k).astype(np.int32), k6, k8)
    site = make_site(calib, k)
    assert site.benes is not None  # K=512 is a power of two
    gamma = jnp.asarray(rng.normal(1, 0.1, (k,)).astype(np.float32)
                        ).astype(jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 1, (2, 1, k)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    monkeypatch.setattr(Q, "_use_site_kernel", lambda x2d: True)
    got = project_all(x, site, lins, gamma)
    # take path: strip the benes field from the site
    import dataclasses as dc
    ref = project_all(x, dc.replace(site, benes=None), lins, gamma)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g, np.float32),
                                      np.asarray(r, np.float32))


# 8B (Llama-3.1) ScaledW8 GEMM shape grid: every (site, K, N-of-first-
# consumer, emit_qx) the engine can hit, at every M the Pallas paths
# accept (site kernel: M <= PALLAS_FAKEQUANT_MAX_M; plain w8 kernel:
# M < W8_PREFILL_DEQUANT_THRESHOLD).
_8B_SITE_SHAPES = [
    # (n_first, k, producer, emit_qx)
    (4096, 4096, "rms", True),     # qkv site -> q_proj (k/v via emitted qx)
    (4096, 4096, "plain", False),  # o_proj site
    (14336, 4096, "rms", True),    # gate/up site -> gate_proj
    (4096, 14336, "silu", False),  # down_proj site (the r3 OOM shape)
    (128256, 4096, "plain", False),  # lm_head
]
_8B_W8_SHAPES = [(4096, 4096), (1024, 4096), (14336, 4096),
                 (4096, 14336), (128256, 4096)]


def test_w8_tile_plan_fits_scoped_vmem_8b_grid():
    """CPU guard for the r3 on-chip regression (VERDICT r3 weak #1): the
    auto-chosen tiles must keep the (conservative) VMEM byte model's stack
    component under the raised Mosaic scoped limit with headroom, and the
    total (pipelined blocks + stack) under the 128 MiB v5e VMEM with
    headroom, across the full 8B shape grid."""
    from micromix_tpu.kernels.fakequant import PALLAS_FAKEQUANT_MAX_M
    from micromix_tpu.kernels.mixed_matmul import (
        _SCOPED_MODEL_BUDGET, _TOTAL_VMEM_BUDGET, _w8_vmem_model,
        w8_tile_plan)

    def check(bm, bn, k, **kw):
        stack, total = _w8_vmem_model(bm, bn, k, **kw)
        assert stack <= _SCOPED_MODEL_BUDGET, (bm, bn, k, kw, stack)
        assert total <= _TOTAL_VMEM_BUDGET, (bm, bn, k, kw, total)

    for m in (1, 8, 16, 32, 64, PALLAS_FAKEQUANT_MAX_M):
        for n, k, producer, emit_qx in _8B_SITE_SHAPES:
            bm, bn = w8_tile_plan(m, n, k, site=True, producer=producer,
                                  emit_qx=emit_qx)
            check(bm, bn, k, site=True, producer=producer, emit_qx=emit_qx)
    for m in (1, 32, 128, 256, 512):
        for n, k in _8B_W8_SHAPES:
            bm, bn = w8_tile_plan(m, n, k)
            check(bm, bn, k)


def test_w8_tile_plan_respects_user_tiles():
    from micromix_tpu.kernels.mixed_matmul import w8_tile_plan
    # user-fixed tiles are never overridden (ablation probes rely on this)
    assert w8_tile_plan(128, 4096, 14336, site=True, producer="silu",
                        bm=128, bn=256) == (128, 256)


def test_w8_tile_plan_shrinks_absurd_shapes():
    # the auto-tiler backstop: a K far past any real model must shrink bn
    # first (weight HBM traffic is (M/bm)*N*K — bm shrink re-streams it)
    from micromix_tpu.kernels.mixed_matmul import (
        _SCOPED_MODEL_BUDGET, _w8_vmem_model, w8_tile_plan)
    k = 32 * 1024
    bm, bn = w8_tile_plan(128, 4096, k, site=True, producer="silu")
    assert bn < 512 or bm < 128
    stack, _ = _w8_vmem_model(bm, bn, k, site=True, producer="silu")
    assert stack <= _SCOPED_MODEL_BUDGET


def _mk_w8_linears(rng, k4, k6, k8, ns):
    from micromix_tpu.models.common import QuantLinear
    from micromix_tpu.mx.scaledw8 import pack_scaled_w8
    k = k4 + k6 + k8
    lins = []
    for n in ns:
        wq = quantize_mixed(
            jnp.asarray(rng.normal(0, 0.3, (n, k)).astype(np.float32)),
            k4, k6, k8, weight_fp4_only=True, pack_fp4=True)
        lins.append(QuantLinear(w=pack_scaled_w8(wq)))
    return lins


@pytest.mark.parametrize("with_norm", [True, False])
def test_project_all_fused_site_path(rng, monkeypatch, with_norm):
    """project_all with the fused site+GEMM decode path vs the XLA-chain
    path: same values (rms row-moment reduction order may flip a grid
    round, hence tolerance; plain sites are exact)."""
    import micromix_tpu.ops.quantize_ops as Q
    from micromix_tpu.models.common import QuantSite, project_all

    k4, k6, k8 = 256, 128, 128
    k = k4 + k6 + k8
    lins = _mk_w8_linears(rng, k4, k6, k8, [256, 128, 128])
    perm = jnp.asarray(rng.permutation(k).astype(np.int32))
    site = QuantSite(k4=k4, k6=k6, k8=k8, perm=perm)
    gamma = jnp.asarray(rng.normal(1, 0.1, (k,)).astype(np.float32)
                        ).astype(jnp.bfloat16) if with_norm else None
    x = jnp.asarray(rng.normal(0, 1, (2, 1, k)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    ref = project_all(x, site, lins, gamma)
    monkeypatch.setattr(Q, "_use_site_kernel", lambda x2d: True)
    got = project_all(x, site, lins, gamma)
    assert len(got) == 3
    for g, r in zip(got, ref):
        assert g.shape == r.shape
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(r, np.float32),
                                   rtol=0.03, atol=0.05)


def test_down_proj_fused_silu_site_exact(rng, monkeypatch):
    """_down_proj_q fused silu site == XLA chain bit-for-bit (no row
    reductions in the silu producer)."""
    import micromix_tpu.ops.quantize_ops as Q
    from micromix_tpu.models.common import QuantSite
    from micromix_tpu.models.transformer import _down_proj_q

    k4, k6, k8 = 256, 0, 128
    k = k4 + k6 + k8
    (down,) = _mk_w8_linears(rng, k4, k6, k8, [256])
    site = QuantSite(k4=k4, k6=k6, k8=k8, perm=None)
    g = jnp.asarray(rng.normal(0, 1, (1, 3, k)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    u = jnp.asarray(rng.normal(0, 1, (1, 3, k)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    ref = _down_proj_q(g, u, site, down)
    monkeypatch.setattr(Q, "_use_site_kernel", lambda x2d: True)
    got = _down_proj_q(g, u, site, down)
    assert got.shape == ref.shape == (1, 3, 256)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))


# ---------------------------------------------------------------------------
# Multi-output stacked-weight kernel (mixed_matmul_w8_stack)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("producer", ["plain", "rms"])
@pytest.mark.parametrize("ns", [[256, 128, 128], [384, 128], [300, 120]])
def test_stack_kernel_matches_per_consumer_calls(rng, producer, ns):
    """ONE multi-output call == site kernel + sibling w8 calls, exactly
    (including non-bn-multiple sections, which pad with zero codes)."""
    from micromix_tpu.kernels.mixed_matmul import (
        mixed_matmul_w8, mixed_matmul_w8_site, mixed_matmul_w8_stack)
    from micromix_tpu.mx.scaledw8 import pack_scaled_w8, stack_scaled_w8

    k4, k6, k8 = 256, 128, 128
    k = k4 + k6 + k8
    ws = []
    for n in ns:
        wq = quantize_mixed(
            jnp.asarray(rng.normal(0, 0.3, (n, k)).astype(np.float32)),
            k4, k6, k8, weight_fp4_only=True, pack_fp4=True)
        ws.append(pack_scaled_w8(wq))
    st = stack_scaled_w8(ws)
    x = jnp.asarray(rng.normal(0, 1, (5, k)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    kw = {}
    if producer == "rms":
        kw = dict(producer="rms",
                  gamma=jnp.asarray(rng.normal(1, 0.1, (k,)).astype(
                      np.float32)))

    y0, qx = mixed_matmul_w8_site(x, ws[0], emit_qx=True, interpret=True,
                                  **kw)
    want = [y0] + [mixed_matmul_w8(qx, w, interpret=True) for w in ws[1:]]
    got = mixed_matmul_w8_stack(x, st, interpret=True, **kw)
    assert [g.shape for g in got] == [(5, n) for n in ns]
    for g, r in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g, np.float32),
                                      np.asarray(r, np.float32))


def test_stack_kernel_benes_matches_take(rng):
    """Stack kernel with an in-kernel Benes route == permuted-input run."""
    from micromix_tpu.kernels.mixed_matmul import mixed_matmul_w8_stack
    from micromix_tpu.mx.benes import benes_route, pack_masks
    from micromix_tpu.mx.scaledw8 import pack_scaled_w8, stack_scaled_w8

    k4, k6, k8 = 256, 128, 128
    k = k4 + k6 + k8
    ws = []
    for n in (256, 128):
        wq = quantize_mixed(
            jnp.asarray(rng.normal(0, 0.3, (n, k)).astype(np.float32)),
            k4, k6, k8, weight_fp4_only=True, pack_fp4=True)
        ws.append(pack_scaled_w8(wq))
    st = stack_scaled_w8(ws)
    perm = rng.permutation(k).astype(np.int32)
    _, masks = benes_route(perm)
    bits = jnp.asarray(pack_masks(masks))
    x = jnp.asarray(rng.normal(0, 1, (4, k)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    gamma = jnp.asarray(rng.normal(1, 0.1, (k,)).astype(np.float32))
    got = mixed_matmul_w8_stack(x, st, producer="rms", gamma=gamma,
                                benes=bits, interpret=True)
    ref = mixed_matmul_w8_stack(
        jnp.take(x, jnp.asarray(perm), axis=1), st, producer="rms",
        gamma=jnp.take(gamma, jnp.asarray(perm), axis=0), interpret=True)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g, np.float32),
                                      np.asarray(r, np.float32))


@pytest.mark.parametrize("decode_path", [True, False])
def test_project_all_stack_matches_linears(rng, monkeypatch, decode_path):
    """project_all(stack=...) == project_all(linears) on both the decode
    (multi-output kernel) and prefill (dequant + wide dot) branches."""
    import micromix_tpu.ops.quantize_ops as Q
    from micromix_tpu.models.common import QuantSite, project_all
    from micromix_tpu.mx.scaledw8 import stack_scaled_w8

    k4, k6, k8 = 256, 128, 128
    k = k4 + k6 + k8
    lins = _mk_w8_linears(rng, k4, k6, k8, [256, 128, 128])
    biases = [jnp.asarray(rng.normal(0, 1, (n,)).astype(np.float32)
                          ).astype(jnp.bfloat16) for n in (256, 128, 128)]
    import dataclasses as dc
    lins = [dc.replace(l, bias=b) for l, b in zip(lins, biases)]
    st = stack_scaled_w8([l.w for l in lins], [l.bias for l in lins])
    perm = jnp.asarray(rng.permutation(k).astype(np.int32))
    site = QuantSite(k4=k4, k6=k6, k8=k8, perm=perm)
    gamma = jnp.asarray(rng.normal(1, 0.1, (k,)).astype(np.float32)
                        ).astype(jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 1, (2, 1, k)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    monkeypatch.setattr(Q, "_use_site_kernel", lambda x2d: decode_path)
    ref = project_all(x, site, lins, gamma)
    got = project_all(x, site, None, gamma, stack=st)
    assert len(got) == 3
    for g, r in zip(got, ref):
        assert g.shape == r.shape
        np.testing.assert_array_equal(np.asarray(g, np.float32),
                                      np.asarray(r, np.float32))


def test_stack_layer_projections_transform(rng):
    """Engine-init stacking: keys removed, aliased layers stay shared, and
    the full-model forward is unchanged (CPU prefill branch)."""
    from micromix_tpu.models.surgery import (
        default_calibration, quantize_model, random_dense_params,
        stack_layer_projections)
    from micromix_tpu.models.transformer import forward
    from micromix_tpu.models.common import ModelConfig

    cfg = ModelConfig(arch="llama", vocab_size=64, hidden_size=256,
                      intermediate_size=512, num_layers=2, num_heads=2,
                      num_kv_heads=1, head_dim=128, rope_theta=1e4,
                      rms_eps=1e-5)
    dense = random_dense_params(cfg, seed=0)
    qp = quantize_model(dense, cfg, default_calibration(cfg, 64, 64))
    # alias layer 1 onto layer 0 (the share_layers bench shape)
    qp["layers"][1] = qp["layers"][0]
    sp = stack_layer_projections(qp)
    l0, l1 = sp["layers"]
    assert l0 is l1, "aliased layers must stay aliased (one stack)"
    for key in ("q", "k", "v", "gate", "up"):
        assert key not in l0
    assert l0["qkv_stack"].sections == (256, 128, 128)
    assert l0["gateup_stack"].sections == (512, 512)
    toks = jnp.asarray(rng.integers(0, 64, (1, 8)).astype(np.int32))
    ref = forward(qp, cfg, toks)
    got = forward(sp, cfg, toks)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


# ---------------------------------------------------------------------------
# Grouped (block-diagonal, per-expert) kernel (mixed_matmul_w8_grouped)
# ---------------------------------------------------------------------------


def _mk_grouped(rng, e, ns, k4, k6, k8):
    from micromix_tpu.mx.scaledw8 import (
        ScaledW8, group_scaled_w8, pack_scaled_w8)
    k = k4 + k6 + k8
    per_w = []
    for n in ns:
        ws = []
        for _ in range(e):
            wq = quantize_mixed(
                jnp.asarray(rng.normal(0, 0.3, (n, k)).astype(np.float32)),
                k4, k6, k8, weight_fp4_only=True, pack_fp4=True)
            ws.append(pack_scaled_w8(wq))
        stacked = ScaledW8(
            codes=jnp.stack([w.codes for w in ws]),
            base=jnp.stack([w.base for w in ws]),
            k4=k4, k6=k6, k8=k8)
        per_w.append((stacked, ws))
    gw = group_scaled_w8([s for s, _ in per_w])
    return gw, [ws for _, ws in per_w]


@pytest.mark.parametrize("producer", ["plain", "silu"])
def test_grouped_kernel_matches_per_group_calls(rng, producer):
    """ONE grouped call == looping the fused site kernel per group,
    exactly (each group has its own weights AND its own scale base)."""
    from micromix_tpu.kernels.mixed_matmul import (
        mixed_matmul_w8_grouped, mixed_matmul_w8_site)

    e, k4, k6, k8 = 3, 256, 128, 128
    k = k4 + k6 + k8
    ns = [256, 128] if producer == "plain" else [256]
    gw, per_w = _mk_grouped(rng, e, ns, k4, k6, k8)
    x = jnp.asarray(rng.normal(0, 1, (e, 8, k)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    kw = {}
    if producer == "silu":
        kw["up"] = jnp.asarray(rng.normal(0, 1, (e, 8, k)).astype(
            np.float32) / 4).astype(jnp.bfloat16)

    got = mixed_matmul_w8_grouped(x, gw, producer=producer,
                                  interpret=True, **kw)
    assert [g.shape for g in got] == [(e, 8, n) for n in ns]
    for si, (n, ws) in enumerate(zip(ns, per_w)):
        for ei in range(e):
            skw = {}
            if producer == "silu":
                skw = dict(producer="silu", up=kw["up"][ei])
            want = mixed_matmul_w8_site(x[ei], ws[ei], interpret=True,
                                        **skw)
            np.testing.assert_array_equal(
                np.asarray(got[si][ei], np.float32),
                np.asarray(want, np.float32))


def test_grouped_kernel_benes_matches_take(rng):
    """Per-group Benes routes == per-group jnp.take, exactly."""
    from micromix_tpu.kernels.mixed_matmul import mixed_matmul_w8_grouped
    from micromix_tpu.mx.benes import benes_route, pack_masks

    e, k4, k6, k8 = 2, 256, 128, 128
    k = k4 + k6 + k8
    gw, _ = _mk_grouped(rng, e, [256], k4, k6, k8)
    perms = [rng.permutation(k).astype(np.int32) for _ in range(e)]
    bits = jnp.stack([jnp.asarray(pack_masks(benes_route(p)[1]))
                      for p in perms])
    x = jnp.asarray(rng.normal(0, 1, (e, 4, k)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    got = mixed_matmul_w8_grouped(x, gw, benes=bits, interpret=True)
    xp = jnp.stack([jnp.take(x[i], jnp.asarray(perms[i]), axis=1)
                    for i in range(e)])
    ref = mixed_matmul_w8_grouped(xp, gw, interpret=True)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g, np.float32),
                                      np.asarray(r, np.float32))


@pytest.mark.parametrize("capacity", [None, 2.0])
def test_moe_grouped_matches_expert_loop(rng, capacity):
    """moe_block with experts_grouped == the per-expert loop (CPU XLA
    fallback; combine/f32 order may differ -> tight tolerance)."""
    import dataclasses

    from micromix_tpu.models import (
        ModelConfig, default_calibration, quantize_model,
        random_dense_params)
    from micromix_tpu.models.surgery import stack_layer_projections
    from micromix_tpu.models.transformer import forward

    cfg = ModelConfig(arch="mixtral", vocab_size=64, hidden_size=128,
                      intermediate_size=256, num_layers=1, num_heads=2,
                      num_kv_heads=1, head_dim=64, rope_theta=1e4,
                      rms_eps=1e-6, num_experts=4, num_experts_per_tok=2,
                      moe_capacity_factor=capacity)
    dense = random_dense_params(cfg, seed=3)
    qp = quantize_model(dense, cfg, default_calibration(cfg, 32, 32))
    sp = stack_layer_projections(qp)
    assert "experts_grouped" in sp["layers"][0]
    assert "experts" not in sp["layers"][0]
    toks = jnp.asarray(rng.integers(0, 64, (1, 8)).astype(np.int32))
    ref = np.asarray(forward(qp, cfg, toks))
    got = np.asarray(forward(sp, cfg, toks))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# Split-plane fused-site multi-output kernel (mixed_matmul_sp_stack)
# ---------------------------------------------------------------------------


def _mk_sp_linears(rng, k4, k6, k8, ns):
    from micromix_tpu.models.common import QuantLinear
    k = k4 + k6 + k8
    lins = []
    for n in ns:
        wq = quantize_mixed(
            jnp.asarray(rng.normal(0, 0.3, (n, k)).astype(np.float32)),
            k4, k6, k8, weight_fp4_only=True, pack_fp4=True)
        lins.append(QuantLinear(w=wq))
    return lins


@pytest.mark.parametrize("producer", ["plain", "rms", "silu"])
def test_sp_stack_kernel_matches_quantize_plus_matmul(rng, producer):
    """One SP multi-output call == XLA site quantize + per-consumer
    split-plane matmul, exactly (fakequant-direct equivalence)."""
    from micromix_tpu.kernels.mixed_matmul import (
        mixed_matmul, mixed_matmul_sp_stack)
    from micromix_tpu.mx.mxtensor import stack_split_plane
    from micromix_tpu.ops.quantize_ops import (
        activation_quantize, rmsnorm_quantize_x, silu_mul_quantize_x)

    k4, k6, k8 = 256, 128, 128
    k = k4 + k6 + k8
    ns = [256] if producer == "silu" else [256, 128]
    lins = _mk_sp_linears(rng, k4, k6, k8, ns)
    st = stack_split_plane([l.w for l in lins])
    x = jnp.asarray(rng.normal(0, 1, (5, k)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    gamma = jnp.asarray(rng.normal(1, 0.1, (k,)).astype(np.float32))
    up = jnp.asarray(rng.normal(0, 1, (5, k)).astype(np.float32) / 4
                     ).astype(jnp.bfloat16)

    kw, qx = {}, None
    if producer == "rms":
        kw = dict(producer="rms", gamma=gamma)
        qx = rmsnorm_quantize_x(x, gamma, jnp.arange(k), k4, k6, k8)
    elif producer == "silu":
        kw = dict(producer="silu", up=up)
        qx = silu_mul_quantize_x(x, up, k4, k6, k8)
    else:
        qx = activation_quantize(x, k4, k6, k8)
    want = [mixed_matmul(qx, l.w, interpret=True) for l in lins]
    got = mixed_matmul_sp_stack(x, st, interpret=True, **kw)
    assert [g.shape for g in got] == [(5, n) for n in ns]
    for g, r in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g, np.float32),
                                      np.asarray(r, np.float32))


def test_sp_stack_benes_matches_take(rng):
    from micromix_tpu.kernels.mixed_matmul import mixed_matmul_sp_stack
    from micromix_tpu.mx.benes import benes_route, pack_masks
    from micromix_tpu.mx.mxtensor import stack_split_plane

    k4, k6, k8 = 256, 128, 128
    k = k4 + k6 + k8
    lins = _mk_sp_linears(rng, k4, k6, k8, [256, 128])
    st = stack_split_plane([l.w for l in lins])
    perm = rng.permutation(k).astype(np.int32)
    bits = jnp.asarray(pack_masks(benes_route(perm)[1]))
    x = jnp.asarray(rng.normal(0, 1, (4, k)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    gamma = jnp.asarray(rng.normal(1, 0.1, (k,)).astype(np.float32))
    got = mixed_matmul_sp_stack(x, st, producer="rms", gamma=gamma,
                                benes=bits, interpret=True)
    ref = mixed_matmul_sp_stack(
        jnp.take(x, jnp.asarray(perm), axis=1), st, producer="rms",
        gamma=jnp.take(gamma, jnp.asarray(perm), axis=0), interpret=True)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g, np.float32),
                                      np.asarray(r, np.float32))


def test_splitplane_model_stacking_forward_parity(rng):
    """layout=splitplane model: stack_layer_projections swaps in
    SplitPlaneStacks and the forward stays exact (CPU fallback branch)."""
    from micromix_tpu.models import ModelConfig
    from micromix_tpu.models.surgery import (
        default_calibration, quantize_model, random_dense_params,
        stack_layer_projections)
    from micromix_tpu.models.transformer import forward
    from micromix_tpu.mx.mxtensor import SplitPlaneStack

    cfg = ModelConfig(arch="llama", vocab_size=64, hidden_size=256,
                      intermediate_size=512, num_layers=2, num_heads=2,
                      num_kv_heads=1, head_dim=128, rope_theta=1e4,
                      rms_eps=1e-5)
    dense = random_dense_params(cfg, seed=11)
    qp = quantize_model(dense, cfg, default_calibration(cfg, 64, 64),
                        layout="splitplane")
    sp = stack_layer_projections(qp)
    assert isinstance(sp["layers"][0]["qkv_stack"], SplitPlaneStack)
    assert "q" not in sp["layers"][0]
    toks = jnp.asarray(rng.integers(0, 64, (1, 8)).astype(np.int32))
    ref = np.asarray(forward(qp, cfg, toks))
    got = np.asarray(forward(sp, cfg, toks))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# Residual-pair kernel (mixed_matmul_w8_pair)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("case", ["o_gateup", "down_qkv"])
def test_pair_kernel_matches_unfused_chain(rng, case):
    """ONE pair call == site_a GEMM + bf16 residual close + stacked
    rms-site GEMMs.  h_mid is exact; the stacked outputs carry the rms
    row-moment reduction-order caveat (kernels/fakequant.py) — a flipped
    RNE tie moves a channel one grid step, so outputs compare with the
    same tolerance the project_all rms tests use, plus a cap on how many
    activation channels may sit on a tie."""
    from micromix_tpu.kernels.fakequant import fakequant_site_pallas
    from micromix_tpu.kernels.mixed_matmul import (
        mixed_matmul_w8, mixed_matmul_w8_pair, mixed_matmul_w8_stack)
    from micromix_tpu.mx.benes import benes_route, pack_masks
    from micromix_tpu.mx.scaledw8 import pack_scaled_w8, stack_scaled_w8

    k = 512              # the residual width (H)
    k_a = 512 if case == "o_gateup" else 1024   # Wa's contraction width
    k4a, k6a, k8a = k_a - 256, 128, 128
    k4b, k6b, k8b = 256, 128, 128
    m = 5

    def mk_w(n, kk, k4, k6, k8):
        wq = quantize_mixed(
            jnp.asarray(rng.normal(0, 0.3, (n, kk)).astype(np.float32)),
            k4, k6, k8, weight_fp4_only=True, pack_fp4=True)
        return pack_scaled_w8(wq)

    wa = mk_w(k, k_a, k4a, k6a, k8a)
    ws_b = [mk_w(n, k, k4b, k6b, k8b) for n in ((384, 128)
            if case == "down_qkv" else (256, 256))]
    st_b = stack_scaled_w8(ws_b)
    x_a = jnp.asarray(rng.normal(0, 1, (m, k_a)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    h_in = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    gamma = jnp.asarray(rng.normal(1, 0.1, (k,)).astype(np.float32))
    bias_a = jnp.asarray(rng.normal(0, 0.1, (k,)).astype(np.float32)
                         ).astype(jnp.bfloat16)
    perm_b = rng.permutation(k).astype(np.int32)
    bits_b = jnp.asarray(pack_masks(benes_route(perm_b)[1]))

    kw = dict(gamma_b=gamma, benes_b=bits_b, bias_a=bias_a)
    ref_kw = {}
    if case == "o_gateup":
        perm_a = rng.permutation(k_a).astype(np.int32)
        bits_a = jnp.asarray(pack_masks(benes_route(perm_a)[1]))
        kw.update(producer_a="plain", benes_a=bits_a)
        qxa = fakequant_site_pallas(
            jnp.take(x_a, jnp.asarray(perm_a), axis=1),
            k4a, k6a, k8a, interpret=True)
    else:
        up = jnp.asarray(rng.normal(0, 1, (m, k_a)).astype(np.float32) / 4
                         ).astype(jnp.bfloat16)
        kw.update(producer_a="silu", up_a=up)
        qxa = fakequant_site_pallas(x_a, k4a, k6a, k8a, producer="silu",
                                    up=up, interpret=True)

    # unfused reference chain
    a16 = mixed_matmul_w8(qxa, wa, interpret=True) + bias_a
    h_mid = h_in + a16
    outs_ref = mixed_matmul_w8_stack(h_mid, st_b, producer="rms",
                                     gamma=gamma, benes=bits_b,
                                     interpret=True)

    hm, outs = mixed_matmul_w8_pair(x_a, h_in, wa, st_b, interpret=True,
                                    **kw)
    np.testing.assert_array_equal(np.asarray(hm, np.float32),
                                  np.asarray(h_mid, np.float32))
    # outputs: a flipped RNE tie moves a channel one grid step (~0.5-1.5
    # scaled), which a 512-wide dot smears into O(|w|*step) per element —
    # bound by the quantizer's own noise band, and require the bulk of
    # elements bit-exact (interpret-mode lax.rsqrt precision differs per
    # fusion context; on-chip both paths share the VPU rsqrt)
    for g, r in zip(outs, outs_ref):
        ga, ra = np.asarray(g, np.float32), np.asarray(r, np.float32)
        np.testing.assert_allclose(ga, ra, rtol=0.05, atol=1.0)
        assert np.median(np.abs(ga - ra)) <= 0.25


def test_decode_step_paired_matches_unfused(rng, monkeypatch):
    """The residual-pair decode path == the per-cluster path at the
    logits level (rms reduction-order caveat -> tolerance), and the KV
    appended for layer 0 is bit-identical."""
    import micromix_tpu.serve.runner as R
    from micromix_tpu.models import (
        ModelConfig, default_calibration, quantize_model,
        random_dense_params)
    from micromix_tpu.models.surgery import stack_layer_projections
    from micromix_tpu.serve.kv_cache import make_cache

    cfg = ModelConfig(arch="llama", vocab_size=64, hidden_size=512,
                      intermediate_size=1024, num_layers=2, num_heads=4,
                      num_kv_heads=2, head_dim=128, rope_theta=1e4,
                      rms_eps=1e-5)
    dense = random_dense_params(cfg, seed=21)
    qp = stack_layer_projections(
        quantize_model(dense, cfg, default_calibration(cfg, 128, 128)))
    b = 2

    def mk_caches():
        return [make_cache(8, 128, cfg.num_kv_heads, cfg.head_dim, b + 1,
                           4, bits=8) for _ in range(cfg.num_layers)]

    toks = jnp.asarray(rng.integers(0, 64, (b,)).astype(np.int32))
    seq_ids = jnp.arange(b, dtype=jnp.int32)
    pos = jnp.zeros((b,), jnp.int32)

    ref_logits, ref_caches = R.decode_step(qp, cfg, mk_caches(), toks,
                                           seq_ids, pos)
    assert R._can_pair(qp, cfg, b) is False  # CPU gates off by default
    monkeypatch.setattr(R, "_can_pair", lambda *a: True)
    got_logits, got_caches = R.decode_step(qp, cfg, mk_caches(), toks,
                                           seq_ids, pos)
    ga, ra = np.asarray(got_logits), np.asarray(ref_logits)
    assert ga.shape == ra.shape
    np.testing.assert_allclose(ga, ra, rtol=0.1, atol=1.0)
    assert np.median(np.abs(ga - ra)) < 0.1
    # layer-0 KV comes from the same stacked qkv call in both paths
    np.testing.assert_array_equal(np.asarray(got_caches[0].k_codes),
                                  np.asarray(ref_caches[0].k_codes))


def test_decode_multi_scan_with_paired_path(rng, monkeypatch):
    """The residual-pair decode path must trace/execute inside the
    engine's lax.scan chunk program (decode_multi) — the form the
    serving engine actually dispatches."""
    import jax

    import micromix_tpu.serve.runner as R
    from micromix_tpu.models import (
        ModelConfig, default_calibration, quantize_model,
        random_dense_params)
    from micromix_tpu.models.surgery import stack_layer_projections
    from micromix_tpu.serve.kv_cache import make_cache

    cfg = ModelConfig(arch="llama", vocab_size=64, hidden_size=512,
                      intermediate_size=1024, num_layers=2, num_heads=4,
                      num_kv_heads=2, head_dim=128, rope_theta=1e4,
                      rms_eps=1e-5)
    qp = stack_layer_projections(
        quantize_model(random_dense_params(cfg, seed=23), cfg,
                       default_calibration(cfg, 128, 128)))
    b = 2
    caches = [make_cache(8, 128, cfg.num_kv_heads, cfg.head_dim, b + 1,
                         4, bits=8) for _ in range(cfg.num_layers)]
    toks = jnp.asarray(rng.integers(0, 64, (b,)).astype(np.int32))
    seq_ids = jnp.arange(b, dtype=jnp.int32)
    pos = jnp.zeros((b,), jnp.int32)
    monkeypatch.setattr(R, "_can_pair", lambda *a: True)
    out, caches = R.decode_multi(
        qp, cfg, caches, toks, seq_ids, pos, jax.random.PRNGKey(0),
        jnp.zeros((b,)), jnp.zeros((b,), jnp.int32), jnp.ones((b,)),
        n_steps=2, sample_mode="greedy")
    assert out.shape == (2, b)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) < 64))
