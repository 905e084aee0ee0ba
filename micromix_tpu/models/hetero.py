"""Heterogeneous-budget quantized layers for pipeline parallelism.

Real calibration gives every layer its own (k4, k6, k8) segment budgets
(calib/allocate.py, reorder_indices.py:103-111), but pipeline parallelism
stacks per-layer params into one leading-L pytree (parallel/pp.py
stack_layers), which needs every leaf shape — and every static meta field —
identical across layers.  Round 1 therefore couldn't pipeline a genuinely
calibrated model.

This module gives quantized layers a UNIFORM-SHAPE representation whose
per-layer quantization decisions are *data*, not structure:

  * weights: ScaledW8 codes in CANONICAL (sorted-saliency) column order —
    one (N, K) u8 array + (1, 1) base regardless of budgets.  Canonical
    32-blocks are exactly the reference's scale-block membership
    (reorder.cu:154-209); the segment interleave used elsewhere is a pure
    layout optimization this path skips.
  * activation sites: FakeQuantSite{perm (K,), block_fmt (K//32,)} — the
    composed gather and a per-block format id (0=fp4 1=fp6 2=fp8), both
    plain arrays.  Quantization runs as fakequant straight to the exact
    bf16 grid image (what the ScaledW8 matmul consumes anyway), selecting
    the per-block format numerics with jnp.where — identical values to the
    segmented quantize, no segment-shaped buffers.

Stacking then works for ANY per-layer budget mix, and the stage loop stays
a single compiled body.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..mx import numerics as nx
from ..mx.formats import BLOCK_SIZE, FP4, FP6, FP8
from ..mx.scaledw8 import ScaledW8, encode_scaled_values
from .common import ModelConfig, QuantLinear
from .surgery import (
    ATTN_IN, DOWN_IN, MLP_IN, O_IN, LayerCalib, SiteCalibration)


@dataclasses.dataclass(frozen=True)
class FakeQuantSite:
    """Budget-as-data activation quantize site (uniform-shape)."""

    perm: Optional[jnp.ndarray]      # (K,) int32 or None (identity)
    block_fmt: jnp.ndarray           # (K//32,) int32: 0=fp4 1=fp6 2=fp8


jax.tree_util.register_dataclass(
    FakeQuantSite, data_fields=["perm", "block_fmt"], meta_fields=[])


def _block_fmt(calib: SiteCalibration, k: int) -> jnp.ndarray:
    k4, k6, k8 = calib.splits(k)
    fmt = np.zeros((k // BLOCK_SIZE,), np.int32)
    fmt[k4 // BLOCK_SIZE:(k4 + k6) // BLOCK_SIZE] = 1
    fmt[(k4 + k6) // BLOCK_SIZE:] = 2
    return jnp.asarray(fmt)


def fakequant_site(x: jnp.ndarray, site: FakeQuantSite) -> jnp.ndarray:
    """x (..., K) -> exact bf16 image of the mixed-format quantization,
    canonical (sorted) column order.

    Per 32-block: UE8M0 scale from the block absmax under the block's own
    format max, then saturating RNE onto that format's grid — the same
    numerics as mx.quantize_blocks per segment, with the format chosen per
    block by ``block_fmt`` instead of by static segment membership.
    """
    if site.perm is not None:
        x = jnp.take(x, site.perm, axis=-1)
    shape = x.shape
    k = shape[-1]
    xb = x.astype(jnp.float32).reshape(*shape[:-1], k // BLOCK_SIZE,
                                       BLOCK_SIZE)
    maxv = jnp.max(jnp.abs(xb), axis=-1)
    fmt = site.block_fmt
    out = None
    for fid, f in ((0, FP4), (1, FP6), (2, FP8)):
        e = nx.block_scale_exponent(maxv, f)
        q = nx.quantize_to_grid(xb * nx.exp2i(-e)[..., None], f)
        vals = q * nx.exp2i(e)[..., None]
        out = vals if out is None else jnp.where(
            (fmt == fid).reshape((1,) * (xb.ndim - 2) + (-1, 1)), vals, out)
    return out.reshape(shape).astype(jnp.bfloat16)


def rmsnorm_fakequant(x: jnp.ndarray, gamma: jnp.ndarray,
                      site: FakeQuantSite, eps: float) -> jnp.ndarray:
    """f32 rmsnorm straight into the fakequant grid image.

    The hetero analog of the fused rmsnorm_quantize_x: the norm output
    feeds the quantizer WITHOUT an intermediate bf16 round — the single
    definition of that contract for every hetero forward (project_all,
    tp_hetero layers, tp_serve layers)."""
    xf = x.astype(jnp.float32)
    rvar = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return fakequant_site(xf * rvar * gamma.astype(jnp.float32), site)


def quantize_linear_hetero(w: jnp.ndarray, calib: SiteCalibration, *,
                           bias=None, row_perm: Optional[np.ndarray] = None
                           ) -> QuantLinear:
    """(N, K) dense -> QuantLinear with canonical-order ScaledW8 weight.

    Weight quantization is MXFP4-grid for every block (the reference's w4
    mode, reorder.cu:271-432) over canonical consecutive 32-blocks of the
    saliency-sorted channels.  Segment meta is fixed to (K, 0, 0) so the
    pytree structure is budget-independent (required for PP stacking); the
    real budgets live in the matching FakeQuantSite.
    """
    n, k = w.shape
    wp = jnp.take(w.astype(jnp.float32),
                  jnp.asarray(calib.reorder_index, jnp.int32), axis=1)
    if row_perm is not None:
        wp = jnp.take(wp, jnp.asarray(row_perm, jnp.int32), axis=0)
        if bias is not None:
            bias = jnp.take(bias, jnp.asarray(row_perm, jnp.int32), axis=0)
    codes, scales = nx.quantize_blocks(wp, FP4)
    vals = nx.decode(codes, FP4) * jnp.repeat(
        nx.exp2i(scales.astype(jnp.int32) - 127), BLOCK_SIZE, axis=-1)
    c8, base = encode_scaled_values(vals, check=True)
    return QuantLinear(
        w=ScaledW8(codes=c8, base=base, k4=k, k6=0, k8=0),
        bias=None if bias is None else bias.astype(jnp.bfloat16))


def make_fakequant_site(calib: SiteCalibration, k: int) -> FakeQuantSite:
    return FakeQuantSite(
        perm=jnp.asarray(calib.reorder_index, jnp.int32),
        block_fmt=_block_fmt(calib, k))


def quantize_layer_hetero(p: Dict[str, Any], cfg: ModelConfig,
                          calib: LayerCalib) -> Dict[str, Any]:
    """Dense decoder layer -> uniform-shape heterogeneous-budget layer."""
    hid = cfg.hidden_size
    out: Dict[str, Any] = {"ln1": p["ln1"], "ln2": p["ln2"]}
    c_attn = calib[ATTN_IN]
    out["attn_site"] = make_fakequant_site(c_attn, hid)
    for name in ("q", "k", "v"):
        out[name] = quantize_linear_hetero(p[name].w, c_attn,
                                           bias=p[name].bias)
    c_o = calib[O_IN]
    odim = cfg.num_heads * cfg.head_dim
    out["o_site"] = make_fakequant_site(c_o, odim)
    out["o"] = quantize_linear_hetero(p["o"].w, c_o, bias=p["o"].bias)

    if cfg.is_moe:
        out["router"] = p["router"]  # stays bf16 (qMixtralLayer.py:385)
        out["experts"] = [
            quantize_expert_hetero(
                ep, cfg,
                calib[f"expert{e}_{MLP_IN}"],
                calib[f"expert{e}_{DOWN_IN}"])
            for e, ep in enumerate(p["experts"])
        ]
        return out
    c_mlp = calib[MLP_IN]
    c_dn = calib[DOWN_IN]
    out["mlp_site"] = make_fakequant_site(c_mlp, hid)
    # gate/up rows carry the down-input canonical sort, so the silu*mul
    # output is already in sorted order: the down site gathers nothing
    rp = np.asarray(c_dn.reorder_index, np.int32)
    out["down_site"] = FakeQuantSite(
        perm=None, block_fmt=_block_fmt(c_dn, cfg.intermediate_size))
    out["gate"] = quantize_linear_hetero(p["gate"].w, c_mlp,
                                         bias=p["gate"].bias, row_perm=rp)
    out["up"] = quantize_linear_hetero(p["up"].w, c_mlp,
                                       bias=p["up"].bias, row_perm=rp)
    out["down"] = quantize_linear_hetero(p["down"].w, c_dn,
                                         bias=p["down"].bias)
    return out


def quantize_expert_hetero(ep: Dict[str, Any], cfg: ModelConfig,
                           c_in: SiteCalibration,
                           c_dn: SiteCalibration) -> Dict[str, Any]:
    """One Mixtral expert -> uniform-shape hetero representation.

    Every leaf shape and static is budget-independent, so experts with
    DIFFERENT per-expert (k4, k6, k8) stack into (E, ...) arrays for
    expert parallelism (parallel/moe_ep.stack_hetero_experts) — the
    segmented representation requires uniform budgets there.  Mirrors the
    non-hetero expert surgery (surgery.quantize_layer MoE branch): w1/w3
    rows carry the down-input canonical sort so site_down needs no perm.
    """
    rp = np.asarray(c_dn.reorder_index, np.int32)
    return {
        "site_in": make_fakequant_site(c_in, cfg.hidden_size),
        "site_down": FakeQuantSite(
            perm=None, block_fmt=_block_fmt(c_dn, cfg.intermediate_size)),
        "w1": quantize_linear_hetero(ep["w1"].w, c_in, bias=ep["w1"].bias,
                                     row_perm=rp),
        "w3": quantize_linear_hetero(ep["w3"].w, c_in, bias=ep["w3"].bias,
                                     row_perm=rp),
        "w2": quantize_linear_hetero(ep["w2"].w, c_dn, bias=ep["w2"].bias),
    }


def quantize_model_hetero(params: Dict[str, Any], cfg: ModelConfig,
                          calibs: List[LayerCalib]) -> Dict[str, Any]:
    """Dense pytree -> heterogeneous-budget quantized pytree.

    Every layer's leaves have identical shapes and statics regardless of
    its budgets, so parallel/pp.stack_layers accepts genuinely calibrated
    models (VERDICT r1 item 3).
    """
    assert len(calibs) == cfg.num_layers
    return {
        "embed": params["embed"],
        "final_ln": params["final_ln"],
        "lm_head": params["lm_head"],
        "layers": [quantize_layer_hetero(p, cfg, c)
                   for p, c in zip(params["layers"], calibs)],
    }


__all__ = [
    "FakeQuantSite", "fakequant_site", "make_fakequant_site",
    "rmsnorm_fakequant",
    "quantize_linear_hetero", "quantize_layer_hetero",
    "quantize_expert_hetero", "quantize_model_hetero",
]
