"""TP with heterogeneous shard-local budgets (budgets-as-data TP).

The segmented TP plan (tp_quant.py) must give every shard IDENTICAL
(k4, k6, k8) — static segment meta is part of the compiled SPMD program,
so per-shard budgets are forced to an even split rounded to the 32-channel
MX block (budget granularity 32·tp instead of the reference's 128-global,
reorder_indices.py:103-111).  The hetero representation (models/hetero.py)
moves the budget decision into DATA (a per-32-block format id array), so
each shard keeps the channels' GLOBAL format assignment: shard i's local
fp6/fp8 budget is the count of ITS channels inside the global fp6/fp8
segments (rounded to the 32 block), not k6/tp.  Shards then genuinely
differ — impossible in the segmented plan — and the sharded model tracks
the single-chip global allocation more closely.

Layout mirrors tp_quant.py (Megatron row/column parallel, one psum per
row-parallel projection); quantization runs as fakequant straight to the
exact bf16 grid image feeding the canonical-order ScaledW8 matmul.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.common import (
    ModelConfig, apply_rope, attention, causal_mask, rmsnorm, rope_table)
from ..models.hetero import (
    FakeQuantSite, _block_fmt, fakequant_site, make_fakequant_site,
    rmsnorm_fakequant,
    quantize_linear_hetero)
from ..models.surgery import (
    ATTN_IN, DOWN_IN, MLP_IN, O_IN, LayerCalib, SiteCalibration)
from ..mx import numerics as nx
from ..mx.formats import BLOCK_SIZE, FP4
from ..mx.scaledw8 import ScaledW8, encode_scaled_values
from .spmd import tp_validate_config

Params = Dict[str, Any]


def _round32_nearest(c: int) -> int:
    return ((c + BLOCK_SIZE // 2) // BLOCK_SIZE) * BLOCK_SIZE


def split_site_calibration_hetero(calib: SiteCalibration, k: int,
                                  tp: int) -> List[SiteCalibration]:
    """Global site calibration -> tp shard-local calibs, GLOBAL budgets.

    Channel c lives on shard c // (k/tp); the global ascending-saliency
    order restricted to a shard keeps its relative order (same as
    tp_quant.split_site_calibration).  Budgets differ: shard i's p6/p8 is
    how many of ITS channels the global allocation put in fp6/fp8
    (nearest-32 rounded), so the sharded format map approximates the
    global one instead of an even split.
    """
    k_l = k // tp
    assert k % tp == 0 and k_l % BLOCK_SIZE == 0, (k, tp)
    k4, k6, _ = calib.splits(k)
    orders: List[List[int]] = [[] for _ in range(tp)]
    c6 = [0] * tp
    c8 = [0] * tp
    for j, src in enumerate(np.asarray(calib.reorder_index)):
        s = int(src) // k_l
        orders[s].append(int(src) - s * k_l)
        if j >= k4 + k6:
            c8[s] += 1
        elif j >= k4:
            c6[s] += 1
    out = []
    for s in range(tp):
        p8_l = min(_round32_nearest(c8[s]), k_l)
        p6_l = min(_round32_nearest(c6[s]), k_l - p8_l)
        out.append(SiteCalibration(np.asarray(orders[s], np.int32),
                                   p6_l, p8_l))
    return out


def _kshard_linear_hetero(w: jnp.ndarray, calib: SiteCalibration, tp: int,
                          *, bias=None):
    """(N, K) dense -> (QuantLinear-style dict pieces) K-sharded hetero.

    Returns (ScaledW8 with column-concatenated per-shard canonical codes
    and ONE common base, FakeQuantSite whose perm/block_fmt concatenate
    the shard-local arrays, per-shard local calibs).  Each shard's code
    slice is the semantically valid local tensor; the replicated base
    decodes every slice (encode runs once over the concatenation, so the
    base is common by construction).
    """
    n, k = w.shape
    k_l = k // tp
    locals_ = split_site_calibration_hetero(calib, k, tp)
    vals = []
    for i, c in enumerate(locals_):
        ws = jnp.take(w[:, i * k_l:(i + 1) * k_l].astype(jnp.float32),
                      jnp.asarray(c.reorder_index, jnp.int32), axis=1)
        codes, scales = nx.quantize_blocks(ws, FP4)
        vals.append(codes_to_vals(codes, scales))
    c8, base = encode_scaled_values(jnp.concatenate(vals, axis=1),
                                    check=True)
    wq = ScaledW8(codes=c8, base=base, k4=k_l, k6=0, k8=0)
    perm = np.concatenate([np.asarray(c.reorder_index, np.int32)
                           for c in locals_])
    fmt = jnp.concatenate([_block_fmt(c, k_l) for c in locals_])
    site = FakeQuantSite(perm=jnp.asarray(perm), block_fmt=fmt)
    b16 = None if bias is None else bias.astype(jnp.bfloat16)
    return wq, b16, site, locals_


def codes_to_vals(codes: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """FP4 block codes + UE8M0 scales -> exact scaled f32 values."""
    return nx.decode(codes, FP4) * jnp.repeat(
        nx.exp2i(scales.astype(jnp.int32) - 127), BLOCK_SIZE, axis=-1)


def quantize_layer_tp_hetero(p: Dict[str, Any], cfg: ModelConfig,
                             calib: LayerCalib, tp: int) -> Dict[str, Any]:
    """Dense decoder layer -> hetero TP layer (non-MoE)."""
    hid, inter = cfg.hidden_size, cfg.intermediate_size
    odim = cfg.num_heads * cfg.head_dim
    out: Dict[str, Any] = {"ln1": p["ln1"], "ln2": p["ln2"]}

    # column-parallel side: global canonical quantization, rows shard
    c_attn = calib[ATTN_IN]
    out["attn_site"] = make_fakequant_site(c_attn, hid)
    for name in ("q", "k", "v"):
        out[name] = quantize_linear_hetero(p[name].w, c_attn,
                                           bias=p[name].bias)

    # row-parallel o: K-sharded, per-shard global-allocation budgets
    wq, b, site, _ = _kshard_linear_hetero(p["o"].w, calib[O_IN], tp,
                                           bias=p["o"].bias)
    out["o"] = {"w": wq, "bias": b}
    out["o_site"] = site

    c_mlp = calib[MLP_IN]
    out["mlp_site"] = make_fakequant_site(c_mlp, hid)
    wq, b, dsite, dn_locals = _kshard_linear_hetero(
        p["down"].w, calib[DOWN_IN], tp, bias=p["down"].bias)
    out["down"] = {"w": wq, "bias": b}
    # gate/up ROWS carry the per-shard canonical sort, so each shard's
    # silu*mul slice is already in its local canonical order: no gather
    out["down_site"] = FakeQuantSite(perm=None, block_fmt=dsite.block_fmt)
    k_l = inter // tp
    row_perm = np.concatenate([
        i * k_l + np.asarray(dn_locals[i].reorder_index, np.int32)
        for i in range(tp)
    ])
    for name in ("gate", "up"):
        out[name] = quantize_linear_hetero(p[name].w, c_mlp,
                                           bias=p[name].bias,
                                           row_perm=row_perm)
    return out


def quantize_model_tp_hetero(params: Params, cfg: ModelConfig,
                             calibs: List[LayerCalib], tp: int) -> Params:
    assert not cfg.is_moe, "MoE uses expert parallelism (parallel.moe_ep)"
    assert len(calibs) == cfg.num_layers
    tp_validate_config(cfg, tp)
    return {
        "embed": params["embed"],
        "final_ln": params["final_ln"],
        "lm_head": params["lm_head"],
        "layers": [quantize_layer_tp_hetero(p, cfg, c, tp)
                   for p, c in zip(params["layers"], calibs)],
    }


def param_specs_tp_hetero(params: Params) -> Params:
    """PartitionSpec pytree for a quantize_model_tp_hetero pytree."""
    from ..models.common import QuantLinear
    rep = P()

    def layer_spec(p):
        out = {}
        for k, v in p.items():
            if k in ("q", "k", "v", "gate", "up"):
                out[k] = QuantLinear(
                    w=ScaledW8(codes=P("model", None), base=rep,
                               k4=v.w.k4, k6=v.w.k6, k8=v.w.k8),
                    bias=None if v.bias is None else P("model"))
            elif k in ("o", "down"):
                out[k] = {
                    "w": ScaledW8(codes=P(None, "model"), base=rep,
                                  k4=v["w"].k4, k6=v["w"].k6, k8=v["w"].k8),
                    "bias": None if v["bias"] is None else rep,
                }
            elif k in ("o_site", "down_site"):
                out[k] = FakeQuantSite(
                    perm=None if v.perm is None else P("model"),
                    block_fmt=P("model"))
            else:
                out[k] = jax.tree.map(lambda _: rep, v)
        return out

    return {
        "embed": rep, "final_ln": rep, "lm_head": rep,
        "layers": [layer_spec(p) for p in params["layers"]],
    }


def shard_params_tp_hetero(params: Params, mesh: Mesh) -> Params:
    specs = param_specs_tp_hetero(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def _tph_decoder_layer(h, p, cfg: ModelConfig, cos, sin, mask, tp: int):
    """Per-device body: one psum per row-parallel projection."""
    from ..kernels.mixed_matmul import mixed_matmul

    b, s, _ = h.shape
    hd = cfg.head_dim
    nh_l = cfg.num_heads // tp
    nkv_l = cfg.num_kv_heads // tp

    qx = rmsnorm_fakequant(h, p["ln1"], p["attn_site"],
                           cfg.rms_eps).reshape(b * s, -1)
    q = p["q"](qx).reshape(b, s, nh_l, hd)
    k = p["k"](qx).reshape(b, s, nkv_l, hd)
    v = p["v"](qx).reshape(b, s, nkv_l, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    attn_local = attention(q, k, v, mask).reshape(b * s, nh_l * hd)

    # o_site leaves are the shard-local slices under shard_map
    qo = fakequant_site(attn_local.astype(jnp.float32), p["o_site"])
    # keep partial sums f32 through the reduction (tp_quant.py rationale)
    o = mixed_matmul(qo, p["o"]["w"], out_dtype=jnp.float32)
    o = jax.lax.psum(o, "model")
    if p["o"]["bias"] is not None:
        o = o + p["o"]["bias"]
    h = h + o.astype(jnp.bfloat16).reshape(b, s, -1)

    qm = rmsnorm_fakequant(h, p["ln2"], p["mlp_site"],
                           cfg.rms_eps).reshape(b * s, -1)
    gate = p["gate"](qm)
    up = p["up"](qm)
    act = (jax.nn.silu(gate.astype(jnp.float32))
           * up.astype(jnp.float32))     # already shard-local device layout
    dq = fakequant_site(act, p["down_site"])
    d = jax.lax.psum(
        mixed_matmul(dq, p["down"]["w"], out_dtype=jnp.float32), "model")
    if p["down"]["bias"] is not None:
        d = d + p["down"]["bias"]
    return h + d.astype(jnp.bfloat16).reshape(b, s, -1)


def _tph_forward_local(params, tokens, *, cfg: ModelConfig, tp: int):
    b, s = tokens.shape
    h = jnp.take(params["embed"], tokens, axis=0).astype(jnp.bfloat16)
    cos, sin = rope_table(jnp.arange(s), cfg.head_dim, cfg.rope_theta,
                          cfg.rope_scaling)
    mask = causal_mask(s, s, cfg.sliding_window)
    for p in params["layers"]:
        h = _tph_decoder_layer(h, p, cfg, cos, sin, mask, tp)
    h = rmsnorm(h, params["final_ln"], cfg.rms_eps)
    return jnp.dot(h, params["lm_head"].T.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def sharded_forward_tp_hetero(params: Params, cfg: ModelConfig,
                              tokens: jnp.ndarray,
                              mesh: Mesh) -> jnp.ndarray:
    """DP x hetero-TP forward over a quantize_model_tp_hetero pytree."""
    tp = mesh.shape["model"]
    specs = param_specs_tp_hetero(params)
    fn = jax.shard_map(
        functools.partial(_tph_forward_local, cfg=cfg, tp=tp),
        mesh=mesh,
        in_specs=(specs, P("data", None)),
        out_specs=P("data", None, None),
        check_vma=False,
    )
    return jax.jit(fn)(params, tokens)


__all__ = [
    "split_site_calibration_hetero", "quantize_model_tp_hetero",
    "quantize_layer_tp_hetero", "param_specs_tp_hetero",
    "shard_params_tp_hetero", "sharded_forward_tp_hetero",
]
