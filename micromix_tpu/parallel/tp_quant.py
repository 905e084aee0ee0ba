"""TP v2: K-sharded o/down projections with psum — shard-local quantization.

The v1 TP plan (spmd.py) replicates o/down weights and all-gathers their
inputs.  This is the Megatron row-parallel completion: o_proj and down_proj
weights shard along the CONTRACTION axis, each device quantizes and
multiplies only its local activation slice, and one ``psum`` per projection
replaces the all-gather + redundant full matmul.

The interesting part is quantization-sharding co-design: MX scale blocks
(32 channels) and the calibration channel permutation must not straddle
shards, so quantization becomes SHARD-LOCAL at bake time:

  * each shard owns its natural K-slice (for o: its attention heads' output
    channels; for down: its gate/up rows)
  * the global saliency order restricted to a shard (order-preserving)
    becomes that shard's local reorder index
  * FP6/FP8 budgets are split evenly per shard, rounded to 32 (the MX block)
    — every shard has identical (k4, k6, k8) so the packed global arrays
    are uniform and shard cleanly on their column axis

Numerics therefore differ slightly from the single-chip global allocation
(budget granularity 32·tp instead of 128, per-shard instead of global
channel competition); with identity calibration and k4-only budgets the
two are bit-identical (locked by tests/test_tp_quant.py).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.common import (
    ModelConfig, QuantSite, apply_rope, attention, causal_mask, rmsnorm,
    rope_table)
from ..models.surgery import (
    ATTN_IN, DOWN_IN, MLP_IN, O_IN, LayerCalib, SiteCalibration,
    make_site, quantize_linear)
from ..mx import layout as lay
from ..mx.mxtensor import MixedTensor
from ..ops.quantize_ops import (
    activation_quantize, reorder_quantize_x, rmsnorm_quantize_x)
from .spmd import tp_validate_config

Params = Dict[str, Any]


def _round32(x: int) -> int:
    return (x // 32) * 32


def split_site_calibration(calib: SiteCalibration, k: int,
                           tp: int) -> List[SiteCalibration]:
    """Global site calibration -> tp shard-local calibrations.

    Channel c lives on shard c // (k/tp); the global ascending-saliency
    order restricted to a shard keeps its relative order; budgets are
    per-shard, rounded down to the 32-channel MX block.
    """
    k_l = k // tp
    assert k % tp == 0 and k_l % 32 == 0, (k, tp)
    p6_l = _round32(calib.p6_num // tp)
    p8_l = _round32(calib.p8_num // tp)
    orders: List[List[int]] = [[] for _ in range(tp)]
    for src in np.asarray(calib.reorder_index):
        s = int(src) // k_l
        orders[s].append(int(src) - s * k_l)
    return [SiteCalibration(np.asarray(o, np.int32), p6_l, p8_l)
            for o in orders]


def _concat_mixed(ts: List[MixedTensor]) -> MixedTensor:
    cat = lambda f: jnp.concatenate([getattr(t, f) for t in ts], axis=1)
    return MixedTensor(
        fp4=cat("fp4"), fp6=cat("fp6"), fp8=cat("fp8"),
        sf4=cat("sf4"), sf6=cat("sf6"), sf8=cat("sf8"),
        fp4_packed=ts[0].fp4_packed, fp4_only=ts[0].fp4_only)


def _concat_shard_weights(mixed: List[MixedTensor]):
    """Per-shard MixedTensors -> one column-concatenated device weight.

    Tries the ScaledW8 layout with a COMMON base across shards (each
    shard's code slice must decode with the replicated per-tensor base
    inside shard_map); falls back to split-plane on range overflow.
    The concatenated array is storage only — each shard's slice is the
    semantically valid local tensor.  Static segment meta is the LOCAL
    (k4, k6, k8): that is what the shard-local activation matmul checks.
    """
    from ..mx.scaledw8 import ScaledW8, pack_scaled_w8
    if mixed[0].fp4_only:
        try:
            per = [pack_scaled_w8(t) for t in mixed]
            base = min(int(p.base.reshape(())) for p in per)
            per = [pack_scaled_w8(t, base=base) for t in mixed]
            k4_l, k6_l, k8_l = mixed[0].segments()
            return ScaledW8(
                codes=jnp.concatenate([p.codes for p in per], axis=1),
                base=jnp.full((1, 1), base, jnp.int32),
                k4=k4_l, k6=k6_l, k8=k8_l)
        except ValueError:
            pass
    return _concat_mixed(mixed)


def _kshard_linear(w: jnp.ndarray, calib: SiteCalibration, tp: int, *,
                   bias=None, weight_fp4_only: bool = True):
    """Quantize a (N, K) weight shard-locally; returns (QuantLinear with
    column-concatenated packed arrays, shard-local QuantSite with the
    concatenated local perms, list of local calibs)."""
    from ..models.common import QuantLinear

    n, k = w.shape
    k_l = k // tp
    locals_ = split_site_calibration(calib, k, tp)
    qs = [quantize_linear(w[:, i * k_l:(i + 1) * k_l], locals_[i],
                          weight_fp4_only=weight_fp4_only,
                          layout="splitplane")
          for i in range(tp)]
    wq = _concat_shard_weights([q.w for q in qs])
    k4_l, k6_l, k8_l = locals_[0].splits(k_l)
    perms = np.concatenate([
        lay.compose_segmented(c.reorder_index, k4_l, k6_l, k8_l)
        for c in locals_
    ]).astype(np.int32)
    site = QuantSite(k4=k4_l, k6=k6_l, k8=k8_l, perm=jnp.asarray(perms))
    return QuantLinear(
        w=wq, bias=None if bias is None else bias.astype(jnp.bfloat16)
    ), site, locals_


def quantize_layer_tp(p: Dict[str, Any], cfg: ModelConfig,
                      calib: LayerCalib, tp: int, *,
                      weight_fp4_only: bool = True) -> Dict[str, Any]:
    """Dense decoder layer -> TP-v2 quantized layer (non-MoE)."""
    hid, inter = cfg.hidden_size, cfg.intermediate_size
    odim = cfg.num_heads * cfg.head_dim
    out: Dict[str, Any] = {"ln1": p["ln1"], "ln2": p["ln2"]}

    # column-parallel side: unchanged global quantization, rows shard
    c_attn = calib[ATTN_IN]
    out["attn_site"] = make_site(c_attn, hid)
    for name in ("q", "k", "v"):
        out[name] = quantize_linear(p[name].w, c_attn, p[name].bias,
                                    weight_fp4_only=weight_fp4_only)

    # row-parallel o: K-sharded, shard-local quantization
    out["o"], out["o_site"], _ = _kshard_linear(
        p["o"].w, calib[O_IN], tp, bias=p["o"].bias,
        weight_fp4_only=weight_fp4_only)

    c_mlp = calib[MLP_IN]
    out["mlp_site"] = make_site(c_mlp, hid)
    c_dn = calib[DOWN_IN]
    out["down"], _, dn_locals = _kshard_linear(
        p["down"].w, c_dn, tp, bias=p["down"].bias,
        weight_fp4_only=weight_fp4_only)
    k_l = inter // tp
    k4_l, k6_l, k8_l = dn_locals[0].splits(k_l)
    out["down_site"] = QuantSite(k4=k4_l, k6=k6_l, k8=k8_l)
    # bake the per-shard down-input device layout into gate/up ROWS:
    # shard i's rows are its own channels in shard-local device order
    row_perm = np.concatenate([
        i * k_l + lay.compose_segmented(dn_locals[i].reorder_index,
                                        k4_l, k6_l, k8_l)
        for i in range(tp)
    ]).astype(np.int32)
    for name in ("gate", "up"):
        out[name] = quantize_linear(p[name].w, c_mlp, p[name].bias,
                                    weight_fp4_only=weight_fp4_only,
                                    row_perm=row_perm)
    return out


def quantize_model_tp(params: Params, cfg: ModelConfig,
                      calibs: List[LayerCalib], tp: int, *,
                      weight_fp4_only: bool = True) -> Params:
    assert not cfg.is_moe, "MoE uses expert parallelism (parallel.moe_ep)"
    assert len(calibs) == cfg.num_layers
    tp_validate_config(cfg, tp)
    return {
        "embed": params["embed"],
        "final_ln": params["final_ln"],
        "lm_head": params["lm_head"],
        "layers": [
            quantize_layer_tp(p, cfg, c, tp,
                              weight_fp4_only=weight_fp4_only)
            for p, c in zip(params["layers"], calibs)
        ],
    }


def _mixed_spec(spec: P, like) -> Any:
    from ..mx.scaledw8 import ScaledW8
    if isinstance(like, ScaledW8):
        return ScaledW8(codes=spec, base=P(), k4=like.k4, k6=like.k6,
                        k8=like.k8)
    return MixedTensor(fp4=spec, fp6=spec, fp8=spec,
                       sf4=spec, sf6=spec, sf8=spec,
                       fp4_packed=like.fp4_packed, fp4_only=like.fp4_only)


def param_specs_tp(params: Params) -> Params:
    """PartitionSpec pytree for a quantize_model_tp pytree."""
    row = P("model", None)      # q/k/v/gate/up: output rows shard
    col = P(None, "model")      # o/down: contraction columns shard
    rep = P()

    def layer_spec(p):
        from ..models.common import QuantLinear
        out = {}
        for k, v in p.items():
            if k in ("q", "k", "v", "gate", "up"):
                out[k] = QuantLinear(
                    w=_mixed_spec(row, v.w),
                    bias=None if v.bias is None else P("model"))
            elif k in ("o", "down"):
                out[k] = QuantLinear(
                    w=_mixed_spec(col, v.w),
                    bias=None if v.bias is None else rep)
            elif k in ("o_site",):
                out[k] = QuantSite(k4=v.k4, k6=v.k6, k8=v.k8,
                                   perm=P("model"))
            else:
                out[k] = jax.tree.map(lambda _: rep, v)
        return out

    return {
        "embed": rep, "final_ln": rep, "lm_head": rep,
        "layers": [layer_spec(p) for p in params["layers"]],
    }


def shard_params_tp(params: Params, mesh: Mesh) -> Params:
    specs = param_specs_tp(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def _tp2_decoder_layer(h, p, cfg: ModelConfig, cos, sin, mask, tp: int):
    """Per-device body: ONE psum per row-parallel projection, no gathers."""
    b, s, _ = h.shape
    hd = cfg.head_dim
    nh_l = cfg.num_heads // tp
    nkv_l = cfg.num_kv_heads // tp

    site = p["attn_site"]
    qx = rmsnorm_quantize_x(h, p["ln1"], site.perm, *site.splits,
                            eps=cfg.rms_eps)
    q = p["q"](qx).reshape(b, s, nh_l, hd)
    k = p["k"](qx).reshape(b, s, nkv_l, hd)
    v = p["v"](qx).reshape(b, s, nkv_l, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    attn_local = attention(q, k, v, mask).reshape(b * s, nh_l * hd)

    o_site = p["o_site"]  # perm is the shard-local slice (P("model"))
    qo = reorder_quantize_x(attn_local, o_site.perm, *o_site.splits)
    from ..kernels.mixed_matmul import mixed_matmul
    # keep partial sums f32 through the reduction: rounding each shard's
    # partial to bf16 before psum would add tp-dependent noise
    o = mixed_matmul(qo, p["o"].w, out_dtype=jnp.float32)
    o = jax.lax.psum(o, "model")
    if p["o"].bias is not None:
        o = o + p["o"].bias
    h = h + o.astype(jnp.bfloat16).reshape(b, s, -1)

    msite = p["mlp_site"]
    qm = rmsnorm_quantize_x(h, p["ln2"], msite.perm, *msite.splits,
                            eps=cfg.rms_eps)
    gate = p["gate"](qm)
    up = p["up"](qm)
    act = (jax.nn.silu(gate.astype(jnp.float32))
           * up.astype(jnp.float32))     # already shard-local device layout
    dsite = p["down_site"]
    dq = activation_quantize(act.reshape(b * s, -1), *dsite.splits)
    d = jax.lax.psum(
        mixed_matmul(dq, p["down"].w, out_dtype=jnp.float32), "model")
    if p["down"].bias is not None:
        d = d + p["down"].bias
    return h + d.astype(jnp.bfloat16).reshape(b, s, -1)


def _tp2_forward_local(params, tokens, *, cfg: ModelConfig, tp: int):
    b, s = tokens.shape
    h = jnp.take(params["embed"], tokens, axis=0).astype(jnp.bfloat16)
    cos, sin = rope_table(jnp.arange(s), cfg.head_dim, cfg.rope_theta,
                          cfg.rope_scaling)
    mask = causal_mask(s, s, cfg.sliding_window)
    for p in params["layers"]:
        h = _tp2_decoder_layer(h, p, cfg, cos, sin, mask, tp)
    h = rmsnorm(h, params["final_ln"], cfg.rms_eps)
    return jnp.dot(h, params["lm_head"].T.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def sharded_forward_tp(params: Params, cfg: ModelConfig,
                       tokens: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """DP x TP-v2 forward over a quantize_model_tp pytree."""
    tp = mesh.shape["model"]
    specs = param_specs_tp(params)
    fn = jax.shard_map(
        functools.partial(_tp2_forward_local, cfg=cfg, tp=tp),
        mesh=mesh,
        in_specs=(specs, P("data", None)),
        out_specs=P("data", None, None),
        check_vma=False,
    )
    return jax.jit(fn)(params, tokens)


__all__ = [
    "split_site_calibration", "quantize_model_tp", "quantize_layer_tp",
    "param_specs_tp", "shard_params_tp", "sharded_forward_tp",
]
