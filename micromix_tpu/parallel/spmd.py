"""Tensor-parallel quantized forward via shard_map.

v1 sharding plan (Megatron-style column parallel, gather-based epilogue):

  * q/k/v/gate/up (+ Mixtral w1/w3): weight ROWS sharded over "model" —
    every array of the MixedTensor shards cleanly on dim 0 (packing and
    scale blocks run along K), so quantized weights shard with zero layout
    surgery.  Attention heads are thereby model-sharded (tp must divide
    num_kv_heads).
  * o/down: weights replicated; the sharded activation is all-gathered over
    "model" and the matmul is computed redundantly.  (One gather per matmul;
    the K-sharded + psum variant needs shard-local quantization groups and
    lands with shard-aware calibration in a later round.)
  * batch is sharded over "data"; norms/embeddings replicated.

Pallas kernels cannot be auto-partitioned by GSPMD, hence the explicit
shard_map: inside it every kernel sees plain local arrays.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.common import ModelConfig, QuantLinear, attention, causal_mask, \
    rmsnorm, rope_table, apply_rope
from ..models.transformer import Params
from ..mx.mxtensor import MixedTensor
from ..mx.scaledw8 import ScaledW8
from ..ops.quantize_ops import rmsnorm_quantize_x, reorder_quantize_x, \
    silu_mul_quantize_x

ROW_SHARDED = ("q", "k", "v", "gate", "up", "w1", "w3")
REPLICATED_LIN = ("o", "down", "w2", "router")


def tp_validate_config(cfg: ModelConfig, tp: int) -> None:
    assert cfg.num_kv_heads % tp == 0, (cfg.num_kv_heads, tp)
    assert cfg.num_heads % tp == 0
    assert cfg.intermediate_size % tp == 0


def _mixed_spec(spec_rows: P) -> MixedTensor:
    """A MixedTensor of PartitionSpecs (pytree-structural)."""
    return MixedTensor(fp4=spec_rows, fp6=spec_rows, fp8=spec_rows,
                       sf4=spec_rows, sf6=spec_rows, sf8=spec_rows)


def quantized_param_specs(params: Params) -> Params:
    """PartitionSpec pytree matching a quantized parameter pytree."""
    row = P("model", None)
    rep = P()

    def lin_spec(name, lin):
        if not isinstance(lin, QuantLinear):
            return jax.tree.map(lambda _: rep, lin)
        rows = row if name in ROW_SHARDED else rep
        if isinstance(lin.w, ScaledW8):
            # codes (N, K) shard over output rows; per-tensor base replicated
            wspec = ScaledW8(codes=rows, base=rep, k4=lin.w.k4,
                             k6=lin.w.k6, k8=lin.w.k8)
        else:
            wspec = MixedTensor(fp4=rows, fp6=rows, fp8=rows, sf4=rows,
                                sf6=rows, sf8=rows,
                                fp4_packed=lin.w.fp4_packed,
                                fp4_only=lin.w.fp4_only)
        return QuantLinear(
            w=wspec,
            bias=None if lin.bias is None else (
                P("model") if name in ROW_SHARDED else rep))

    def layer_spec(p):
        out = {}
        for k, v in p.items():
            if k in ROW_SHARDED or k in REPLICATED_LIN:
                out[k] = lin_spec(k, v)
            elif k == "experts":
                out[k] = [
                    {ek: (lin_spec(ek, ev) if ek in ROW_SHARDED + REPLICATED_LIN
                          else jax.tree.map(lambda _: rep, ev))
                     for ek, ev in ep.items()}
                    for ep in v
                ]
            else:
                out[k] = jax.tree.map(lambda _: rep, v)
        return out

    return {
        "embed": rep,
        "final_ln": rep,
        "lm_head": rep,
        "layers": [layer_spec(p) for p in params["layers"]],
    }


def shard_quantized_params(params: Params, mesh: Mesh) -> Params:
    """device_put the quantized pytree with the v1 TP shardings."""
    specs = quantized_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def _tp_decoder_layer(h, p, cfg: ModelConfig, cos, sin, mask, tp: int):
    """Per-device body: h replicated over 'model', sharded over 'data'."""
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
    attn_local = attention(q, k, v, mask).reshape(b, s, nh_l * hd)
    # gather heads -> full attn output, replicated o_proj
    attn_full = jax.lax.all_gather(attn_local, "model", axis=2, tiled=True)
    o_site = p["o_site"]
    qo = reorder_quantize_x(attn_full, o_site.perm, *o_site.splits)
    o = p["o"](qo).reshape(b, s, -1)
    h = h + o

    msite = p["mlp_site"]
    qm = rmsnorm_quantize_x(h, p["ln2"], msite.perm, *msite.splits,
                            eps=cfg.rms_eps)
    gate = p["gate"](qm)
    up = p["up"](qm)
    # keep f32 through the gather so quantization decisions match the
    # single-device silu_mul_quantize_x path bit-for-bit
    act_local = (jax.nn.silu(gate.astype(jnp.float32))
                 * up.astype(jnp.float32))
    act_full = jax.lax.all_gather(act_local.reshape(b, s, -1), "model",
                                  axis=2, tiled=True)
    dsite = p["down_site"]
    from ..ops.quantize_ops import activation_quantize
    dq = activation_quantize(act_full.reshape(b * s, -1), *dsite.splits)
    d = p["down"](dq).reshape(b, s, -1)
    return h + d


def _tp_forward_local(params, tokens, cfg: ModelConfig, tp: int):
    b, s = tokens.shape
    h = jnp.take(params["embed"], tokens, axis=0).astype(jnp.bfloat16)
    cos, sin = rope_table(jnp.arange(s), cfg.head_dim, cfg.rope_theta,
                          cfg.rope_scaling)
    mask = causal_mask(s, s, cfg.sliding_window)
    for p in params["layers"]:
        h = _tp_decoder_layer(h, p, cfg, cos, sin, mask, tp)
    h = rmsnorm(h, params["final_ln"], cfg.rms_eps)
    return jnp.dot(h, params["lm_head"].T.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def sharded_quantized_forward(params: Params, cfg: ModelConfig,
                              tokens: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Full-sequence forward, DP over 'data' x TP over 'model'.

    The silu·mul epilogue under TP: gate/up rows are sharded in *permuted*
    (device-layout) row order, and all_gather(tiled) re-concatenates the
    shards exactly back into that global device-layout order, so the down
    site needs no extra gather — layout composes with sharding for free.
    """
    tp = mesh.shape["model"]
    assert not cfg.is_moe, "use parallel.moe_ep for Mixtral"
    tp_validate_config(cfg, tp)
    specs = quantized_param_specs(params)

    fn = functools.partial(_tp_forward_local, cfg=cfg, tp=tp)
    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(specs, P("data", None)),
        out_specs=P("data", None, None),
        check_vma=False,
    )
    return mapped(params, tokens)
