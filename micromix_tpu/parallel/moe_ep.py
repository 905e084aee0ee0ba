"""Expert parallelism for Mixtral over the "expert" mesh axis.

The dense-dispatch MoE form (models/transformer.py moe_block) makes EP a
one-liner: stack the experts into (E, ...) arrays sharded on dim 0; each
device computes its local experts on replicated tokens weighted by the
(sparse) routing matrix, and a single psum over "expert" combines them.
No token all-to-all, static shapes, and the routing softmax/top-k is
computed redundantly per device (it is tiny).

The reference iterates experts serially on one device
(qMixtralLayer.py:437-450) — EP is net-new capability per the north star.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.common import DenseLinear, ModelConfig, rmsnorm


def stack_dense_experts(experts: List[Dict[str, DenseLinear]]):
    """[{w1,w3,w2}] -> dict of stacked (E, n, k) bf16 arrays."""
    def stack(name):
        return jnp.stack([ep[name].w for ep in experts])
    return {"w1": stack("w1"), "w3": stack("w3"), "w2": stack("w2")}


def ep_moe_ffn_local(xn: jnp.ndarray, stacked, weights: jnp.ndarray,
                     e_offset: jnp.ndarray) -> jnp.ndarray:
    """Local experts (El, ...) on all tokens; returns partial sum (T, K)."""
    el = stacked["w1"].shape[0]
    out = jnp.zeros((xn.shape[0], stacked["w2"].shape[1]), jnp.float32)
    for i in range(el):
        g = jnp.dot(xn, stacked["w1"][i].T, preferred_element_type=jnp.float32)
        u = jnp.dot(xn, stacked["w3"][i].T, preferred_element_type=jnp.float32)
        act = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
        y = jnp.dot(act, stacked["w2"][i].T,
                    preferred_element_type=jnp.float32)
        out = out + y * weights[:, e_offset + i][:, None]
    return out


def ep_moe_forward(x: jnp.ndarray, ln2: jnp.ndarray, router: DenseLinear,
                   stacked, cfg: ModelConfig, mesh: Mesh) -> jnp.ndarray:
    """One MoE FFN sub-block, experts sharded over 'expert'.  x: (T, K)."""
    ep = mesh.shape["expert"]
    assert cfg.num_experts % ep == 0

    def local(x, ln2, router_w, w1, w3, w2):
        xn = rmsnorm(x, ln2, cfg.rms_eps)
        logits = jnp.dot(xn, router_w.T, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        top_w, top_i = jax.lax.top_k(probs, cfg.num_experts_per_tok)
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
        weights = jnp.einsum(
            "tk,tke->te", top_w,
            jax.nn.one_hot(top_i, cfg.num_experts, dtype=probs.dtype))
        e_off = jax.lax.axis_index("expert") * (cfg.num_experts // ep)
        part = ep_moe_ffn_local(xn, {"w1": w1, "w3": w3, "w2": w2},
                                weights, e_off)
        return jax.lax.psum(part, "expert").astype(jnp.bfloat16)

    mapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P("expert", None, None),
                  P("expert", None, None), P("expert", None, None)),
        out_specs=P(),
        check_vma=False,
    )
    return mapped(x, ln2, router.w, stacked["w1"], stacked["w3"],
                  stacked["w2"])


# ---------------------------------------------------------------------------
# Quantized expert parallelism (north-star config 5: expert-sharded
# MX-quantized Mixtral).  Requires uniform per-expert segment budgets so the
# packed arrays stack into (E, ...) and shard on dim 0.
# ---------------------------------------------------------------------------


def stack_quant_experts(experts: List[Dict[str, Any]]):
    """[{site_in, site_down, w1, w3, w2}] (quantized) -> stacked pytree."""
    def stack_lin(name):
        return jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[ep[name] for ep in experts])

    s_in = experts[0]["site_in"]
    s_dn = experts[0]["site_down"]
    for ep in experts:
        assert ep["site_in"].splits == s_in.splits, "uniform budgets required"
        assert ep["site_down"].splits == s_dn.splits
    return {
        "w1": stack_lin("w1"), "w3": stack_lin("w3"), "w2": stack_lin("w2"),
        "perm_in": jnp.stack([ep["site_in"].perm for ep in experts]),
        "splits_in": s_in.splits,     # static
        "splits_down": s_dn.splits,   # static
    }


def ep_moe_forward_quant(x: jnp.ndarray, ln2: jnp.ndarray,
                         router: DenseLinear, stacked, cfg: ModelConfig,
                         mesh: Mesh) -> jnp.ndarray:
    """Quantized MoE FFN sub-block, experts sharded over 'expert'.

    Mirrors moe_block's quantized path (models/transformer.py) per local
    expert: reorder+quantize the normed tokens with the expert's own site,
    two segmented matmuls, fused silu·mul quantize, down matmul, weighted
    f32 accumulate — then one psum over 'expert'.
    """
    from ..ops.quantize_ops import reorder_quantize_x, silu_mul_quantize_x

    ep = mesh.shape["expert"]
    assert cfg.num_experts % ep == 0
    splits_in = stacked["splits_in"]
    splits_down = stacked["splits_down"]

    def local(x, ln2, router_w, perm_in, w1, w3, w2):
        el = perm_in.shape[0]
        xn = rmsnorm(x, ln2, cfg.rms_eps)
        logits = jnp.dot(xn, router_w.T, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        top_w, top_i = jax.lax.top_k(probs, cfg.num_experts_per_tok)
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
        weights = jnp.einsum(
            "tk,tke->te", top_w,
            jax.nn.one_hot(top_i, cfg.num_experts, dtype=probs.dtype))
        e_off = jax.lax.axis_index("expert") * el

        def expert_ffn(i, qa):
            lin = lambda t: jax.tree.map(lambda a: a[i], t)
            g = lin(w1)(qa)
            u = lin(w3)(qa)
            dq = silu_mul_quantize_x(g, u, *splits_down)
            return lin(w2)(dq)

        if cfg.moe_capacity_factor is not None:
            # fixed-capacity dispatch (models/transformer.capacity_dispatch):
            # the routing table is replicated, so every device selects the
            # SAME slots; each gathers/computes only its local experts' rows
            from ..models.transformer import capacity_dispatch, moe_capacity
            cap = moe_capacity(cfg, xn.shape[0])
            idx, gate = capacity_dispatch(weights, cap)
            xn_pad = jnp.concatenate(
                [xn, jnp.zeros((1, xn.shape[-1]), xn.dtype)], axis=0)
            out = jnp.zeros((xn.shape[0] + 1, x.shape[-1]), jnp.float32)
            for i in range(el):
                rows = jax.lax.dynamic_index_in_dim(idx, e_off + i, 0,
                                                    keepdims=False)
                gates = jax.lax.dynamic_index_in_dim(gate, e_off + i, 0,
                                                     keepdims=False)
                qa = reorder_quantize_x(xn_pad[rows], perm_in[i], *splits_in)
                ye = expert_ffn(i, qa)
                out = out.at[rows].add(
                    ye.astype(jnp.float32) * gates[:, None])
            return jax.lax.psum(out[:-1], "expert").astype(jnp.bfloat16)
        out = jnp.zeros((xn.shape[0], x.shape[-1]), jnp.float32)
        for i in range(el):
            qa = reorder_quantize_x(xn, perm_in[i], *splits_in)
            ye = expert_ffn(i, qa)
            out = out + ye.astype(jnp.float32) * weights[:, e_off + i][:, None]
        return jax.lax.psum(out, "expert").astype(jnp.bfloat16)

    mapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P("expert"), P("expert"), P("expert"),
                  P("expert")),
        out_specs=P(),
        check_vma=False,
    )
    return mapped(x, ln2, router.w, stacked["perm_in"],
                  stacked["w1"], stacked["w3"], stacked["w2"])


# ---------------------------------------------------------------------------
# Heterogeneous-budget expert parallelism (models/hetero.py representation):
# per-expert budgets are DATA (FakeQuantSite arrays + canonical ScaledW8
# codes), so experts with different (k4, k6, k8) stack and shard — the
# segmented form above requires uniform budgets.
# ---------------------------------------------------------------------------


def stack_hetero_experts(experts: List[Dict[str, Any]]):
    """[quantize_expert_hetero outputs] -> one (E, ...)-leading pytree.

    Leaf shapes are budget-independent by construction, so any per-expert
    budget mix stacks; statics (ScaledW8 k4 = K) are uniform too.
    """
    return jax.tree.map(lambda *xs: jnp.stack(xs), *experts)


def ep_moe_forward_hetero(x: jnp.ndarray, ln2: jnp.ndarray,
                          router: DenseLinear, stacked, cfg: ModelConfig,
                          mesh: Mesh) -> jnp.ndarray:
    """Hetero-budget MoE FFN sub-block, experts sharded over 'expert'.

    Same structure as ep_moe_forward_quant; quantization runs as
    fakequant straight to the bf16 grid image per expert (what the
    canonical ScaledW8 matmul consumes), selecting each 32-block's format
    from the expert's own block_fmt data.
    """
    from ..models.hetero import fakequant_site

    ep = mesh.shape["expert"]
    assert cfg.num_experts % ep == 0

    def local(x, ln2, router_w, experts):
        el = experts["site_in"].block_fmt.shape[0]
        xn = rmsnorm(x, ln2, cfg.rms_eps)
        logits = jnp.dot(xn, router_w.T, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        top_w, top_i = jax.lax.top_k(probs, cfg.num_experts_per_tok)
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
        weights = jnp.einsum(
            "tk,tke->te", top_w,
            jax.nn.one_hot(top_i, cfg.num_experts, dtype=probs.dtype))
        e_off = jax.lax.axis_index("expert") * el

        def expert_ffn(i, xg):
            exp = jax.tree.map(lambda a: a[i], experts)
            qa = fakequant_site(xg, exp["site_in"])
            g = exp["w1"](qa)
            u = exp["w3"](qa)
            act = (jax.nn.silu(g.astype(jnp.float32))
                   * u.astype(jnp.float32))
            return exp["w2"](fakequant_site(act, exp["site_down"]))

        if cfg.moe_capacity_factor is not None:
            from ..models.transformer import capacity_dispatch, moe_capacity
            cap = moe_capacity(cfg, xn.shape[0])
            idx, gate = capacity_dispatch(weights, cap)
            xn_pad = jnp.concatenate(
                [xn, jnp.zeros((1, xn.shape[-1]), xn.dtype)], axis=0)
            out = jnp.zeros((xn.shape[0] + 1, x.shape[-1]), jnp.float32)
            for i in range(el):
                rows = jax.lax.dynamic_index_in_dim(idx, e_off + i, 0,
                                                    keepdims=False)
                gates = jax.lax.dynamic_index_in_dim(gate, e_off + i, 0,
                                                     keepdims=False)
                ye = expert_ffn(i, xn_pad[rows])
                out = out.at[rows].add(
                    ye.astype(jnp.float32) * gates[:, None])
            return jax.lax.psum(out[:-1], "expert").astype(jnp.bfloat16)
        out = jnp.zeros((xn.shape[0], x.shape[-1]), jnp.float32)
        for i in range(el):
            ye = expert_ffn(i, xn)
            out = out + ye.astype(jnp.float32) * weights[:, e_off + i][:, None]
        return jax.lax.psum(out, "expert").astype(jnp.bfloat16)

    mapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P("expert")),
        out_specs=P(),
        check_vma=False,
    )
    return mapped(x, ln2, router.w, stacked)
