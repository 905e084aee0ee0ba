"""Sequence-parallel (context-parallel) prefill forward.

Net-new vs the reference (SURVEY §2.5/§5: no sequence parallelism; seqlen
fixed at 2048).  Long-context prefill shards the SEQUENCE axis over the
mesh's "seq" axis:

  * embeddings, norms, every linear (dense or MX-quantized) and the MLP are
    token-local -> zero communication; each device runs the same fused
    quantize + segmented-matmul kernels on its S/sp slice
  * attention all-gathers K/V over "seq" (GQA keeps them small: Hkv*D per
    token) and computes the local-Q x global-KV block with a causal mask
    offset by the shard's global position — one all-gather per layer, no
    score-matrix resharding

This is the gather-KV variant of context parallelism (ring attention is a
latency refinement, not a capability change).  Works for dense and
quantized parameter pytrees; the Pallas kernels run unchanged inside
shard_map on local shards.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.common import (
    ModelConfig, attention, causal_mask, rmsnorm, rope_table)
from ..models.transformer import Params, mlp_block, moe_block
from ..models.transformer import attention_block as _attn_block_full


def _sp_decoder_layer(h, p, cfg: ModelConfig, cos, sin, mask):
    """One decoder layer on a local S-shard; K/V gathered over "seq"."""
    from ..models.transformer import _is_quant  # local import to avoid cycle
    from ..models.common import apply_rope, project_all

    b, s_loc, _ = h.shape
    hd, nh, nkv = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads
    q, k, v = project_all(h, p.get("attn_site"), [p["q"], p["k"], p["v"]],
                          p["ln1"], cfg.rms_eps)
    q = q.reshape(b, s_loc, nh, hd)
    k = k.reshape(b, s_loc, nkv, hd)
    v = v.reshape(b, s_loc, nkv, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    # gather K/V to full sequence; Q stays local
    k_full = jax.lax.all_gather(k, "seq", axis=1, tiled=True)
    v_full = jax.lax.all_gather(v, "seq", axis=1, tiled=True)
    out = attention(q, k_full, v_full, mask).reshape(b, s_loc, nh * hd)
    (o,) = project_all(out, p.get("o_site"), [p["o"]])
    h = h + o
    if cfg.is_moe:
        h = h + moe_block(h, p, cfg)
    else:
        h = h + mlp_block(h, p, cfg)
    return h


def sp_forward_local(params: Params, tokens_local: jnp.ndarray, *,
                     cfg: ModelConfig, s_global: int) -> jnp.ndarray:
    """Body run per device inside shard_map.  tokens_local (B, S/sp)."""
    b, s_loc = tokens_local.shape
    idx = jax.lax.axis_index("seq")
    offset = idx * s_loc
    h = jnp.take(params["embed"], tokens_local, axis=0).astype(jnp.bfloat16)
    positions = offset + jnp.arange(s_loc)
    cos, sin = rope_table(positions, cfg.head_dim, cfg.rope_theta,
                          cfg.rope_scaling)
    # local-Q rows attend over the full gathered K/V with global offsets
    mask = causal_mask(s_loc, s_global, cfg.sliding_window, offset=offset)
    for p in params["layers"]:
        h = _sp_decoder_layer(h, p, cfg, cos, sin, mask)
    h = rmsnorm(h, params["final_ln"], cfg.rms_eps)
    return jnp.dot(h, params["lm_head"].T.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def sequence_parallel_forward(params: Params, cfg: ModelConfig,
                              tokens: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """tokens (B, S) with S % mesh["seq"] == 0 -> logits (B, S, V)."""
    sp = mesh.shape["seq"]
    b, s = tokens.shape
    assert s % sp == 0, (s, sp)

    fn = jax.shard_map(
        functools.partial(sp_forward_local, cfg=cfg, s_global=s),
        mesh=mesh,
        in_specs=(P(), P(None, "seq")),
        out_specs=P(None, "seq", None),
        check_vma=False,
    )
    return jax.jit(fn)(params, tokens)


__all__ = ["sequence_parallel_forward", "sp_forward_local"]
