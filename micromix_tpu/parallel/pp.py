"""Pipeline-parallel forward: layer stages + microbatch streaming.

The reference's only multi-device mode is degenerate pipelining — static
layer placement with one GPU active at a time (model/parallel_utils.py:
89-163, SURVEY §2.5).  This is the real thing, TPU-style: layers are
stage-sharded over a "stage" mesh axis, microbatches stream through a GPipe
schedule inside ONE jitted SPMD program, and stage handoffs are
``lax.ppermute`` hops over ICI — all stages compute concurrently after
warm-up (n_stages - 1 bubble ticks out of n_micro + n_stages - 1).

Implementation shape: every device runs the same tick loop; at tick t,
stage s works on microbatch t - s (stage 0 embeds microbatch t, the last
stage records its finished activations).  Per-layer params are stacked so
each stage holds a (layers_per_stage, ...) slice; works for dense pytrees
and uniformly-calibrated quantized pytrees (stacking needs identical
segment budgets across layers).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.common import ModelConfig, causal_mask, rmsnorm, rope_table
from ..models.transformer import Params, decoder_layer


def make_pp_mesh(n_stages: int, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) >= n_stages, (len(devices), n_stages)
    return Mesh(np.array(devices[:n_stages]), ("stage",))


def stack_layers(layers: List[Dict[str, Any]]):
    """[layer pytree] x L -> one pytree with a leading L axis per leaf.

    Requires homogeneous layer structure (identical treedefs and leaf
    shapes — i.e. uniform per-layer quantization budgets).
    """
    treedefs = {jax.tree_util.tree_structure(l) for l in layers}
    assert len(treedefs) == 1, "layers must be structurally identical to stack"
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def _pp_local(layers_local, embed, tokens_mb, *, cfg: ModelConfig,
              n_stages: int, use_flash: bool):
    """Per-device body.  layers_local: (L/stages, ...) stacked params slice;
    tokens_mb (n_micro, mb, S) replicated."""
    sid = jax.lax.axis_index("stage")
    n_micro, mb, s = tokens_mb.shape
    l_per_stage = jax.tree_util.tree_leaves(layers_local)[0].shape[0]
    cos, sin = rope_table(jnp.arange(s), cfg.head_dim, cfg.rope_theta,
                          cfg.rope_scaling)
    mask = causal_mask(s, s, cfg.sliding_window)

    def apply_stage(h):
        # lax.scan, not fori_loop + manual tree indexing: scan's stacked-
        # param slicing reproduces the unrolled per-layer computation
        # bit-for-bit on CPU, while fori's dynamic-slice operands compile
        # to a different (validly-rounded but non-identical) GEMM path —
        # measured 0.58 hidden-state drift after 2 quantized layers.
        def body(h, p):
            return decoder_layer(h, p, cfg, cos, sin, mask, None,
                                 use_flash=use_flash), None
        h, _ = jax.lax.scan(body, h, layers_local)
        return h

    fwd = [(i, i + 1) for i in range(n_stages - 1)]
    h0 = jnp.zeros((mb, s, cfg.hidden_size), jnp.bfloat16)
    outs0 = jnp.zeros((n_micro, mb, s, cfg.hidden_size), jnp.bfloat16)

    def tick(carry, t):
        h_prev, outs = carry
        h_recv = jax.lax.ppermute(h_prev, "stage", fwd)
        # stage 0 embeds microbatch t; everyone else takes the handoff
        tok = jax.lax.dynamic_index_in_dim(
            tokens_mb, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False)
        h_embed = jnp.take(embed, tok, axis=0).astype(jnp.bfloat16)
        h_in = jnp.where(sid == 0, h_embed, h_recv)
        h_out = apply_stage(h_in)
        # last stage records microbatch t - (n_stages - 1) when in range
        mb_idx = t - (n_stages - 1)
        valid = jnp.logical_and(mb_idx >= 0, sid == n_stages - 1)
        idx = jnp.clip(mb_idx, 0, n_micro - 1)
        cur = jax.lax.dynamic_index_in_dim(outs, idx, 0, keepdims=False)
        outs = jax.lax.dynamic_update_index_in_dim(
            outs, jnp.where(valid, h_out, cur), idx, 0)
        return (h_out, outs), None

    (_, outs), _ = jax.lax.scan(
        tick, (h0, outs0),
        jnp.arange(n_micro + n_stages - 1, dtype=jnp.int32))
    return outs[None]  # leading "stage" axis for out_specs


def pipeline_parallel_forward(params: Params, cfg: ModelConfig,
                              tokens: jnp.ndarray, mesh: Mesh, *,
                              n_micro: int = 2,
                              use_flash: Optional[bool] = None
                              ) -> jnp.ndarray:
    """tokens (B, S), B % n_micro == 0 -> logits (B, S, V).

    ``mesh`` must have a "stage" axis dividing cfg.num_layers.
    """
    n_stages = mesh.shape["stage"]
    assert cfg.num_layers % n_stages == 0, (cfg.num_layers, n_stages)
    b, s = tokens.shape
    assert b % n_micro == 0, (b, n_micro)
    mb = b // n_micro
    if use_flash is None:
        use_flash = jax.default_backend() != "cpu"

    stacked = stack_layers(params["layers"])
    tokens_mb = tokens.reshape(n_micro, mb, s)

    fn = jax.shard_map(
        functools.partial(_pp_local, cfg=cfg, n_stages=n_stages,
                          use_flash=use_flash),
        mesh=mesh,
        in_specs=(P("stage"), P(), P()),
        out_specs=P("stage"),
        check_vma=False,
    )
    outs = jax.jit(fn)(stacked, params["embed"], tokens_mb)
    h = outs[-1].reshape(b, s, cfg.hidden_size)       # last stage's results
    h = rmsnorm(h, params["final_ln"], cfg.rms_eps)
    return jnp.dot(h, params["lm_head"].T.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


__all__ = ["pipeline_parallel_forward", "make_pp_mesh", "stack_layers"]
