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

Three attention variants:

  * gather-KV (default): one all-gather of K/V over "seq" per layer, then
    local-Q x global-KV with an offset causal mask — simplest, memory
    O(S_global) per device for one layer's K/V.
  * RING attention (``ring=True``): K/V shards rotate around the ring via
    ``lax.ppermute`` while each device folds incoming blocks into a flash
    online-softmax state — peak K/V memory O(S/sp) and the permute of
    step i+1 overlaps the block math of step i (XLA async collectives).
    Fully-masked blocks (future shards under causality) are skipped
    arithmetically via the mask, costing only their ring hop.
  * ULYSSES (``attn="ulysses"``, DeepSpeed-Ulysses-style): one all-to-all
    swaps the sequence sharding for HEAD sharding — each device computes
    exact full-sequence attention on H/sp heads, then a second all-to-all
    swaps back.  Two collectives/layer moving O(S/sp · H · D) each (they
    ride ICI), no per-step recurrence, and the score matrix stays one
    attention call — the TPU-friendly choice when H % sp == 0.

Works for dense and quantized parameter pytrees; the Pallas kernels run
unchanged inside shard_map on local shards.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.common import (
    ModelConfig, attention, causal_mask, rmsnorm, rope_table)
from ..models.transformer import Params, mlp_block, moe_block
from ..models.transformer import attention_block as _attn_block_full


def _ring_attention(q, k, v, *, offset, sp: int,
                    window) -> jnp.ndarray:
    """Blockwise ring attention.  q/k/v (B, s_loc, H|Hkv, D) local shards.

    Device d starts holding K/V shard d; at ring step i it processes shard
    (d - i) mod sp and forwards its block to d+1.  Each block folds into
    the flash max/denominator recurrence, so the result equals causal
    attention over the full sequence up to f32 recurrence rounding.
    """
    b, s_loc, h, d = q.shape
    hkv = k.shape[2]
    rep = h // hkv
    my = jax.lax.axis_index("seq")
    fwd = [(j, (j + 1) % sp) for j in range(sp)]
    scale = 1.0 / (d ** 0.5)
    qf = q.astype(jnp.float32) * scale

    m = jnp.full((b, h, s_loc), -1e30, jnp.float32)
    den = jnp.zeros((b, h, s_loc), jnp.float32)
    acc = jnp.zeros((b, h, s_loc, d), jnp.float32)
    k_blk, v_blk = k, v
    qi = offset + jnp.arange(s_loc)[:, None]
    for i in range(sp):
        src = (my - i) % sp
        kr = k_blk.astype(jnp.float32)
        vr = v_blk.astype(jnp.float32)
        if rep > 1:
            kr = jnp.repeat(kr, rep, axis=2)
            vr = jnp.repeat(vr, rep, axis=2)
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, kr)
        kj = src * s_loc + jnp.arange(s_loc)[None, :]
        allow = kj <= qi
        if window is not None:
            allow = jnp.logical_and(allow, kj > qi - window)
        s = jnp.where(allow[None, None], s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        corr = jnp.exp(m - m_new)
        e = jnp.exp(s - m_new[..., None])
        den = den * corr + jnp.sum(e, axis=-1)
        pv = jnp.einsum("bhqk,bkhd->bhqd", e, vr)
        acc = acc * corr[..., None] + pv
        m = m_new
        if i + 1 < sp:  # overlap: next hop issues while this block computes
            k_blk = jax.lax.ppermute(k_blk, "seq", fwd)
            v_blk = jax.lax.ppermute(v_blk, "seq", fwd)
    out = acc / jnp.maximum(den, 1e-30)[..., None]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)   # (B, s_loc, H, D)


def _ulysses_attention(q, k, v, *, sp: int, window) -> jnp.ndarray:
    """All-to-all sequence parallelism (DeepSpeed-Ulysses style).

    q/k/v (B, S/sp, H|Hkv, D) seq-local in, (B, S/sp, H, D) seq-local
    out.  One all-to-all turns seq-sharding into head-sharding (each
    device sees the FULL sequence for H/sp heads — attention is exact,
    no recurrence), a second turns it back.  Needs H and Hkv divisible
    by sp (GQA: shard KV heads too; the repeat happens inside
    attention()).
    """
    b, s_loc, h, d = q.shape
    hkv = k.shape[2]
    assert h % sp == 0 and hkv % sp == 0, (h, hkv, sp)
    a2a = functools.partial(jax.lax.all_to_all, axis_name="seq",
                            tiled=True)
    qg = a2a(q, split_axis=2, concat_axis=1)        # (B, S, H/sp, D)
    kg = a2a(k, split_axis=2, concat_axis=1)        # (B, S, Hkv/sp, D)
    vg = a2a(v, split_axis=2, concat_axis=1)
    s_global = s_loc * sp
    mask = causal_mask(s_global, s_global, window)
    out = attention(qg, kg, vg, mask)               # (B, S, H/sp, D)
    out = out.reshape(b, s_global, h // sp, d)
    return a2a(out, split_axis=1, concat_axis=2)    # (B, S/sp, H, D)


def _sp_decoder_layer(h, p, cfg: ModelConfig, cos, sin, mask, *,
                      attn: str = "gather", sp: int = 1, offset=None):
    """One decoder layer on a local S-shard; attention per ``attn``:
    "gather" (all-gather K/V), "ring" (ppermute recurrence), or
    "ulysses" (all-to-all head swap)."""
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
    if attn == "ring":
        out = _ring_attention(q, k, v, offset=offset, sp=sp,
                              window=cfg.sliding_window)
        out = out.reshape(b, s_loc, nh * hd)
    elif attn == "ulysses":
        out = _ulysses_attention(q, k, v, sp=sp,
                                 window=cfg.sliding_window)
        out = out.reshape(b, s_loc, nh * hd)
    else:
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
                     cfg: ModelConfig, s_global: int,
                     attn: str = "gather", sp: int = 1) -> jnp.ndarray:
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
        h = _sp_decoder_layer(h, p, cfg, cos, sin, mask, attn=attn, sp=sp,
                              offset=offset)
    h = rmsnorm(h, params["final_ln"], cfg.rms_eps)
    return jnp.dot(h, params["lm_head"].T.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def sequence_parallel_forward(params: Params, cfg: ModelConfig,
                              tokens: jnp.ndarray, mesh: Mesh, *,
                              ring: bool = False,
                              attn: Optional[str] = None) -> jnp.ndarray:
    """tokens (B, S) with S % mesh["seq"] == 0 -> logits (B, S, V).

    ``attn`` picks the attention variant: "gather" (default), "ring"
    (O(S/sp) peak K/V memory per device, ppermute pipeline), or
    "ulysses" (all-to-all head swap, exact full-sequence attention on
    H/sp heads per device).  ``ring=True`` is kept as an alias for
    attn="ring".
    """
    sp = mesh.shape["seq"]
    b, s = tokens.shape
    assert s % sp == 0, (s, sp)
    variant = attn or ("ring" if ring else "gather")
    assert variant in ("gather", "ring", "ulysses"), variant

    fn = jax.shard_map(
        functools.partial(sp_forward_local, cfg=cfg, s_global=s,
                          attn=variant, sp=sp),
        mesh=mesh,
        in_specs=(P(), P(None, "seq")),
        out_specs=P(None, "seq", None),
        check_vma=False,
    )
    return jax.jit(fn)(params, tokens)


__all__ = ["sequence_parallel_forward", "sp_forward_local"]
