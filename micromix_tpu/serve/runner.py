"""Cache-aware model execution: prefill and batched decode steps.

The serving-side forward (the reference never wired its FlashInfer path
into the model; this is that missing e2e driver, done TPU-first):

  * prefill: full-sequence causal forward; K/V quantized and appended to
    the paged cache as a side effect; returns last-position logits
  * decode_step: one token for every active slot in one jitted program —
    quantized matmuls at M=batch, rope at per-slot positions, paged
    quantized-KV flash attention (serve/attention.py)

Both work on dense (bf16) and quantized parameter pytrees.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.common import (
    ModelConfig,
    QuantLinear,
    apply_rope,
    attention,
    causal_mask,
    project_all,
    rmsnorm,
    rope_table,
)
from ..ops.quantize_ops import silu_mul_quantize_x
from .attention import paged_decode_attention
from .kv_cache import PagedKVCache, append_kv, gather_kv

Params = Dict[str, Any]
Caches = List[PagedKVCache]


def _qkv(h, p, cfg):
    b, s, _ = h.shape
    stack = p.get("qkv_stack")
    lins = None if stack is not None else [p["q"], p["k"], p["v"]]
    q, k, v = project_all(h, p.get("attn_site"), lins,
                          p["ln1"], cfg.rms_eps, stack=stack)
    return (q.reshape(b, s, cfg.num_heads, cfg.head_dim),
            k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim),
            v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim))


def _mlp(h, p, cfg):
    from ..models.transformer import mlp_block, moe_block
    return moe_block(h, p, cfg) if cfg.is_moe else mlp_block(h, p, cfg)


def _o_proj(attn_out, p):
    (o,) = project_all(attn_out, p.get("o_site"), [p["o"]])
    return o


def prefill(params: Params, cfg: ModelConfig, caches: Caches,
            tokens: jnp.ndarray, seq_id: jnp.ndarray,
            start_pos: jnp.ndarray,
            last_idx: Optional[jnp.ndarray] = None, *,
            hist_len: int = 0) -> Tuple[jnp.ndarray, Caches]:
    """tokens (1, S) -> (logits at ``last_idx`` (1, V), updated caches).

    Appends the new K/V (quantized) for positions [start_pos, start_pos+S).
    ``last_idx`` selects the true last prompt position when tokens are
    right-padded to a length bucket (defaults to S-1).

    ``hist_len`` (static) enables CHUNKED prefill: the chunk additionally
    attends over the cached (quantized) positions before ``start_pos``.
    On TPU this runs the paged Pallas kernel
    (serve/prefill_attention.py), which reads quantized pages directly
    and derives the history length from start_pos at runtime — any
    truthy hist_len (the engine passes -1) compiles ONE program per
    chunk bucket.  On CPU the dense-gather reference path runs instead
    and needs the concrete hist_len (multiple of page_size; entries at
    or beyond start_pos are masked).  In-chunk attention stays exact
    bf16 either way; cross-chunk attention reads the quantized cache,
    matching what decode sees.
    """
    b, s = tokens.shape
    assert b == 1
    paged_hist = bool(hist_len) and jax.default_backend() != "cpu"
    h = jnp.take(params["embed"], tokens, axis=0).astype(jnp.bfloat16)
    positions = start_pos + jnp.arange(s)
    cos, sin = rope_table(positions, cfg.head_dim, cfg.rope_theta,
                          cfg.rope_scaling)
    mask = causal_mask(s, s, cfg.sliding_window)
    if hist_len and not paged_hist:
        qi = positions[:, None]                      # global query positions
        kj = jnp.arange(hist_len)[None, :]
        hist_allow = kj < start_pos
        if cfg.sliding_window is not None:
            hist_allow = jnp.logical_and(hist_allow,
                                         kj > qi - cfg.sliding_window)
        mask = jnp.concatenate(
            [jnp.broadcast_to(hist_allow, (s, hist_len)), mask], axis=1)
    new_caches = []
    seq_ids = jnp.full((s,), seq_id, jnp.int32)
    for p, cache in zip(params["layers"], caches):
        q, k, v = _qkv(h, p, cfg)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        cache = append_kv(cache, seq_ids, positions, k[0], v[0])
        new_caches.append(cache)
        if paged_hist:
            from .prefill_attention import paged_prefill_attention
            out = paged_prefill_attention(
                q[0], k[0], v[0], cache, seq_id, start_pos,
                sliding_window=cfg.sliding_window)[None]
        elif hist_len:
            kh, vh = gather_kv(cache, seq_id, hist_len)      # (hist, Hkv, D)
            k_full = jnp.concatenate([kh[None], k], axis=1)
            v_full = jnp.concatenate([vh[None], v], axis=1)
            out = attention(q, k_full, v_full, mask)
        elif jax.default_backend() != "cpu":
            from ..kernels.flash_attention import flash_attention
            out = flash_attention(q, k, v,
                                  sliding_window=cfg.sliding_window)
        else:
            out = attention(q, k, v, mask)
        out = out.reshape(b, s, -1)
        h = h + _o_proj(out, p)
        h = h + _mlp(h, p, cfg)
    if last_idx is None:
        last_idx = jnp.int32(s - 1)
    h_last = jax.lax.dynamic_slice_in_dim(h, last_idx, 1, axis=1)
    h_last = rmsnorm(h_last[:, 0], params["final_ln"], cfg.rms_eps)
    logits = jnp.dot(h_last, params["lm_head"].T.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return logits, new_caches


def prefill_batch(params: Params, cfg: ModelConfig, caches: Caches,
                  tokens: jnp.ndarray, seq_ids: jnp.ndarray,
                  last_idx: jnp.ndarray) -> Tuple[jnp.ndarray, Caches]:
    """Multi-slot FRESH prefill: tokens (B, S) -> (logits (B, V), caches).

    One dispatch prefills B waiting slots at once (VERDICT r1 item 7 —
    TTFT under concurrent arrivals was linear in queue depth with b==1
    prefill).  All rows start at position 0 (fresh prompts), so the RoPE
    tables and causal mask are shared; per-row true lengths are selected
    by ``last_idx``.  Padding rows use the engine's scratch seq id — their
    K/V land in the scratch page and their logits are discarded.
    """
    b, s = tokens.shape
    h = jnp.take(params["embed"], tokens, axis=0).astype(jnp.bfloat16)
    positions = jnp.arange(s)
    cos, sin = rope_table(positions, cfg.head_dim, cfg.rope_theta,
                          cfg.rope_scaling)
    mask = causal_mask(s, s, cfg.sliding_window)
    seq_flat = jnp.repeat(seq_ids, s)
    pos_flat = jnp.tile(positions, b)
    new_caches = []
    for p, cache in zip(params["layers"], caches):
        q, k, v = _qkv(h, p, cfg)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        cache = append_kv(cache, seq_flat, pos_flat,
                          k.reshape(b * s, cfg.num_kv_heads, cfg.head_dim),
                          v.reshape(b * s, cfg.num_kv_heads, cfg.head_dim))
        new_caches.append(cache)
        if jax.default_backend() != "cpu":
            from ..kernels.flash_attention import flash_attention
            out = flash_attention(q, k, v,
                                  sliding_window=cfg.sliding_window)
        else:
            out = attention(q, k, v, mask)
        out = out.reshape(b, s, -1)
        h = h + _o_proj(out, p)
        h = h + _mlp(h, p, cfg)
    h_last = jnp.take_along_axis(h, last_idx[:, None, None], axis=1)[:, 0]
    h_last = rmsnorm(h_last, params["final_ln"], cfg.rms_eps)
    logits = jnp.dot(h_last, params["lm_head"].T.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return logits, new_caches


def _can_pair(params: Params, cfg: ModelConfig, b: int) -> bool:
    """Static (trace-time) gate for the residual-pair decode path: every
    layer must carry ScaledW8 stacks + Benes-routable rms sites, the o
    and down projections ScaledW8, dense (non-MoE) architecture, decode-
    size batch, a TPU backend, and no MICROMIX_NO_PAIR ablation."""
    import os

    from ..kernels.fakequant import PALLAS_FAKEQUANT_MAX_M
    from ..mx.scaledw8 import ScaledW8, ScaledW8Stack
    if (cfg.is_moe or b > PALLAS_FAKEQUANT_MAX_M
            or jax.default_backend() == "cpu"
            or os.environ.get("MICROMIX_NO_PAIR")):
        return False

    def routable(site):
        return site is not None and (site.perm is None
                                     or site.benes is not None)

    for p in params["layers"]:
        if not (isinstance(p.get("qkv_stack"), ScaledW8Stack)
                and isinstance(p.get("gateup_stack"), ScaledW8Stack)
                and isinstance(p.get("o"), QuantLinear)
                and isinstance(p["o"].w, ScaledW8)
                and isinstance(p.get("down"), QuantLinear)
                and isinstance(p["down"].w, ScaledW8)
                and routable(p.get("attn_site"))
                and routable(p.get("mlp_site"))
                and routable(p.get("o_site"))
                and p["down_site"].perm is None
                and cfg.hidden_size % 512 == 0):
            return False
    return True


def _pair_o_gateup(out2d, h2d, p, cfg):
    """o_proj + residual + rms + gate/up in ONE call (h_mid, gate, up)."""
    from ..kernels.mixed_matmul import mixed_matmul_w8_pair
    site_o = p["o_site"]
    kw = {}
    if site_o.benes is not None:
        kw["benes_a"] = site_o.benes
    elif site_o.perm is not None:
        out2d = jnp.take(out2d, site_o.perm, axis=1)
    msite = p["mlp_site"]
    hm, (gate, up) = mixed_matmul_w8_pair(
        out2d, h2d, p["o"].w, p["gateup_stack"],
        gamma_b=p["ln2"].astype(jnp.float32), producer_a="plain",
        bias_a=p["o"].bias, benes_b=msite.benes, eps=cfg.rms_eps, **kw)
    bg, bu = p["gateup_stack"].biases
    if bg is not None:
        gate = gate + bg
    if bu is not None:
        up = up + bu
    return hm, gate, up


def _pair_down_qkv(gate, up, h2d, p, pn, cfg):
    """down_proj + residual + next layer's rms + q/k/v in ONE call."""
    from ..kernels.mixed_matmul import mixed_matmul_w8_pair
    hm, outs = mixed_matmul_w8_pair(
        gate, h2d, p["down"].w, pn["qkv_stack"],
        gamma_b=pn["ln1"].astype(jnp.float32), producer_a="silu",
        up_a=up, bias_a=p["down"].bias,
        benes_b=pn["attn_site"].benes, eps=cfg.rms_eps)
    outs = [o if bi is None else o + bi
            for o, bi in zip(outs, pn["qkv_stack"].biases)]
    return hm, outs


def decode_step(params: Params, cfg: ModelConfig, caches: Caches,
                tokens: jnp.ndarray, seq_ids: jnp.ndarray,
                positions: jnp.ndarray) -> Tuple[jnp.ndarray, Caches]:
    """tokens (B,) -> (logits (B, V), updated caches).  One step, B slots.

    When the engine's stacked ScaledW8 form allows it (_can_pair), the
    per-layer GEMM clusters run as residual-PAIR kernels — (o + residual
    + rms + gate|up) and (down + residual + next rms + q|k|v), 2 Pallas
    calls per layer instead of 4 — eliminating the per-call ramps and
    the XLA residual/rmsnorm fusion islands between them
    (kernels/mixed_matmul.mixed_matmul_w8_pair; the reference's analog
    launch amortization is its beta-chained GEMM sequence,
    mgemm/src/gemm.cu:26-78).
    """
    from ..models.common import rope_inv_freq
    b = tokens.shape[0]
    h = jnp.take(params["embed"], tokens, axis=0)[:, None, :].astype(
        jnp.bfloat16)
    cos = jnp.cos(_rope_angles(positions, cfg))
    sin = jnp.sin(_rope_angles(positions, cfg))
    inv = rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    new_caches = []
    layers = params["layers"]
    if _can_pair(params, cfg, b):
        hd, nh, nkv = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads
        h2d = h[:, 0]
        q3, k3, v3 = _qkv(h, layers[0], cfg)
        q2, k2, v2 = q3[:, 0], k3[:, 0], v3[:, 0]
        for li, (p, cache) in enumerate(zip(layers, caches)):
            kr = _rope1(k2, cos, sin)
            cache = append_kv(cache, seq_ids, positions, kr, v2,
                              distinct_pages=True)
            new_caches.append(cache)
            out = paged_decode_attention(q2, cache, seq_ids,
                                         sliding_window=cfg.sliding_window,
                                         rope_positions=positions,
                                         rope_inv_freq=inv)
            out2d = out.reshape(b, nh * hd)
            h2d, gate, up = _pair_o_gateup(out2d, h2d, p, cfg)
            if li + 1 < len(layers):
                h2d, (qf, kf, vf) = _pair_down_qkv(gate, up, h2d, p,
                                                   layers[li + 1], cfg)
                q2 = qf.reshape(b, nh, hd)
                k2 = kf.reshape(b, nkv, hd)
                v2 = vf.reshape(b, nkv, hd)
            else:
                from ..models.transformer import _down_proj_q
                h2d = h2d + _down_proj_q(gate, up, p["down_site"],
                                         p["down"])
        h = rmsnorm(h2d, params["final_ln"], cfg.rms_eps)
        logits = jnp.dot(h, params["lm_head"].T.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return logits, new_caches
    for p, cache in zip(layers, caches):
        q, k, v = _qkv(h, p, cfg)                       # (B,1,H,D)
        # k is rotated here (the cache stores post-RoPE K); q's rotation is
        # FUSED into the decode kernel (decode.cuh:40-104 parity) — and
        # skips the bf16 round the unfused path paid between rope and dot
        k = _rope1(k[:, 0], cos, sin)[:, None]
        cache = append_kv(cache, seq_ids, positions, k[:, 0], v[:, 0],
                          distinct_pages=True)
        new_caches.append(cache)
        out = paged_decode_attention(q[:, 0], cache, seq_ids,
                                     sliding_window=cfg.sliding_window,
                                     rope_positions=positions,
                                     rope_inv_freq=inv)
        out = out.reshape(b, 1, cfg.num_heads * cfg.head_dim)
        h = h + _o_proj(out, p)
        h = h + _mlp(h, p, cfg)
    h = rmsnorm(h[:, 0], params["final_ln"], cfg.rms_eps)
    logits = jnp.dot(h, params["lm_head"].T.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return logits, new_caches


def decode_multi(params: Params, cfg: ModelConfig, caches: Caches,
                 tokens: jnp.ndarray, seq_ids: jnp.ndarray,
                 positions: jnp.ndarray, key: jax.Array,
                 temps: jnp.ndarray, top_k: jnp.ndarray,
                 top_p: jnp.ndarray, controls=None, *, n_steps: int,
                 step_fn=None, sample_mode: str = "full",
                 with_logprobs: bool = False):
    """``n_steps`` decode+sample steps in ONE program (lax.scan).

    Amortizes host dispatch over a chunk of steps — on the axon tunnel a
    dispatch+fetch costs ~35 ms while one decode step is ~9 ms of device
    time, so chunking is a ~4x decode-throughput lever.  The engine
    pre-allocates KV pages for pos+n_steps and truncates emitted tokens
    host-side at eos/max_new_tokens (up to n_steps-1 speculative steps of
    waste per finishing sequence).

    ``controls`` (optional, its presence is a static program variant):
    (presence_bits (B, ceil(V/8)) u8 bit-packed, penalties (B,),
    ban_ids (B, W) int32 -1-padded, min_remaining (B,),
    minp_shift (B,)) — repetition penalty over context tokens (presence
    unpacked once, then updated in-scan as tokens are sampled),
    terminator suppression (eos_id + stop_ids) while fewer than
    min_remaining tokens have been emitted this chunk, and the min-p
    filter as a log-space threshold offset (-inf = off).

    ``with_logprobs`` (static) additionally returns the chosen tokens'
    RAW model log-probabilities (log_softmax of the un-tempered,
    un-penalized logits — the OpenAI-style definition), shape
    (n_steps, B) f32, between the tokens and the caches.

    Returns (sampled tokens (n_steps, B) int32[, logprobs], updated
    caches).
    """
    from .sampling import (apply_logit_controls, ban_mask, sample_batch,
                           unpack_presence)

    if step_fn is None:
        step_fn = decode_step
    b = tokens.shape[0]

    def chosen_lp(logits, nxt):
        lps = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return lps[jnp.arange(b), nxt]

    if controls is None:
        def step(carry, i):
            caches, toks, pos = carry
            logits, caches = step_fn(params, cfg, caches, toks, seq_ids,
                                     pos)
            nxt = sample_batch(logits, jax.random.fold_in(key, i),
                               temps, top_k, top_p, mode=sample_mode)
            out = (nxt, chosen_lp(logits, nxt)) if with_logprobs else nxt
            return (caches, nxt, pos + 1), out

        (caches, _, _), out = jax.lax.scan(
            step, (caches, tokens, positions),
            jnp.arange(n_steps, dtype=jnp.int32))
        if with_logprobs:
            return out[0], out[1], caches
        return out, caches

    presence_bits, penalties, ban_ids, min_remaining, mps = controls
    vocab = params["lm_head"].shape[0]
    presence0 = unpack_presence(presence_bits, vocab)
    banned = ban_mask(ban_ids, vocab)

    def step(carry, i):
        caches, toks, pos, presence = carry
        logits, caches = step_fn(params, cfg, caches, toks, seq_ids, pos)
        suppress = jnp.logical_and((i < min_remaining)[:, None], banned)
        lg = apply_logit_controls(logits, presence, penalties, suppress,
                                  minp_shift=mps)
        nxt = sample_batch(lg, jax.random.fold_in(key, i),
                           temps, top_k, top_p, mode=sample_mode)
        presence = presence.at[jnp.arange(b), nxt].set(True)
        out = (nxt, chosen_lp(logits, nxt)) if with_logprobs else nxt
        return (caches, nxt, pos + 1, presence), out

    (caches, _, _, _), out = jax.lax.scan(
        step, (caches, tokens, positions, presence0),
        jnp.arange(n_steps, dtype=jnp.int32))
    if with_logprobs:
        return out[0], out[1], caches
    return out, caches


def prefill_decode(params: Params, cfg: ModelConfig, caches: Caches,
                   ptokens: jnp.ndarray, pseq_id: jnp.ndarray,
                   pstart: jnp.ndarray, plast: jnp.ndarray,
                   ptrue_len: jnp.ndarray, ptemp: jnp.ndarray,
                   ptop_k: jnp.ndarray, ptop_p: jnp.ndarray,
                   dtokens: jnp.ndarray, dseq_ids: jnp.ndarray,
                   dpositions: jnp.ndarray, key: jax.Array,
                   temps: jnp.ndarray, top_k: jnp.ndarray,
                   top_p: jnp.ndarray, *, hist_len: int, n_steps: int,
                   sample_mode: str = "full"
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, Caches]:
    """PIGGYBACKED step: one slot's prefill chunk + a decode chunk for the
    other slots in ONE program.

    On the axon tunnel every dispatch+fetch costs ~35 ms; under mixed load
    the engine previously paid three per step (prefill chunk, true-length
    fixup, decode chunk).  This folds all three — plus the prefill slot's
    first-token sample — into the decode dispatch.  The prefill slot and
    the decode slots are distinct sequences (the engine points mid-prefill
    slots at the scratch row in ``dseq_ids``), so ordering within the
    program does not change numerics vs the separate dispatches.

    Returns (prefill first-token (1,) int32, decode tokens (n_steps, B),
    updated caches).
    """
    import dataclasses as _dc

    from .sampling import sample_batch

    plogits, caches = prefill(params, cfg, caches, ptokens, pseq_id,
                              pstart, plast, hist_len=hist_len)
    # bucket padding over-wrote lengths; restore the true count in-graph
    caches = [_dc.replace(c, lengths=c.lengths.at[pseq_id].set(ptrue_len))
              for c in caches]
    # fold value n_steps is disjoint from the decode scan's 0..n_steps-1
    ptok = sample_batch(plogits, jax.random.fold_in(key, n_steps),
                        ptemp, ptop_k, ptop_p, mode=sample_mode)
    dtoks, caches = decode_multi(params, cfg, caches, dtokens, dseq_ids,
                                 dpositions, key, temps, top_k, top_p,
                                 n_steps=n_steps, sample_mode=sample_mode)
    return ptok, dtoks, caches


def _rope_angles(positions: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    from ..models.common import rope_inv_freq
    inv = rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    freqs = positions.astype(jnp.float32)[:, None] * inv[None, :]
    return jnp.concatenate([freqs, freqs], axis=-1)      # (B, D)


def _rope1(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x (B, H, D) with per-batch angle tables (B, D)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos[:, None, :]
            + rot.astype(jnp.float32) * sin[:, None, :]).astype(x.dtype)


def verify_block(params: Params, cfg: ModelConfig, caches: Caches,
                 tokens: jnp.ndarray, seq_ids: jnp.ndarray,
                 positions: jnp.ndarray) -> Tuple[jnp.ndarray, Caches]:
    """Speculative-verify forward: tokens (B, S) starting at per-slot
    ``positions`` -> (logits (B, S, V) f32, updated caches).

    Scores all S proposed tokens of every slot in ONE dispatch.  TPU-first
    trick: rather than a separate short-prefill attention, the S positions
    of a slot run as S independent ROWS of the paged decode kernel, each
    causally clamped to its own position via the per-row ``lengths``
    override — all K/V (including the in-block tokens, appended first) is
    read from the quantized cache, exactly matching what plain decode
    would have seen, and the matmuls run at M=B*S where the MXU is more
    efficient than at decode M=B.  Equivalent role to target scoring in
    speculative decoding (Leviathan et al.); the reference has no analog.
    """
    from ..models.common import rope_inv_freq
    b, s = tokens.shape
    h = jnp.take(params["embed"], tokens, axis=0).astype(jnp.bfloat16)
    pos = positions[:, None] + jnp.arange(s, dtype=jnp.int32)[None]  # (B,S)
    flat_pos = pos.reshape(-1)
    flat_seq = jnp.repeat(seq_ids, s)
    cos = jnp.cos(_rope_angles(flat_pos, cfg))
    sin = jnp.sin(_rope_angles(flat_pos, cfg))
    inv = rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    new_caches = []
    for p, cache in zip(params["layers"], caches):
        q, k, v = _qkv(h, p, cfg)                     # (B, S, Hn/Hkv, D)
        k = _rope1(k.reshape(b * s, cfg.num_kv_heads, cfg.head_dim),
                   cos, sin)
        cache = append_kv(cache, flat_seq, flat_pos, k,
                          v.reshape(b * s, cfg.num_kv_heads, cfg.head_dim))
        new_caches.append(cache)
        out = paged_decode_attention(
            q.reshape(b * s, cfg.num_heads, cfg.head_dim),
            cache, flat_seq,
            sliding_window=cfg.sliding_window,
            rope_positions=flat_pos, rope_inv_freq=inv,
            lengths=flat_pos + 1)
        out = out.reshape(b, s, cfg.num_heads * cfg.head_dim)
        h = h + _o_proj(out, p)
        h = h + _mlp(h, p, cfg)
    h = rmsnorm(h, params["final_ln"], cfg.rms_eps)
    logits = jnp.dot(h, params["lm_head"].T.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return logits, new_caches
