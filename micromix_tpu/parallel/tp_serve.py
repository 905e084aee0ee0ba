"""Multi-chip (TP-sharded) serving: sharded KV cache + shard-mapped steps.

North-star config 4/5 (BASELINE.md): continuous-batched serving with the
KV cache and weights tensor-sharded over the mesh's "model" axis.  Builds
on TP v2 weights (tp_quant.py: q/k/v/gate/up row-sharded, o/down K-sharded
with shard-local quantization) and shards the paged KV cache over KV HEADS,
so the Pallas decode-attention kernel runs unchanged on each device's local
head slice — attention is embarrassingly parallel over heads; the only
per-layer collectives are the two psums of the row-parallel projections.

``make_tp_engine`` returns a serve.Engine whose jitted prefill / decode /
chunked-decode steps are shard_map'd over the mesh; the engine's host-side
scheduling (slots, page tables, preemption, sampling bookkeeping) is
unchanged — page tables and lengths are replicated, KV pages sharded.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels.mixed_matmul import mixed_matmul
from ..models.common import (
    ModelConfig, apply_rope, attention, causal_mask, rmsnorm, rope_table)
from ..ops.quantize_ops import (
    activation_quantize, reorder_quantize_x, rmsnorm_quantize_x)
from ..serve.attention import paged_decode_attention
from ..serve.sampling import SAMPLE_MODES
from ..serve.kv_cache import PagedKVCache, append_kv
from ..serve.runner import _rope1, _rope_angles, decode_multi
from .tp_quant import param_specs_tp

Params = Dict[str, Any]


def _cache_spec(cache: PagedKVCache) -> PagedKVCache:
    """PartitionSpec pytree: pages shard over KV heads on 'model'."""
    kv = P(None, "model", None, None)
    return PagedKVCache(
        k_codes=kv, v_codes=kv, k_sz=kv, v_sz=kv,
        page_table=P(), lengths=P(), bits=cache.bits)


def shard_caches(caches: List[PagedKVCache],
                 mesh: Mesh) -> List[PagedKVCache]:
    return [
        jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            c, _cache_spec(c))
        for c in caches
    ]


def _row_parallel(x2d, site, lin, out_bias_once=True):
    """Shard-local quantize -> local mixed matmul -> psum (f32 partials).

    Handles both representations: segmented (QuantSite + QuantLinear) and
    hetero budgets-as-data (FakeQuantSite + {"w": ScaledW8, "bias"} dicts,
    parallel/tp_hetero.py) — the site/lin leaves are the shard-local
    slices under shard_map either way.
    """
    from ..models.hetero import FakeQuantSite, fakequant_site
    w, bias = ((lin["w"], lin["bias"]) if isinstance(lin, dict)
               else (lin.w, lin.bias))
    if isinstance(site, FakeQuantSite):
        qx = fakequant_site(x2d.astype(jnp.float32), site)
    elif site.perm is not None:
        qx = reorder_quantize_x(x2d, site.perm, *site.splits)
    else:
        qx = activation_quantize(x2d, *site.splits)
    y = jax.lax.psum(mixed_matmul(qx, w, out_dtype=jnp.float32),
                     "model")
    if bias is not None and out_bias_once:
        y = y + bias
    return y.astype(jnp.bfloat16)


def _tp_layer(h, p, cfg_l: ModelConfig, *, attn_fn):
    """One decoder layer, local heads; attn_fn(q, k, v) -> (B, S, Hl*D)."""
    b, s, _ = h.shape
    hd, nh_l, nkv_l = cfg_l.head_dim, cfg_l.num_heads, cfg_l.num_kv_heads
    site = p["attn_site"]
    from ..models.common import project_all
    q, k, v = project_all(h, site, [p["q"], p["k"], p["v"]], p["ln1"],
                          cfg_l.rms_eps)
    q = q.reshape(b, s, nh_l, hd)
    k = k.reshape(b, s, nkv_l, hd)
    v = v.reshape(b, s, nkv_l, hd)
    out, k, v = attn_fn(q, k, v)
    h = h + _row_parallel(out.reshape(b * s, -1), p["o_site"],
                          p["o"]).reshape(b, s, -1)
    msite = p["mlp_site"]
    from ..models.hetero import FakeQuantSite, rmsnorm_fakequant
    if isinstance(msite, FakeQuantSite):
        qm = rmsnorm_fakequant(h, p["ln2"], msite,
                               cfg_l.rms_eps).reshape(b * s, -1)
    else:
        qm = rmsnorm_quantize_x(h, p["ln2"], msite.perm, *msite.splits,
                                eps=cfg_l.rms_eps)
    gate, up = p["gate"](qm), p["up"](qm)
    act = (jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32))
    d = _row_parallel(act, p["down_site"], p["down"])
    return h + d.reshape(b, s, -1)


def _logits(params, cfg, h):
    h = rmsnorm(h, params["final_ln"], cfg.rms_eps)
    return jnp.dot(h, params["lm_head"].T.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def tp_prefill(params: Params, cfg_l: ModelConfig, caches, tokens,
               seq_id, start_pos, last_idx, *, hist_len: int = 0):
    """shard_map body: prefill with local heads; replicated logits out.

    ``hist_len`` (static) enables chunked prefill exactly like
    runner.prefill: the chunk attends over the cached positions of its
    *local head slice* before start_pos — on TPU via the paged Pallas
    kernel (hist_len=-1 sentinel, one compile for all history lengths),
    on CPU via gather_kv + dense mask.  Local pages only, so the history
    path needs no extra collectives.
    """
    b, s = tokens.shape
    paged_hist = bool(hist_len) and jax.default_backend() != "cpu"
    h = jnp.take(params["embed"], tokens, axis=0).astype(jnp.bfloat16)
    positions = start_pos + jnp.arange(s)
    cos, sin = rope_table(positions, cfg_l.head_dim, cfg_l.rope_theta,
                          cfg_l.rope_scaling)
    mask = causal_mask(s, s, cfg_l.sliding_window)
    if hist_len and not paged_hist:
        qi = positions[:, None]
        kj = jnp.arange(hist_len)[None, :]
        hist_allow = kj < start_pos
        if cfg_l.sliding_window is not None:
            hist_allow = jnp.logical_and(hist_allow,
                                         kj > qi - cfg_l.sliding_window)
        mask = jnp.concatenate(
            [jnp.broadcast_to(hist_allow, (s, hist_len)), mask], axis=1)
    seq_ids = jnp.full((s,), seq_id, jnp.int32)
    new_caches = []
    cache_it = iter(caches)

    def attn_fn(q, k, v):
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        cache = append_kv(next(cache_it), seq_ids, positions, k[0], v[0])
        new_caches.append(cache)
        if paged_hist:
            from ..serve.prefill_attention import paged_prefill_attention
            out = paged_prefill_attention(
                q[0], k[0], v[0], cache, seq_id, start_pos,
                sliding_window=cfg_l.sliding_window)[None]
        elif hist_len:
            from ..serve.kv_cache import gather_kv
            kh, vh = gather_kv(cache, seq_id, hist_len)  # (hist, Hl, D)
            k_full = jnp.concatenate([kh[None], k], axis=1)
            v_full = jnp.concatenate([vh[None], v], axis=1)
            out = attention(q, k_full, v_full, mask)
        elif jax.default_backend() != "cpu":
            from ..kernels.flash_attention import flash_attention
            out = flash_attention(q, k, v,
                                  sliding_window=cfg_l.sliding_window)
        else:
            out = attention(q, k, v, mask)
        return out.reshape(b, s, -1), k, v

    for p in params["layers"]:
        h = _tp_layer(h, p, cfg_l, attn_fn=attn_fn)
    h_last = jax.lax.dynamic_slice_in_dim(h, last_idx, 1, axis=1)[:, 0]
    return _logits(params, cfg_l, h_last), new_caches


def tp_prefill_batch(params: Params, cfg_l: ModelConfig, caches, tokens,
                     seq_ids, last_idx):
    """shard_map body: multi-slot FRESH prefill with local heads.

    Mirror of serve/runner.prefill_batch — all rows start at position 0,
    shared RoPE/mask; padding rows carry the scratch seq id.
    """
    b, s = tokens.shape
    h = jnp.take(params["embed"], tokens, axis=0).astype(jnp.bfloat16)
    positions = jnp.arange(s)
    cos, sin = rope_table(positions, cfg_l.head_dim, cfg_l.rope_theta,
                          cfg_l.rope_scaling)
    mask = causal_mask(s, s, cfg_l.sliding_window)
    seq_flat = jnp.repeat(seq_ids, s)
    pos_flat = jnp.tile(positions, b)
    new_caches = []
    cache_it = iter(caches)

    def attn_fn(q, k, v):
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        cache = append_kv(
            next(cache_it), seq_flat, pos_flat,
            k.reshape(b * s, cfg_l.num_kv_heads, cfg_l.head_dim),
            v.reshape(b * s, cfg_l.num_kv_heads, cfg_l.head_dim))
        new_caches.append(cache)
        if jax.default_backend() != "cpu":
            from ..kernels.flash_attention import flash_attention
            out = flash_attention(q, k, v,
                                  sliding_window=cfg_l.sliding_window)
        else:
            out = attention(q, k, v, mask)
        return out.reshape(b, s, -1), k, v

    for p in params["layers"]:
        h = _tp_layer(h, p, cfg_l, attn_fn=attn_fn)
    h_last = jnp.take_along_axis(h, last_idx[:, None, None], axis=1)[:, 0]
    return _logits(params, cfg_l, h_last), new_caches


def tp_decode_step(params: Params, cfg_l: ModelConfig, caches, tokens,
                   seq_ids, positions):
    """shard_map body: one decode step over all slots, local KV heads."""
    from ..models.common import rope_inv_freq
    b = tokens.shape[0]
    h = jnp.take(params["embed"], tokens, axis=0)[:, None, :].astype(
        jnp.bfloat16)
    cos = jnp.cos(_rope_angles(positions, cfg_l))
    sin = jnp.sin(_rope_angles(positions, cfg_l))
    inv = rope_inv_freq(cfg_l.head_dim, cfg_l.rope_theta, cfg_l.rope_scaling)
    new_caches = []
    cache_it = iter(caches)

    def attn_fn(q, k, v):
        # q rope fused into the decode kernel; k rotated before append
        kr = _rope1(k[:, 0], cos, sin)[:, None]
        cache = append_kv(next(cache_it), seq_ids, positions,
                          kr[:, 0], v[:, 0], distinct_pages=True)
        new_caches.append(cache)
        out = paged_decode_attention(q[:, 0], cache, seq_ids,
                                     sliding_window=cfg_l.sliding_window,
                                     rope_positions=positions,
                                     rope_inv_freq=inv)
        return out.reshape(b, 1, -1), kr, v

    for p in params["layers"]:
        h = _tp_layer(h, p, cfg_l, attn_fn=attn_fn)
    return _logits(params, cfg_l, h[:, 0]), new_caches


def tp_verify_block(params: Params, cfg_l: ModelConfig, caches, tokens,
                    seq_ids, positions):
    """shard_map body: speculative-verify forward with local KV heads.

    Mirror of serve/runner.verify_block — tokens (B, S) starting at
    per-slot ``positions`` score as B*S independent rows of the paged
    decode kernel, causally clamped per row via the ``lengths`` override.
    Attention is head-local; the row-parallel psums in _tp_layer make the
    returned (B, S, V) logits replicated, so the acceptance logic in
    serve/speculative.py runs identically on every device.
    """
    from ..models.common import rope_inv_freq
    b, s = tokens.shape
    h = jnp.take(params["embed"], tokens, axis=0).astype(jnp.bfloat16)
    pos = positions[:, None] + jnp.arange(s, dtype=jnp.int32)[None]
    flat_pos = pos.reshape(-1)
    flat_seq = jnp.repeat(seq_ids, s)
    cos = jnp.cos(_rope_angles(flat_pos, cfg_l))
    sin = jnp.sin(_rope_angles(flat_pos, cfg_l))
    inv = rope_inv_freq(cfg_l.head_dim, cfg_l.rope_theta, cfg_l.rope_scaling)
    new_caches = []
    cache_it = iter(caches)

    def attn_fn(q, k, v):
        kf = _rope1(k.reshape(b * s, cfg_l.num_kv_heads, cfg_l.head_dim),
                    cos, sin)
        cache = append_kv(next(cache_it), flat_seq, flat_pos, kf,
                          v.reshape(b * s, cfg_l.num_kv_heads,
                                    cfg_l.head_dim))
        new_caches.append(cache)
        out = paged_decode_attention(
            q.reshape(b * s, cfg_l.num_heads, cfg_l.head_dim),
            cache, flat_seq,
            sliding_window=cfg_l.sliding_window,
            rope_positions=flat_pos, rope_inv_freq=inv,
            lengths=flat_pos + 1)
        return out.reshape(b, s, -1), kf, v

    for p in params["layers"]:
        h = _tp_layer(h, p, cfg_l, attn_fn=attn_fn)
    return _logits(params, cfg_l, h), new_caches


def make_tp_step_fns(params: Params, cfg: ModelConfig, mesh: Mesh, *,
                     decode_chunk: int = 8, n_layers: int = None):
    """Build (prefill, decode, decode_multi) shard-mapped jitted callables
    matching serve.Engine's expected signatures."""
    tp = mesh.shape["model"]
    assert cfg.num_kv_heads % tp == 0 and cfg.num_heads % tp == 0
    cfg_l = dataclasses.replace(cfg, num_heads=cfg.num_heads // tp,
                                num_kv_heads=cfg.num_kv_heads // tp)
    if _is_hetero(params):
        from .tp_hetero import param_specs_tp_hetero
        pspecs = param_specs_tp_hetero(params)
    else:
        pspecs = param_specs_tp(params)
    L = n_layers if n_layers is not None else cfg.num_layers

    def cache_specs(caches):
        return [_cache_spec(c) for c in caches]

    def mk(body, extra_scalar_args, n_lead_outs=1):
        def wrapped(p, c, *args):
            scal = (P(),) * extra_scalar_args
            fn = jax.shard_map(
                functools.partial(body, cfg_l=cfg_l),
                mesh=mesh,
                in_specs=(pspecs, cache_specs(c)) + (P(),) + scal,
                out_specs=(P(),) * n_lead_outs + (cache_specs(c),),
                check_vma=False,
            )
            return fn(p, c, *args)
        # caches are donated: the engine replaces them with the returned
        # pytree after every dispatch (mirrors Engine's builtin jits)
        return jax.jit(wrapped, donate_argnums=(1,))

    prefill_fn = mk(lambda p, c, t, sid, sp, li, cfg_l: tp_prefill(
        p, cfg_l, c, t, sid, sp, li), 3)
    decode_fn = mk(lambda p, c, t, sid, pos, cfg_l: tp_decode_step(
        p, cfg_l, c, t, sid, pos), 2)

    def multi_body(p, c, t, sid, pos, key, step, tt, kk, tp_, *ctl_args,
                   cfg_l, mode="full", logprobs=False):
        out = decode_multi(
            p, cfg_l, c, t, sid, pos, jax.random.fold_in(key, step),
            tt, kk, tp_, ctl_args if ctl_args else None,
            n_steps=decode_chunk, sample_mode=mode, with_logprobs=logprobs,
            step_fn=lambda prm, cl, cc, tk, si, po: tp_decode_step(
                prm, cl, cc, tk, si, po))
        # builtin-wrapper shape (toks, last, [lps,] caches): the last
        # step's tokens feed the engine's pipelined next-chunk dispatch
        if logprobs:
            toks, lps, caches = out
            return toks, toks[-1], lps, caches
        toks, caches = out
        return toks, toks[-1], caches
    # per-sample-mode programs: the 'full' sampler argsorts the whole vocab
    # (~100 ms/step at V=32k, docs/perf_notes.md) and must only compile in
    # when a request actually uses top-p — mirrors Engine._decode_multi_cache.
    # Keys (mode, controls, logprobs): controls adds the repetition-
    # penalty / eos-suppression stage (replicated (B, V) presence — tiny
    # next to the sharded weights), logprobs adds chosen-token
    # log-probabilities; each variant only compiles when requested.
    decode_multi_fns = {}
    for m in SAMPLE_MODES:
        for ctl in (False, True):
            for lp in (False, True):
                decode_multi_fns[(m, ctl, lp)] = mk(
                    functools.partial(multi_body, mode=m, logprobs=lp),
                    12 if ctl else 7, n_lead_outs=3 if lp else 2)

    def prefill_hist(hist_len: int):
        """Chunked-prefill step specialized on the static history length."""
        return mk(lambda p, c, t, sid, sp, li, cfg_l, h=hist_len: tp_prefill(
            p, cfg_l, c, t, sid, sp, li, hist_len=h), 3)

    prefill_batch_fn = mk(
        lambda p, c, t, sid, li, cfg_l: tp_prefill_batch(
            p, cfg_l, c, t, sid, li), 2)

    def spec_multi(dcfg: ModelConfig, gamma: int, n_rounds: int):
        """StepFns.spec_multi factory: shard-mapped speculative rounds.

        TPU-first layout: the draft model is small, so its params and KV
        cache are REPLICATED over the mesh — the draft chain runs
        identically on every device with zero collectives — while target
        verify runs with local heads (tp_verify_block, the usual two
        psums/layer).  The whole draft/verify/accept multi-round program
        is one shard-mapped dispatch, same as single-chip spec decode.
        """
        from ..serve.runner import decode_step
        from ..serve.speculative import spec_decode_multi

        def body(tp_p, d_p, tc, dc, st, sid, key, temps):
            return spec_decode_multi(
                tp_p, d_p, cfg_l, dcfg, tc, dc, st, sid, key, temps,
                gamma=gamma, n_rounds=n_rounds,
                decode_fn=decode_step, verify_fn=tp_verify_block)

        def wrapped(tp_p, d_p, tc, dc, st, sid, key, temps):
            fn = jax.shard_map(
                body, mesh=mesh,
                in_specs=(pspecs, P(), cache_specs(tc), P(), P(), P(),
                          P(), P()),
                out_specs=(P(), P(), P(), cache_specs(tc), P()),
                check_vma=False)
            return fn(tp_p, d_p, tc, dc, st, sid, key, temps)

        return jax.jit(wrapped, donate_argnums=(2, 3))

    def plookup_multi(gamma: int, n_rounds: int, ngram: int):
        """StepFns.plookup_multi factory: shard-mapped prompt-lookup
        speculation.  The token window and the propose/accept math are
        replicated (tiny next to the sharded weights); target verify
        runs with local heads (tp_verify_block) — the draft-free analog
        of spec_multi above."""
        from ..serve.speculative import plookup_decode_multi

        def body(tp_p, tc, st, sid, key, temps):
            return plookup_decode_multi(
                tp_p, cfg_l, tc, st, sid, key, temps, gamma=gamma,
                ngram=ngram, n_rounds=n_rounds, verify_fn=tp_verify_block)

        def wrapped(tp_p, tc, st, sid, key, temps):
            fn = jax.shard_map(
                body, mesh=mesh,
                in_specs=(pspecs, cache_specs(tc), P(), P(), P(), P()),
                out_specs=(P(), P(), P(), cache_specs(tc)),
                check_vma=False)
            return fn(tp_p, tc, st, sid, key, temps)

        return jax.jit(wrapped, donate_argnums=(1,))

    from ..serve.engine import StepFns
    return StepFns(prefill=prefill_fn, decode=decode_fn,
                   decode_multi=decode_multi_fns,
                   prefill_hist=prefill_hist,
                   prefill_batch=prefill_batch_fn,
                   spec_multi=spec_multi,
                   plookup_multi=plookup_multi,
                   decode_multi_returns_last=True)


def _is_hetero(params: Params) -> bool:
    """Hetero-TP pytrees (tp_hetero.py) carry o/down as {"w","bias"}."""
    return isinstance(params["layers"][0]["o"], dict)


def make_tp_engine(params_tp: Params, cfg: ModelConfig, mesh: Mesh,
                   **engine_kw):
    """serve.Engine over TP sharded params + head-sharded KV cache.

    Accepts either representation: quantize_model_tp (segmented) or
    quantize_model_tp_hetero (budgets-as-data) pytrees.
    """
    from ..serve.engine import Engine
    from .tp_quant import shard_params_tp

    decode_chunk = engine_kw.pop("decode_chunk", 8)
    if _is_hetero(params_tp):
        from .tp_hetero import shard_params_tp_hetero
        sharded = shard_params_tp_hetero(params_tp, mesh)
    else:
        sharded = shard_params_tp(params_tp, mesh)
    step_fns = make_tp_step_fns(sharded, cfg, mesh,
                                decode_chunk=decode_chunk)
    return Engine(sharded, cfg, decode_chunk=decode_chunk,
                  step_fns=step_fns,
                  cache_sharding=lambda c: shard_caches([c], mesh)[0],
                  **engine_kw)


__all__ = ["make_tp_engine", "make_tp_step_fns", "shard_caches",
           "tp_prefill", "tp_decode_step"]
