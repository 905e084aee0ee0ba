"""Speculative decoding: draft-propose / target-verify / accept-rollback.

Net-new capability on top of the reference's serving surface (the
reference has no generation loop at all — SURVEY §2; this extends the
engine the same way FlashInfer-style systems grew spec decode).  The
algorithm is standard speculative sampling (Leviathan et al. 2023 /
Chen et al. 2023); the design is TPU-first:

  * the draft chain is a ``lax.scan`` of gamma+1 paged decode steps
    (the +1 re-appends the previous token's K/V, which heals the draft
    cache's one-position hole after a fully-accepted round — appends are
    idempotent overwrites, so this needs no host branching),
  * target verify scores all gamma+1 positions of every slot in ONE
    dispatch via ``runner.verify_block`` (rows of the paged decode
    kernel, causally clamped per row — no separate prefill program),
  * accept/fixup/rollback is pure jnp on (B, gamma) arrays; cache
    rollback is just writing per-sequence lengths (pages stay allocated;
    stale entries are overwritten by later appends at the same
    positions),
  * a whole round — draft scan, verify, accept, rollback — is one jitted
    program; ``spec_decode_multi`` scans several rounds per dispatch
    (the decode_multi chunking story, serve/runner.py:214-247).

Exactness: with temperature 0 everywhere the emitted stream equals
greedy decoding of the TARGET model exactly, whatever the draft
proposes (tests/test_speculative.py locks this).  With temperature > 0
the accept rule min(1, p_t/p_d) + residual resampling preserves the
target distribution token-by-token.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.common import ModelConfig
from .kv_cache import PagedKVCache
from .runner import decode_step, verify_block

Params = Dict[str, Any]
Caches = List[PagedKVCache]


@dataclasses.dataclass(frozen=True)
class SpecState:
    """Per-slot carry between speculative rounds.

    prev/cur are the last two emitted tokens; cur sits at ``positions``
    and is the next token whose K/V the round will append.  ``prev`` is
    re-processed by the draft chain every round (idempotent K/V
    overwrite) so the draft cache never carries a hole.
    """

    prev: jnp.ndarray       # (B,) int32 token at positions - 1
    cur: jnp.ndarray        # (B,) int32 token at positions
    positions: jnp.ndarray  # (B,) int32


jax.tree_util.register_dataclass(
    SpecState, data_fields=["prev", "cur", "positions"], meta_fields=[])


def _softmax_t(logits: jnp.ndarray, temps: jnp.ndarray) -> jnp.ndarray:
    """Temperature softmax; temps (B,) broadcast over trailing dims.

    temp <= 0 rows get a one-hot argmax distribution (greedy limit).
    """
    t = jnp.maximum(temps, 1e-6)[:, None]
    p = jax.nn.softmax(logits.astype(jnp.float32) / t, axis=-1)
    greedy = jax.nn.one_hot(jnp.argmax(logits, axis=-1), logits.shape[-1],
                            dtype=jnp.float32)
    return jnp.where((temps <= 0.0)[:, None], greedy, p)


def draft_propose(dparams: Params, dcfg: ModelConfig, dcaches: Caches,
                  state: SpecState, seq_ids: jnp.ndarray, key: jax.Array,
                  temps: jnp.ndarray, *, gamma: int, decode_fn=decode_step
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, Caches]:
    """Draft chain: propose ``gamma`` tokens per slot.

    Returns (proposed (B, gamma) int32, draft probs of the proposed
    tokens' distributions (B, gamma, V) f32, updated draft caches).

    Step 0 re-processes ``prev`` (heals the post-full-accept hole, output
    discarded); steps 1..gamma process cur, d1, ..  Greedy rows
    (temp<=0) propose argmax.  ``decode_fn`` lets multi-chip callers
    substitute a shard-local step (parallel/tp_serve.py runs the draft
    replicated, so the default single-chip step is also correct there).
    """
    b = state.cur.shape[0]

    def step(carry, i):
        caches, tok, pos = carry
        logits, caches = decode_fn(dparams, dcfg, caches, tok, seq_ids,
                                   pos)
        probs = _softmax_t(logits, temps)                  # (B, V)
        k = jax.random.fold_in(key, i)
        nxt = jnp.where(
            temps <= 0.0,
            jnp.argmax(logits, axis=-1).astype(jnp.int32),
            jax.random.categorical(
                k, jnp.log(jnp.maximum(probs, 1e-30)), axis=-1)
            .astype(jnp.int32))
        return (caches, nxt, pos + 1), (nxt, probs)

    # step 0: heal prev (only the K/V append side effect is kept)
    (dcaches, _, _), _ = step((dcaches, state.prev, state.positions - 1),
                              jnp.int32(0))
    (dcaches, _, _), (toks, probs) = jax.lax.scan(
        step, (dcaches, state.cur, state.positions),
        jnp.arange(1, gamma + 1, dtype=jnp.int32))
    # toks: (gamma, B) -> (B, gamma); probs: (gamma, B, V) -> (B, gamma, V)
    return (jnp.swapaxes(toks, 0, 1), jnp.swapaxes(probs, 0, 1), dcaches)


def accept_tokens(proposed: jnp.ndarray, dprobs: jnp.ndarray,
                  tlogits: jnp.ndarray, key: jax.Array,
                  temps: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Speculative acceptance + fixup.

    proposed (B, gamma); dprobs (B, gamma, V) draft distributions;
    tlogits (B, gamma+1, V) target logits at [cur, d1..d_gamma].
    Returns (emitted (B, gamma+1) int32 right-padded with the fixup/bonus
    token, n_emitted (B,) in [1, gamma+1], all_tokens_valid_mask).

    Greedy rows accept iff the proposal equals the target argmax; sampled
    rows use accept-prob min(1, p_t/p_d) and residual (p_t - p_d)+
    resampling at the first rejection (bonus ~ p_t when all accepted) —
    the target-distribution-preserving rule.
    """
    b, gamma = proposed.shape
    v = tlogits.shape[-1]
    tp = jax.vmap(_softmax_t, in_axes=(1, None), out_axes=1)(
        tlogits, temps)                                    # (B, gamma+1, V)
    tq = jnp.take_along_axis(tp[:, :gamma], proposed[:, :, None],
                             axis=-1)[..., 0]              # (B, gamma)
    dq = jnp.take_along_axis(dprobs, proposed[:, :, None],
                             axis=-1)[..., 0]              # (B, gamma)
    u = jax.random.uniform(jax.random.fold_in(key, 1), (b, gamma))
    ok_sampled = u < jnp.minimum(1.0, tq / jnp.maximum(dq, 1e-30))
    ok_greedy = proposed == jnp.argmax(tlogits[:, :gamma], axis=-1)
    ok = jnp.where((temps <= 0.0)[:, None], ok_greedy, ok_sampled)
    # leading-accept count
    a = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=-1), axis=-1)  # (B,)
    # fixup distribution at the first rejected position (or bonus at gamma)
    arange_g = jnp.arange(gamma + 1, dtype=jnp.int32)
    sel = jnp.minimum(a, gamma)
    t_at = jnp.take_along_axis(tp, sel[:, None, None], axis=1)[:, 0]  # (B,V)
    d_at = jnp.take_along_axis(
        jnp.concatenate([dprobs, jnp.zeros((b, 1, v), dprobs.dtype)],
                        axis=1),
        sel[:, None, None], axis=1)[:, 0]
    resid = jnp.maximum(t_at - jnp.where((a < gamma)[:, None], d_at, 0.0),
                        0.0)
    resid = resid / jnp.maximum(jnp.sum(resid, axis=-1, keepdims=True),
                                1e-30)
    fix_sampled = jax.random.categorical(
        jax.random.fold_in(key, 2),
        jnp.log(jnp.maximum(resid, 1e-30)), axis=-1).astype(jnp.int32)
    fix_greedy = jnp.take_along_axis(
        jnp.argmax(tlogits, axis=-1), sel[:, None], axis=1)[:, 0]
    fix = jnp.where(temps <= 0.0, fix_greedy.astype(jnp.int32), fix_sampled)
    # emitted = accepted proposals then the fixup token, right-padded
    emitted = jnp.where(arange_g[None, :gamma + 1] < a[:, None],
                        jnp.concatenate(
                            [proposed, jnp.zeros((b, 1), jnp.int32)],
                            axis=1),
                        0)
    emitted = emitted.at[jnp.arange(b), a].set(fix)
    n_emitted = a + 1
    mask = arange_g[None] < n_emitted[:, None]
    return emitted, n_emitted, mask


def _set_lengths(caches: Caches, seq_ids: jnp.ndarray,
                 new_len: jnp.ndarray) -> Caches:
    """Write per-sequence lengths on every layer cache (rollback)."""
    out = []
    for c in caches:
        out.append(dataclasses.replace(
            c, lengths=c.lengths.at[seq_ids].set(new_len)))
    return out


def spec_round(tparams: Params, dparams: Params, cfg: ModelConfig,
               dcfg: ModelConfig, tcaches: Caches, dcaches: Caches,
               state: SpecState, seq_ids: jnp.ndarray, key: jax.Array,
               temps: jnp.ndarray, *, gamma: int,
               decode_fn=decode_step, verify_fn=verify_block):
    """One draft+verify+accept round.  Returns
    (emitted (B, gamma+1), n_emitted (B,), new state, tcaches, dcaches).

    ``decode_fn``/``verify_fn`` default to the single-chip runner steps;
    TP serving passes local-head variants so the whole round runs inside
    one shard_map body (parallel/tp_serve.py).
    """
    kd, ka = jax.random.split(key)
    proposed, dprobs, dcaches = draft_propose(
        dparams, dcfg, dcaches, state, seq_ids, kd, temps, gamma=gamma,
        decode_fn=decode_fn)
    block = jnp.concatenate([state.cur[:, None], proposed], axis=1)
    tlogits, tcaches = verify_fn(tparams, cfg, tcaches, block, seq_ids,
                                 state.positions)
    emitted, n_emitted, _ = accept_tokens(proposed, dprobs, tlogits, ka,
                                          temps)
    new_pos = state.positions + n_emitted
    # rollback: valid entries cover positions [0, new_pos)
    tcaches = _set_lengths(tcaches, seq_ids, new_pos)
    dlen = jnp.minimum(state.positions + gamma, new_pos)
    dcaches = _set_lengths(dcaches, seq_ids, dlen)
    last = jnp.take_along_axis(emitted, (n_emitted - 1)[:, None],
                               axis=1)[:, 0]
    prev = jnp.where(n_emitted > 1,
                     jnp.take_along_axis(emitted, (n_emitted - 2)[:, None],
                                         axis=1)[:, 0],
                     state.cur)
    new_state = SpecState(prev=prev, cur=last, positions=new_pos)
    return emitted, n_emitted, new_state, tcaches, dcaches


def spec_decode_multi(tparams: Params, dparams: Params, cfg: ModelConfig,
                      dcfg: ModelConfig, tcaches: Caches, dcaches: Caches,
                      state: SpecState, seq_ids: jnp.ndarray,
                      key: jax.Array, temps: jnp.ndarray, *, gamma: int,
                      n_rounds: int, decode_fn=decode_step,
                      verify_fn=verify_block):
    """``n_rounds`` speculative rounds in ONE program (lax.scan).

    Returns (emitted (n_rounds, B, gamma+1), n_emitted (n_rounds, B),
    final state, tcaches, dcaches).  The host slices each round's first
    ``n_emitted`` tokens per slot (decode_multi's chunking contract).
    """
    def body(carry, i):
        tcaches, dcaches, state = carry
        k = jax.random.fold_in(key, i)
        emitted, n_emitted, state, tcaches, dcaches = spec_round(
            tparams, dparams, cfg, dcfg, tcaches, dcaches, state, seq_ids,
            k, temps, gamma=gamma, decode_fn=decode_fn, verify_fn=verify_fn)
        return (tcaches, dcaches, state), (emitted, n_emitted)

    (tcaches, dcaches, state), (emitted, n_emitted) = jax.lax.scan(
        body, (tcaches, dcaches, state),
        jnp.arange(n_rounds, dtype=jnp.int32))
    return emitted, n_emitted, state, tcaches, dcaches


# ---------------- prompt-lookup (n-gram) speculation ----------------
#
# Draft-model-free speculation: proposals come from the request's own
# token history (prompt + generated so far) by matching the latest
# occurrence of the current ngram-token suffix and proposing the tokens
# that followed it — the vLLM "ngram" speculator / prompt-lookup decoding
# idea, re-expressed fully in-graph so that multiple rounds still run in
# ONE dispatch (lax.scan), like the draft-model path above.  The target
# verify / accept-rollback machinery is reused unchanged: a deterministic
# proposal is a valid draft distribution q = δ(proposed), under which the
# accept rule min(1, p_t/q) degenerates to accept-with-prob p_t(proposed)
# and the residual is p_t with the proposed token masked out — still
# exactly target-distribution-preserving.  No draft params, no draft KV
# cache, no prefill mirroring: the only state is a rolling token window
# the host refreshes per dispatch (it owns the token lists anyway).


@dataclasses.dataclass(frozen=True)
class PLookupState:
    """Per-slot carry for prompt-lookup rounds.

    ``tokens`` holds the tail of each slot's full sequence (prompt +
    emitted) with ``length`` valid entries; ``tokens[length-1]`` is the
    token sitting at KV position ``positions`` (the next one whose K/V a
    round will append).  The buffer needs >= n_rounds*(gamma+1) slack
    columns beyond the lookup window so in-scan appends never overflow
    (the engine sizes it so).
    """

    tokens: jnp.ndarray     # (B, T) int32
    length: jnp.ndarray     # (B,) int32
    positions: jnp.ndarray  # (B,) int32


jax.tree_util.register_dataclass(
    PLookupState, data_fields=["tokens", "length", "positions"],
    meta_fields=[])


def plookup_propose(tokens: jnp.ndarray, length: jnp.ndarray, *,
                    gamma: int, ngram: int) -> jnp.ndarray:
    """Latest-match n-gram continuation proposal, vectorized over slots.

    For each row, find the LATEST position j < length-1 where the
    ``ngram`` tokens ending at j equal the row's trailing ``ngram``
    tokens, and propose ``tokens[j+1 : j+1+gamma]``.  Rows with no match
    (or not enough history) propose ``gamma`` copies of the current
    token — a throwaway proposal the accept rule simply rejects, so the
    round degenerates to one fixup token, exactly a plain decode step.

    Returns proposed (B, gamma) int32.
    """
    b, t = tokens.shape
    idx = jnp.arange(t, dtype=jnp.int32)
    # trailing ngram suffix per row (rows shorter than ngram are guarded
    # out via `found` below, so the index clip cannot fabricate a match)
    suf_idx = jnp.clip(length[:, None] - ngram + jnp.arange(ngram)[None],
                       0, t - 1)
    suffix = jnp.take_along_axis(tokens, suf_idx, axis=1)   # (B, ngram)
    # eq[b, j] = window of ngram tokens ENDING at j matches the suffix
    eq = jnp.ones((b, t), bool)
    for d in range(ngram):
        shift = ngram - 1 - d
        shifted = (jnp.pad(tokens, ((0, 0), (shift, 0)),
                           constant_values=-1)[:, :t]
                   if shift else tokens)
        eq = eq & (shifted == suffix[:, d:d + 1])
    # exclude the suffix occurrence itself (j = length-1) and windows
    # reaching into the invalid tail
    valid = (idx[None] >= ngram - 1) & (idx[None] <= length[:, None] - 2)
    j_sel = jnp.max(jnp.where(eq & valid, idx[None], -1), axis=1)  # (B,)
    found = (j_sel >= 0) & (length >= ngram + 1)
    cont = j_sel[:, None] + 1 + jnp.arange(gamma, dtype=jnp.int32)[None]
    ok = found[:, None] & (cont <= length[:, None] - 1)
    cur = jnp.take_along_axis(
        tokens, jnp.maximum(length - 1, 0)[:, None], axis=1)   # (B, 1)
    proposed = jnp.where(
        ok, jnp.take_along_axis(tokens, jnp.clip(cont, 0, t - 1), axis=1),
        cur)
    return proposed.astype(jnp.int32)


def plookup_round(tparams: Params, cfg: ModelConfig, tcaches: Caches,
                  state: PLookupState, seq_ids: jnp.ndarray,
                  key: jax.Array, temps: jnp.ndarray, *, gamma: int,
                  ngram: int, verify_fn=verify_block):
    """One propose/verify/accept round without a draft model.

    Returns (emitted (B, gamma+1), n_emitted (B,), new state, tcaches).
    """
    b, t = state.tokens.shape
    proposed = plookup_propose(state.tokens, state.length, gamma=gamma,
                               ngram=ngram)
    cur = jnp.take_along_axis(
        state.tokens, jnp.maximum(state.length - 1, 0)[:, None],
        axis=1)[:, 0]
    block = jnp.concatenate([cur[:, None], proposed], axis=1)
    tlogits, tcaches = verify_fn(tparams, cfg, tcaches, block, seq_ids,
                                 state.positions)
    # deterministic draft: q = one-hot(proposed)
    dprobs = jax.nn.one_hot(proposed, tlogits.shape[-1],
                            dtype=jnp.float32)
    emitted, n_emitted, _ = accept_tokens(proposed, dprobs, tlogits, key,
                                          temps)
    new_pos = state.positions + n_emitted
    tcaches = _set_lengths(tcaches, seq_ids, new_pos)
    # append the emitted tokens into the rolling window (masked writes
    # beyond n_emitted or the buffer edge are dropped)
    arange_g = jnp.arange(gamma + 1, dtype=jnp.int32)
    wid = state.length[:, None] + arange_g[None]
    mask = (arange_g[None] < n_emitted[:, None]) & (wid < t)
    wid = jnp.where(mask, wid, t)
    tokens = state.tokens.at[
        jnp.arange(b)[:, None], wid].set(emitted, mode="drop")
    new_state = PLookupState(tokens=tokens,
                             length=jnp.minimum(state.length + n_emitted,
                                                t),
                             positions=new_pos)
    return emitted, n_emitted, new_state, tcaches


def plookup_decode_multi(tparams: Params, cfg: ModelConfig,
                         tcaches: Caches, state: PLookupState,
                         seq_ids: jnp.ndarray, key: jax.Array,
                         temps: jnp.ndarray, *, gamma: int, ngram: int,
                         n_rounds: int, verify_fn=verify_block):
    """``n_rounds`` prompt-lookup rounds in ONE program (lax.scan).

    Returns (emitted (n_rounds, B, gamma+1), n_emitted (n_rounds, B),
    final state, tcaches) — the spec_decode_multi contract minus the
    draft caches.
    """
    def body(carry, i):
        tcaches, state = carry
        k = jax.random.fold_in(key, i)
        emitted, n_emitted, state, tcaches = plookup_round(
            tparams, cfg, tcaches, state, seq_ids, k, temps, gamma=gamma,
            ngram=ngram, verify_fn=verify_fn)
        return (tcaches, state), (emitted, n_emitted)

    (tcaches, state), (emitted, n_emitted) = jax.lax.scan(
        body, (tcaches, state), jnp.arange(n_rounds, dtype=jnp.int32))
    return emitted, n_emitted, state, tcaches


def plookup_prefill_decode(tparams: Params, cfg: ModelConfig,
                           tcaches: Caches, ptokens: jnp.ndarray,
                           pseq_id: jnp.ndarray, pstart: jnp.ndarray,
                           plast: jnp.ndarray, ptrue_len: jnp.ndarray,
                           ptemp: jnp.ndarray, ptop_k: jnp.ndarray,
                           ptop_p: jnp.ndarray, state: PLookupState,
                           seq_ids: jnp.ndarray, key: jax.Array,
                           temps: jnp.ndarray, *, hist_len: int,
                           gamma: int, ngram: int, n_rounds: int,
                           sample_mode: str = "simple"):
    """Piggybacked prompt-lookup step: one pending slot's prefill chunk,
    its true-length fixup, and its first-token sample ride the lookup
    rounds dispatch as ONE program (spec_prefill_decode minus the draft
    mirror — there is no draft cache to keep in sync).

    Returns (first token (1,) int32, emitted (n_rounds, B, gamma+1),
    n_emitted (n_rounds, B), final state, tcaches).
    """
    import dataclasses as _dc

    from .runner import prefill
    from .sampling import sample_batch

    plogits, tcaches = prefill(tparams, cfg, tcaches, ptokens, pseq_id,
                               pstart, plast, hist_len=hist_len)
    tcaches = [_dc.replace(c, lengths=c.lengths.at[pseq_id].set(ptrue_len))
               for c in tcaches]
    ptok = sample_batch(plogits, jax.random.fold_in(key, n_rounds),
                        ptemp, ptop_k, ptop_p, mode=sample_mode)
    emitted, n_emitted, state, tcaches = plookup_decode_multi(
        tparams, cfg, tcaches, state, seq_ids, key, temps, gamma=gamma,
        ngram=ngram, n_rounds=n_rounds)
    return ptok, emitted, n_emitted, state, tcaches


def spec_prefill_decode(tparams: Params, dparams: Params, cfg: ModelConfig,
                        dcfg: ModelConfig, tcaches: Caches, dcaches: Caches,
                        ptokens: jnp.ndarray, pseq_id: jnp.ndarray,
                        pstart: jnp.ndarray, plast: jnp.ndarray,
                        ptrue_len: jnp.ndarray, ptemp: jnp.ndarray,
                        ptop_k: jnp.ndarray, ptop_p: jnp.ndarray,
                        state: SpecState, seq_ids: jnp.ndarray,
                        key: jax.Array, temps: jnp.ndarray, *,
                        hist_len: int, gamma: int, n_rounds: int,
                        sample_mode: str = "simple"):
    """PIGGYBACKED speculative step: one slot's prefill chunk — target AND
    draft mirror, both true-length fixups, and the first-token sample —
    rides the spec-rounds dispatch as ONE program.

    Spec-mode analog of runner.prefill_decode: under mixed load the
    engine previously paid 6 dispatches per step (target prefill, target
    fixup, draft prefill, draft fixup, spec rounds, spec fixups); on the
    axon tunnel each costs ~35 ms.  The prefill slot and the decoding
    slots are distinct sequences, so in-program ordering does not change
    numerics.  The DECODING slots are greedy/temperature only
    (engine._spec_ok); the piggy's FIRST token samples through the full
    per-mode sampler (``sample_mode`` static, ptop_k/ptop_p traced), so
    a top-k/top-p request can still ride the spec dispatch — its later
    decode steps then fall back to normal chunks.

    Returns (first token (1,) int32, emitted (n_rounds, B, gamma+1),
    n_emitted (n_rounds, B), final state, tcaches, dcaches).
    """
    import dataclasses as _dc

    from .runner import prefill

    plogits, tcaches = prefill(tparams, cfg, tcaches, ptokens, pseq_id,
                               pstart, plast, hist_len=hist_len)
    tcaches = [_dc.replace(c, lengths=c.lengths.at[pseq_id].set(ptrue_len))
               for c in tcaches]
    _, dcaches = prefill(dparams, dcfg, dcaches, ptokens, pseq_id,
                         pstart, plast, hist_len=hist_len)
    dcaches = [_dc.replace(c, lengths=c.lengths.at[pseq_id].set(ptrue_len))
               for c in dcaches]
    from .sampling import sample_batch
    # fold value n_rounds is disjoint from the round scan's 0..n_rounds-1
    ptok = sample_batch(plogits, jax.random.fold_in(key, n_rounds),
                        ptemp, ptop_k, ptop_p, mode=sample_mode)
    emitted, n_emitted, state, tcaches, dcaches = spec_decode_multi(
        tparams, dparams, cfg, dcfg, tcaches, dcaches, state, seq_ids,
        key, temps, gamma=gamma, n_rounds=n_rounds)
    return ptok, emitted, n_emitted, state, tcaches, dcaches
