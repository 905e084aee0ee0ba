"""Continuous batching engine.

Host-side slot/page management around the jitted prefill and decode steps
(runner.py).  Net-new capability per the north star: the reference has no
serving loop at all (its FlashInfer kernels were bound but orphaned).

Design: fixed max_seqs slots; every decode step runs all slots in one
program (inactive slots attend over length-0 sequences and write to the
reserved scratch page 0 — no dynamic shapes, no recompiles).  Prefills are
admitted between decode steps with length bucketing to bound compile count.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
import time
from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..models.common import ModelConfig
from .block_manager import BlockManager
from .kv_cache import PagedKVCache, make_cache
from .runner import (decode_multi, decode_step, prefill, prefill_batch,
                     prefill_decode)
from .sampling import SamplingParams, pick_sample_mode, sample_batch


@dataclasses.dataclass
class Request:
    req_id: int
    prompt: List[int]
    max_new_tokens: int = 32
    sampling: SamplingParams = dataclasses.field(default_factory=SamplingParams)
    eos_id: Optional[int] = None
    # additional stop tokens (e.g. chat-template terminators); any match
    # ends the request like eos_id does
    stop_ids: Optional[List[int]] = None
    # streaming: called with each emitted token id as it is produced
    # (chunked decode delivers tokens in bursts of up to decode_chunk)
    on_token: Optional[Any] = None
    # return each chosen token's RAW model log-probability (log_softmax
    # of the un-tempered logits, OpenAI-style) in token_logprobs
    logprobs: bool = False
    # filled by the engine
    output: List[int] = dataclasses.field(default_factory=list)
    token_logprobs: List[float] = dataclasses.field(default_factory=list)
    done: bool = False


@dataclasses.dataclass
class StepFns:
    """Custom (e.g. shard-mapped multi-chip) engine step programs.

    decode_multi may be a dict keyed by sample mode ("simple"/"topk"/
    "full") or, fully, by (mode, controls, logprobs) tuples: controls=True
    marks the logit-controls variant (repetition_penalty /
    min_new_tokens / min_p — takes presence_bits/penalties/ban_ids/
    min_remaining/minp_shift as five extra trailing args), logprobs=True
    the variant that also
    returns chosen-token log-probabilities before the caches.  Plain
    mode keys serve only controls=False, logprobs=False requests.
    prefill_hist is a ``hist_len -> jitted fn`` factory enabling
    chunked prefill; prefill_batch enables multi-slot fresh prefill.
    spec_multi is a ``(draft_cfg, gamma, n_rounds) -> jitted fn`` factory
    enabling speculative decoding (the draft model runs replicated on
    every chip — see parallel/tp_serve.py).  Absent optional members fall
    back to conservative behavior (single-shot prefill, per-slot prefill,
    no speculative mode).
    """

    prefill: Any
    decode: Any
    decode_multi: Any
    prefill_hist: Optional[Any] = None
    prefill_batch: Optional[Any] = None
    spec_multi: Optional[Any] = None
    # ``(gamma, n_rounds, ngram) -> jitted fn`` factory enabling draft-
    # free prompt-lookup speculation (Engine(spec_ngram=...)).
    plookup_multi: Optional[Any] = None
    # True when decode_multi variants return the last step's tokens as an
    # extra output right after the token matrix (builtin wrapper shape) —
    # enables async decode pipelining for custom (multi-chip) step fns
    decode_multi_returns_last: bool = False


@dataclasses.dataclass
class _Slot:
    req: Optional[Request] = None
    pos: int = 0
    # context tokens not yet prefilled (chunked prefill)
    pending: List[int] = dataclasses.field(default_factory=list)
    # the full admitted context (prompt + prior output); prefix-cache
    # registration keys pages off ctx[:pos]
    ctx: List[int] = dataclasses.field(default_factory=list)

    @property
    def ready(self) -> bool:
        return self.req is not None and not self.pending


class Engine:
    def __init__(self, params, cfg: ModelConfig, *, max_seqs: int = 4,
                 page_size: int = 128, max_pages_per_seq: int = 64,
                 n_pages: Optional[int] = None, kv_bits: int = 4,
                 prefill_buckets=(16, 32, 64, 128, 256, 512, 1024, 2048),
                 decode_chunk: int = 8, prefill_chunk: Optional[int] = None,
                 seed: int = 0, step_fns=None, cache_sharding=None,
                 draft_params=None, draft_cfg: Optional[ModelConfig] = None,
                 spec_gamma: int = 4, spec_rounds: Optional[int] = None,
                 spec_ngram: int = 0, spec_window: int = 256,
                 piggyback: bool = True, prefix_cache: bool = False,
                 pipeline: bool = True):
        if step_fns is None and not os.environ.get("MICROMIX_NO_STACK"):
            # single-chip runner path: stack each quantize site's ScaledW8
            # consumers (q/k/v, gate/up) so decode runs ONE multi-output
            # Pallas call per site and prefill one wide dot
            # (models/surgery.stack_layer_projections — a no-op for
            # split-plane / hetero / dense layers).  Sharded step_fns
            # build their own per-shard params and are left untouched.
            # MICROMIX_NO_STACK=1 keeps the per-consumer calls (ablation).
            from ..models.surgery import stack_layer_projections
            memo: dict = {}
            params = stack_layer_projections(params, memo)
            if draft_params is not None:
                draft_params = stack_layer_projections(draft_params, memo)
        self.params = params
        self.cfg = cfg
        self.max_seqs = max_seqs
        self.page_size = page_size
        self.buckets = tuple(sorted(prefill_buckets))
        n_pages = n_pages or (max_seqs * max_pages_per_seq + 1)
        # one extra scratch slot row: mid-prefill slots are pointed at it
        # during batched decode so their real pages are never clobbered
        self.caches = [
            make_cache(n_pages, page_size, cfg.num_kv_heads, cfg.head_dim,
                       max_seqs + 1, max_pages_per_seq, bits=kv_bits)
            for _ in range(cfg.num_layers)
        ]
        if cache_sharding is not None:  # e.g. KV heads over a TP mesh
            self.caches = [cache_sharding(c) for c in self.caches]
        # host-side page bookkeeping: native C++ pool when available
        # (native/kvpool.cpp), Python fallback otherwise; page 0 = scratch
        # prefix caching: content-addressed page sharing across requests
        # (serve/prefix_cache.py).  Opt-in — a cache hit attends to the
        # QUANTIZED cached prefix (chunked-prefill semantics) instead of
        # the exact bf16 in-chunk K/V of a cold single-shot prefill.
        self._prefix_cache = prefix_cache
        if prefix_cache:
            if step_fns is not None and (
                    getattr(step_fns, "prefill_hist", None) is None):
                # a cache hit prefills FROM the match point, i.e. with
                # history — without a sharded hist-prefill that path would
                # silently run the unsharded runner.prefill over sharded
                # params (same hazard as _chunked_ok below)
                raise ValueError("prefix_cache with custom step_fns "
                                 "requires StepFns.prefill_hist")
            from .prefix_cache import PrefixBlockManager
            self.block_manager = PrefixBlockManager(
                n_pages, page_size, max_seqs, max_pages_per_seq)
        else:
            self.block_manager = BlockManager(n_pages, page_size, max_seqs,
                                              max_pages_per_seq)
        self.slots = [_Slot() for _ in range(max_seqs)]
        self.waiting: List[Request] = []
        self._base_key = jax.random.PRNGKey(seed)
        self._sample_step = 0
        self.decode_chunk = max(1, decode_chunk)
        # chunked prefill: long prompts stream through the cache in
        # bucket-sized chunks (bounds TTFT head-of-line blocking and lifts
        # the max-bucket prompt limit).
        self.prefill_chunk = min(prefill_chunk or self.buckets[-1],
                                 self.buckets[-1])
        self._prefill_cache: Dict[int, Any] = {}
        self._custom_decode_multi = None
        self._prefill_hist_factory = None
        self._custom_prefill_batch = None
        self._custom_returns_last = False
        if step_fns is not None:
            # multi-chip serving: shard-mapped steps (StepFns dataclass;
            # bare 3/4-tuples accepted for backward compatibility)
            if isinstance(step_fns, tuple):
                step_fns = StepFns(*step_fns)
            self._prefill = step_fns.prefill
            self._decode = step_fns.decode
            self._custom_decode_multi = step_fns.decode_multi
            self._prefill_hist_factory = step_fns.prefill_hist
            self._custom_prefill_batch = step_fns.prefill_batch
            self._custom_returns_last = getattr(
                step_fns, "decode_multi_returns_last", False)
        self._chunked_ok = (step_fns is None
                            or self._prefill_hist_factory is not None)
        if not self._chunked_ok:
            # without a sharded hist-prefill, chunking would silently run
            # the UNSHARDED runner.prefill over TP-sharded params (wrong
            # numerics under shard-local budgets) — force single-shot
            self.prefill_chunk = self.buckets[-1]
        if step_fns is None:
            self._prefill = jax.jit(
                lambda p, c, t, sid, sp, li: prefill(p, cfg, c, t, sid, sp,
                                                     li),
                donate_argnums=(1,))
            self._decode = jax.jit(
                lambda p, c, t, sid, pos: decode_step(p, cfg, c, t, sid,
                                                      pos),
                donate_argnums=(1,))
        # samplers and chunked-decode programs are specialized per sample
        # MODE (greedy/temp | top-k | full nucleus): the full path sorts the
        # whole vocab (~100 ms at V=32k) and must only compile in when a
        # request actually uses top-p
        self._sampler_cache: Dict[str, Any] = {}
        self._decode_multi_cache: Dict[str, Any] = {}
        # cache-metadata updates touch every layer's pytree: do each as ONE
        # jitted dispatch (32 eager .at[].set calls per event cost a tunnel
        # RPC each on axon)
        self._set_row = jax.jit(
            lambda cs, slot, row: [
                dataclasses.replace(
                    c, page_table=c.page_table.at[slot].set(row))
                for c in cs
            ], donate_argnums=(0,))
        self._set_len = jax.jit(
            lambda cs, slot, n: [
                dataclasses.replace(c, lengths=c.lengths.at[slot].set(n))
                for c in cs
            ], donate_argnums=(0,))
        self._set_row_len = jax.jit(
            lambda cs, slot, row, n: [
                dataclasses.replace(
                    c, page_table=c.page_table.at[slot].set(row),
                    lengths=c.lengths.at[slot].set(n))
                for c in cs
            ], donate_argnums=(0,))
        self._set_len_many = jax.jit(
            lambda cs, slots, ns: [
                dataclasses.replace(c, lengths=c.lengths.at[slots].set(ns))
                for c in cs
            ], donate_argnums=(0,))
        # prefill/decode piggybacking: under mixed load, fold ONE pending
        # slot's prefill chunk (+ its length fixup and first-token sample)
        # into the decode dispatch — 3 dispatches -> 1 on the tunnel.
        # Single-chip only (a TP analog would need a shard-mapped program).
        self._piggyback_ok = piggyback and step_fns is None
        self._piggyback_cache: Dict[Any, Any] = {}
        # multi-slot fresh prefill: one dispatch for all waiting prompts
        # that fit one bucket
        self._can_batch_prefill = (step_fns is None
                                   or self._custom_prefill_batch is not None)
        self._prefill_batch_cache: Dict[int, Any] = {}
        self._clear_slot = jax.jit(
            lambda cs, slot: [
                dataclasses.replace(
                    c,
                    lengths=c.lengths.at[slot].set(0),
                    page_table=c.page_table.at[slot].set(
                        jnp.zeros((c.max_pages_per_seq,), jnp.int32)))
                for c in cs
            ], donate_argnums=(0,))
        # --- speculative decoding (serve/speculative.py) ---
        # a draft model turns the decode phase into draft-propose /
        # target-verify rounds; spec mode constrains prefill to the
        # simple paths (single-shot per-slot — the draft cache must see
        # exactly the prompts the target saw) and supports greedy +
        # temperature sampling (top-k/top-p requests fall back to normal
        # decode chunks for correctness).
        self.draft_params = draft_params
        self.draft_cfg = draft_cfg if draft_cfg is not None else (
            cfg if draft_params is not None else None)
        self.spec_gamma = spec_gamma
        self.spec_rounds = spec_rounds or max(
            1, decode_chunk // (spec_gamma + 1))
        self.dcaches = None
        # prompt-lookup (n-gram) speculation: draft-model-free — the
        # proposals come from each request's own token history, matched
        # in-graph (serve/speculative.py plookup_*).  Shares the verify/
        # accept machinery and engine plumbing with draft-model spec mode
        # but needs no draft cache and no prefill mirroring.
        self.spec_ngram = spec_ngram
        self.spec_window = spec_window
        self._plookup = spec_ngram > 0
        if self._plookup and draft_params is not None:
            raise ValueError("spec_ngram and draft_params are mutually "
                             "exclusive speculation modes")
        self._spec_on = self._plookup or draft_params is not None
        if self._plookup:
            if step_fns is not None and \
                    getattr(step_fns, "plookup_multi", None) is None:
                raise ValueError("prompt-lookup speculation with custom "
                                 "step_fns requires a StepFns."
                                 "plookup_multi factory")
            self._piggyback_ok = False
            self._spec_piggyback_ok = piggyback and step_fns is None
            self._spec_piggy_cache: Dict[int, Any] = {}
            # buffer columns: lookup window + slack for in-scan appends
            self._plookup_T = spec_window + self.spec_rounds * (
                self.spec_gamma + 1)
            from .speculative import plookup_decode_multi
            gamma, rounds, ng = (self.spec_gamma, self.spec_rounds,
                                 spec_ngram)
            tcfg = cfg
            if step_fns is not None:
                self._plookup_multi = step_fns.plookup_multi(
                    gamma, rounds, ng)
            else:
                self._plookup_multi = jax.jit(
                    lambda tp, tc, st, sid, key, temps:
                    plookup_decode_multi(tp, tcfg, tc, st, sid, key,
                                         temps, gamma=gamma, ngram=ng,
                                         n_rounds=rounds),
                    donate_argnums=(1,))
        if draft_params is not None:
            if step_fns is not None and step_fns.spec_multi is None:
                raise ValueError("speculative decoding with custom step_fns "
                                 "requires a StepFns.spec_multi factory")
            dcfg = self.draft_cfg
            self.dcaches = [
                make_cache(n_pages, page_size, dcfg.num_kv_heads,
                           dcfg.head_dim, max_seqs + 1, max_pages_per_seq,
                           bits=kv_bits)
                for _ in range(dcfg.num_layers)
            ]
            # chunked and batched prefill both compose with spec mode:
            # every target prefill dispatch is MIRRORED into the draft
            # cache chunk by chunk, so the draft sees exactly the token
            # stream the target saw.  The plain piggyback program only
            # runs the target model, so it stays off; spec mode has its
            # own fused program (spec_prefill_decode) that mirrors the
            # chunk into the draft inside the same dispatch.
            self._piggyback_ok = False
            self._spec_piggyback_ok = piggyback and step_fns is None
            self._spec_piggy_cache: Dict[int, Any] = {}
            self._draft_prefill_cache: Dict[int, Any] = {}
            self._draft_prefill_batch_cache: Dict[int, Any] = {}
            from .speculative import spec_decode_multi
            gamma, rounds = self.spec_gamma, self.spec_rounds
            tcfg = cfg
            if step_fns is not None:
                # shard-mapped spec rounds (draft replicated on every
                # chip); the draft prefill MIRROR below stays the plain
                # single-chip runner.prefill — replicated inputs make it
                # numerically identical on any device set
                self._spec_multi = step_fns.spec_multi(dcfg, gamma, rounds)
            else:
                self._spec_multi = jax.jit(
                    lambda tp, dp, tc, dc, st, sid, key, temps:
                    spec_decode_multi(tp, dp, tcfg, dcfg, tc, dc, st, sid,
                                      key, temps, gamma=gamma,
                                      n_rounds=rounds),
                    donate_argnums=(2, 3))
        # --- async decode pipelining ---
        # In steady-state decode the next chunk's ONLY data dependency on
        # the previous one is the last sampled token per slot — which the
        # decode program already holds ON DEVICE.  So chunk k+1 is
        # dispatched feeding chunk k's in-graph `last` output (no host
        # round-trip), and chunk k's tokens are fetched/processed while
        # k+1 executes.  On the axon tunnel this hides the ~77 ms/chunk
        # dispatch+fetch sync (the gap between in-graph 18.5 ms/step and
        # engine 23.9 ms/step at 8B shapes — docs/perf_notes.md); on a
        # local chip it removes the device idle gap between chunks.
        # Safety: slots that finish (eos/max_new) during an in-flight
        # chunk decode one zombie chunk into pages they still own at
        # dispatch time; all later page reuse happens via dispatches
        # ordered AFTER the zombie on the single device stream, so the
        # waste is bounded (≤ one chunk) and never corrupts.  Any
        # scheduling event (admission, prefill, controls, cancel, page
        # stall) drains the in-flight chunk and takes the normal path.
        self._pipeline_ok = (pipeline
                             and (step_fns is None
                                  or self._custom_returns_last)
                             and not self._spec_on and not prefix_cache)
        self._inflight: Optional[Dict[str, Any]] = None
        # stats
        self.prefill_tokens = 0
        self.decode_tokens = 0
        # host wall seconds per engine phase (serve --profile breakdown);
        # includes device blocking only where the phase itself fetches
        self.phase_s = {"prefill": 0.0, "decode": 0.0, "mixed": 0.0,
                        "spec": 0.0}
        self.preemptions = 0
        self.prefix_hit_tokens = 0
        self.spec_accepted = 0
        self.spec_proposed = 0
        self.ttft: Dict[int, float] = {}
        self._t_submit: Dict[int, float] = {}

    @contextlib.contextmanager
    def _phase(self, name: str):
        # TraceAnnotation labels the host span in `serve --profile` traces
        # (the dispatches inside inherit it), so the Perfetto timeline
        # shows the prefill/decode/mixed/spec phase breakdown per step —
        # nsys-range analog of the reference's prof wrapper (SURVEY §5).
        t0 = time.perf_counter()
        try:
            with jax.profiler.TraceAnnotation(f"engine.{name}"):
                yield
        finally:
            self.phase_s[name] += time.perf_counter() - t0

    def _sampler_for(self, mode: str, controls: bool = False,
                     logprobs: bool = False):
        from .sampling import apply_logit_controls, ban_mask, unpack_presence
        key = (mode, controls, logprobs)
        if key not in self._sampler_cache:
            def run(lg, key_, step, t, k, tp, *ctl, m=mode):
                x = lg
                if ctl:
                    pres_bits, pen, ban, mrem, mps = ctl
                    v = lg.shape[1]
                    x = apply_logit_controls(
                        lg, unpack_presence(pres_bits, v), pen,
                        jnp.logical_and((mrem > 0)[:, None],
                                        ban_mask(ban, v)),
                        minp_shift=mps)
                toks = sample_batch(x, jax.random.fold_in(key_, step),
                                    t, k, tp, mode=m)
                if not logprobs:
                    return toks
                lps = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
                return toks, lps[jnp.arange(lg.shape[0]), toks]
            self._sampler_cache[key] = jax.jit(run)
        return self._sampler_cache[key]

    def _decode_multi_for(self, mode: str, controls: bool = False,
                          logprobs: bool = False):
        if self._custom_decode_multi is not None:
            cdm = self._custom_decode_multi
            if isinstance(cdm, dict):
                for k in ((mode, controls, logprobs),
                          *(((mode, controls),) if not logprobs else ()),
                          *((mode,) if not (controls or logprobs) else ())):
                    if k in cdm:
                        return cdm[k]
            elif not (controls or logprobs):
                return cdm
            raise ValueError("custom decode_multi lacks the requested "
                             "variant (controls=%s, logprobs=%s)"
                             % (controls, logprobs))
        key = (mode, controls, logprobs)
        if key not in self._decode_multi_cache:
            cfg = self.cfg

            def run(p, c, t, sid, pos, key_, step, tt, kk, tp, *ctl,
                    m=mode):
                out = decode_multi(
                    p, cfg, c, t, sid, pos,
                    jax.random.fold_in(key_, step), tt, kk, tp,
                    ctl if ctl else None,
                    n_steps=self.decode_chunk, sample_mode=m,
                    with_logprobs=logprobs)
                # also return the last step's tokens as a separate output:
                # the pipelined path feeds them straight into the next
                # chunk's dispatch as a device array (an eager toks[-1]
                # slice would cost its own tunnel RPC)
                if logprobs:
                    toks, lps, caches = out
                    return toks, toks[-1], lps, caches
                toks, caches = out
                return toks, toks[-1], caches
            self._decode_multi_cache[key] = jax.jit(run,
                                                    donate_argnums=(1,))
        return self._decode_multi_cache[key]

    def _controls_arrays(self, reqs: List[Optional[Request]]):
        """(presence_bits, penalties, ban_ids, min_remaining, minp_shift)
        device arrays for the logit-controls stage; row i covers reqs[i]
        (None = neutral).

        presence ships BIT-PACKED (B, ceil(V/8)) u8 — 8x smaller on the
        ~35 ms/dispatch tunnel than a (B, V) bool — and is unpacked once
        in-graph.  ban_ids (B, W) lists every terminator (eos_id AND
        stop_ids) to suppress while min_new_tokens is unmet, padded with
        -1; W adapts to the widest row (one compiled variant per width).
        minp_shift carries min-p as T*ln(min_p) per row (-inf = off).
        """
        b = len(reqs)
        v = self.cfg.vocab_size
        presence = np.zeros((b, v), bool)
        pen = np.ones((b,), np.float32)
        mrem = np.zeros((b,), np.int32)
        bans: List[List[int]] = [[] for _ in reqs]
        for i, r in enumerate(reqs):
            if r is None:
                continue
            sp = r.sampling
            pen[i] = sp.repetition_penalty
            if sp.repetition_penalty != 1.0:
                ctx = np.asarray(r.prompt + r.output, np.int32)
                presence[i, ctx] = True
            if sp.min_new_tokens > len(r.output):
                ids = ([r.eos_id] if r.eos_id is not None else []) \
                    + list(r.stop_ids or [])
                if ids:
                    bans[i] = ids
                    mrem[i] = sp.min_new_tokens - len(r.output)
        w = max(1, max(len(x) for x in bans))
        ban = np.full((b, w), -1, np.int32)
        for i, ids in enumerate(bans):
            ban[i, :len(ids)] = ids
        packed = np.packbits(presence, axis=1, bitorder="little")
        from .sampling import minp_shifts
        mps = minp_shifts([r.sampling if r is not None else None
                           for r in reqs])
        return (jnp.asarray(packed), jnp.asarray(pen), jnp.asarray(ban),
                jnp.asarray(mrem), jnp.asarray(mps))

    # ---------------- host-side page-table management ----------------

    def _ensure_pages(self, slot_id: int, needed_tokens: int) -> None:
        before = self.block_manager.num_pages(slot_id)
        row_np = self.block_manager.ensure(slot_id, needed_tokens)
        if self.block_manager.num_pages(slot_id) == before:
            return  # table unchanged; skip the device update
        self.caches = self._set_row(self.caches, jnp.int32(slot_id),
                                    jnp.asarray(row_np))
        if self.dcaches is not None:
            self.dcaches = self._set_row(self.dcaches, jnp.int32(slot_id),
                                         jnp.asarray(row_np))

    def _register_prefix(self, slot_id: int) -> None:
        """Make the slot's fully-prefilled pages matchable (no-op unless
        prefix caching is on)."""
        if self._prefix_cache:
            slot = self.slots[slot_id]
            self.block_manager.register_prefix(slot_id, slot.ctx, slot.pos)

    def _release(self, slot_id: int) -> None:
        slot = self.slots[slot_id]
        if self._prefix_cache and slot.req is not None:
            # register generated-token pages too: a follow-up turn whose
            # prompt extends this conversation (prompt + output) hits them
            # (slot.pos counts tokens whose K/V is actually written — the
            # final emitted token's is not).  Spec mode drops one more
            # position: a fully-accepted final round leaves the DRAFT
            # cache with an unwritten K/V at pos-1 (normally healed by the
            # next round's prev re-append, which never comes)
            covered = slot.pos - (1 if self.dcaches is not None else 0)
            self.block_manager.register_prefix(
                slot_id, slot.req.prompt + slot.req.output, covered)
        self.block_manager.release(slot_id)
        self.slots[slot_id] = _Slot()
        self.caches = self._clear_slot(self.caches, jnp.int32(slot_id))
        if self.dcaches is not None:
            self.dcaches = self._clear_slot(self.dcaches,
                                            jnp.int32(slot_id))

    # ---------------- scheduling ----------------

    def submit(self, req: Request) -> None:
        self.waiting.append(req)
        self._t_submit[req.req_id] = time.time()

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(f"prompt length {n} exceeds largest bucket")

    def _preempt(self, slot_id: int) -> None:
        """Evict a running sequence: free its pages, requeue for recompute.

        vLLM-style recomputation preemption: on re-admission the prefill
        context is prompt + tokens generated so far, so no state is lost.
        """
        req = self.slots[slot_id].req
        self._release(slot_id)
        self.waiting.insert(0, req)
        self.preemptions += 1

    def _admit(self) -> None:
        for slot_id, slot in enumerate(self.slots):
            if slot.req is not None or not self.waiting:
                continue
            req = self.waiting.pop(0)
            # output is non-empty after a preemption: recompute-from-context
            ctx = req.prompt + req.output
            if not self._chunked_ok:
                self._bucket(len(ctx))  # must fit one bucket (raises)
            slot.req = req
            slot.pos = 0
            slot.pending = list(ctx)
            slot.ctx = list(ctx)
            if self._prefix_cache:
                matched = self.block_manager.match_and_attach(slot_id, ctx)
                if matched:
                    # shared pages hold the prefix K/V already: point the
                    # device tables/lengths at them and prefill the rest
                    # through the ordinary chunked-history path
                    # ONE dispatch updates row+length of target AND
                    # draft caches (35 ms/dispatch on the axon tunnel)
                    row = jnp.asarray(self.block_manager.table_row(slot_id))
                    both = self.caches + (self.dcaches or [])
                    both = self._set_row_len(both, jnp.int32(slot_id), row,
                                             jnp.int32(matched))
                    self.caches = both[:len(self.caches)]
                    if self.dcaches is not None:
                        self.dcaches = both[len(self.caches):]
                    slot.pos = matched
                    slot.pending = list(ctx[matched:])
                    self.prefix_hit_tokens += matched

    def _prefill_for(self, hist_gather: int):
        """Jitted prefill for chunks with history.

        On TPU the paged prefill kernel derives the history length from
        start_pos at runtime, so every history length shares ONE compiled
        program per chunk bucket (hist_len=-1 sentinel); the CPU dense
        reference path still specializes on the concrete length.
        """
        if hist_gather == 0:
            return self._prefill
        key = hist_gather if jax.default_backend() == "cpu" else -1
        if key not in self._prefill_cache:
            if self._prefill_hist_factory is not None:
                self._prefill_cache[key] = self._prefill_hist_factory(key)
            else:
                cfg = self.cfg
                self._prefill_cache[key] = jax.jit(
                    lambda p, c, t, sid, sp, li, h=key: prefill(
                        p, cfg, c, t, sid, sp, li, hist_len=h),
                    donate_argnums=(1,))
        return self._prefill_cache[key]

    def _piggyback_for(self, hist_key: int, mode: str):
        key = (hist_key, mode)
        if key not in self._piggyback_cache:
            cfg = self.cfg
            n_steps = self.decode_chunk
            self._piggyback_cache[key] = jax.jit(
                lambda p, c, pt, psid, psp, pli, ptl, ptemp, pk, pp,
                dt, dsid, dpos, key_, step, tt, kk, tp, h=hist_key, m=mode:
                prefill_decode(
                    p, cfg, c, pt, psid, psp, pli, ptl, ptemp, pk, pp,
                    dt, dsid, dpos, jax.random.fold_in(key_, step),
                    tt, kk, tp, hist_len=h, n_steps=n_steps,
                    sample_mode=m), donate_argnums=(1,))
        return self._piggyback_cache[key]

    def _pick_piggy(self, handled: set) -> Optional[int]:
        """Choose one pending slot to fold into this step's decode dispatch.

        Requires at least one OTHER slot already decoding (else there is
        nothing to piggyback on and the plain prefill path is cheaper to
        compile).  Pages are reserved here; on pool exhaustion fall back to
        the per-slot prefill path, which owns the stall/preempt logic.
        """
        if not any(s.ready for s in self.slots):
            return None
        for i, s in enumerate(self.slots):
            if i in handled or s.req is None or not s.pending:
                continue
            bucket = self._bucket(len(s.pending[:self.prefill_chunk]))
            try:
                self._ensure_pages(i, s.pos + bucket)
            except RuntimeError:
                return None
            return i
        return None

    def _piggy_decode(self, piggy: int, tokens, seq_ids,
                      positions) -> np.ndarray:
        """One dispatch: piggy slot's prefill chunk + everyone's decode."""
        slot = self.slots[piggy]
        pchunk = slot.pending[:self.prefill_chunk]
        n = len(pchunk)
        bucket = self._bucket(n)
        hist = slot.pos
        hist_gather = -(-hist // self.page_size) * self.page_size \
            if hist else 0
        hist_key = hist_gather if (
            hist_gather == 0 or jax.default_backend() == "cpu") else -1
        ptoks = np.zeros((1, bucket), np.int32)
        ptoks[0, :n] = pchunk
        t = np.zeros((self.max_seqs,), np.float32)
        k = np.zeros((self.max_seqs,), np.int32)
        p = np.ones((self.max_seqs,), np.float32)
        for i, s in enumerate(self.slots):
            if s.req is not None:
                t[i] = s.req.sampling.temperature
                k[i] = s.req.sampling.top_k
                p[i] = s.req.sampling.top_p
        mode = pick_sample_mode(
            [s.req.sampling for s in self.slots if s.req is not None])
        sp = slot.req.sampling
        self._sample_step += 1
        ptok, toks_dev, self.caches = self._piggyback_for(hist_key, mode)(
            self.params, self.caches, jnp.asarray(ptoks), jnp.int32(piggy),
            jnp.int32(hist), jnp.int32(n - 1), jnp.int32(hist + n),
            jnp.asarray([sp.temperature], np.float32),
            jnp.asarray([sp.top_k], np.int32),
            jnp.asarray([sp.top_p], np.float32),
            jnp.asarray(tokens), jnp.asarray(seq_ids),
            jnp.asarray(positions), self._base_key,
            jnp.int32(self._sample_step), jnp.asarray(t), jnp.asarray(k),
            jnp.asarray(p))
        slot.pos = hist + n
        slot.pending = slot.pending[n:]
        self.prefill_tokens += n
        self._register_prefix(piggy)
        if not slot.pending:
            self.ttft.setdefault(
                slot.req.req_id,
                time.time() - self._t_submit[slot.req.req_id])
            self._emit(piggy, int(np.asarray(ptok)[0]))
        return np.asarray(toks_dev)

    def _spec_piggy_for(self, hist_key: int, mode: str):
        """Fused spec_prefill_decode program per (history-length,
        first-token sample mode) key."""
        if (hist_key, mode) not in self._spec_piggy_cache:
            from .speculative import spec_prefill_decode
            tcfg, dcfg = self.cfg, self.draft_cfg
            gamma, rounds = self.spec_gamma, self.spec_rounds
            self._spec_piggy_cache[(hist_key, mode)] = jax.jit(
                lambda tp, dp, tc, dc, pt, psid, psp, pli, ptl, ptemp,
                pk, pp, st, sid, key, temps, h=hist_key, m=mode:
                spec_prefill_decode(tp, dp, tcfg, dcfg, tc, dc, pt, psid,
                                    psp, pli, ptl, ptemp, pk, pp, st, sid,
                                    key, temps, hist_len=h, gamma=gamma,
                                    n_rounds=rounds, sample_mode=m),
                donate_argnums=(2, 3))
        return self._spec_piggy_cache[(hist_key, mode)]

    def _plookup_piggy_for(self, hist_key: int, mode: str):
        """Fused plookup_prefill_decode program per (history-length,
        first-token sample mode) key — draft-free analog of
        _spec_piggy_for."""
        if (hist_key, mode) not in self._spec_piggy_cache:
            from .speculative import plookup_prefill_decode
            tcfg = self.cfg
            gamma, rounds, ng = (self.spec_gamma, self.spec_rounds,
                                 self.spec_ngram)
            self._spec_piggy_cache[(hist_key, mode)] = jax.jit(
                lambda tp, tc, pt, psid, psp, pli, ptl, ptemp,
                pk, pp, st, sid, key, temps, h=hist_key, m=mode:
                plookup_prefill_decode(tp, tcfg, tc, pt, psid, psp, pli,
                                       ptl, ptemp, pk, pp, st, sid, key,
                                       temps, hist_len=h, gamma=gamma,
                                       ngram=ng, n_rounds=rounds,
                                       sample_mode=m),
                    donate_argnums=(1,))
        return self._spec_piggy_cache[(hist_key, mode)]

    def _plookup_state(self, seq_ids, positions):
        """Host-built rolling token window for prompt-lookup rounds:
        each active row gets the tail (last spec_window tokens) of its
        full sequence; slack columns absorb the rounds' in-scan appends.
        """
        from .speculative import PLookupState
        toks = np.zeros((self.max_seqs, self._plookup_T), np.int32)
        lens = np.zeros((self.max_seqs,), np.int32)
        for i, s in enumerate(self.slots):
            if seq_ids[i] != i or s.req is None:
                continue
            seq = s.req.prompt + s.req.output
            tail = seq[-min(len(seq), self.spec_window):]
            toks[i, :len(tail)] = tail
            lens[i] = len(tail)
        return PLookupState(tokens=jnp.asarray(toks),
                            length=jnp.asarray(lens),
                            positions=jnp.asarray(positions))

    def _draft_prefill_for(self, hist_gather: int):
        """Draft-model mirror of _prefill_for (spec mode, chunked)."""
        key = (hist_gather if jax.default_backend() == "cpu" else -1) \
            if hist_gather else 0
        if key not in self._draft_prefill_cache:
            dcfg = self.draft_cfg
            self._draft_prefill_cache[key] = jax.jit(
                lambda p, c, t, sid, sp, li, h=key: prefill(
                    p, dcfg, c, t, sid, sp, li, hist_len=h),
                donate_argnums=(1,))
        return self._draft_prefill_cache[key]

    def _draft_prefill_batch_for(self, bucket: int):
        if bucket not in self._draft_prefill_batch_cache:
            dcfg = self.draft_cfg
            self._draft_prefill_batch_cache[bucket] = jax.jit(
                lambda p, c, t, sid, li: prefill_batch(p, dcfg, c, t,
                                                       sid, li),
                donate_argnums=(1,))
        return self._draft_prefill_batch_cache[bucket]

    def _prefill_batch_for(self, bucket: int):
        if bucket not in self._prefill_batch_cache:
            if self._custom_prefill_batch is not None:
                self._prefill_batch_cache[bucket] = \
                    self._custom_prefill_batch
            else:
                cfg = self.cfg
                self._prefill_batch_cache[bucket] = jax.jit(
                    lambda p, c, t, sid, li: prefill_batch(p, cfg, c, t,
                                                           sid, li),
                    donate_argnums=(1,))
        return self._prefill_batch_cache[bucket]

    def _prefill_batch_pass(self) -> set:
        """Prefill every fresh single-bucket prompt in ONE dispatch.

        Returns the slot ids handled.  Slots mid-chunked-prefill (pos > 0)
        or with prompts longer than the chunk keep the per-slot path.
        """
        fresh = [i for i, s in enumerate(self.slots)
                 if s.req is not None and s.pending and s.pos == 0
                 and len(s.pending) <= self.prefill_chunk]
        if len(fresh) < 2:
            return set()
        bucket = self._bucket(max(len(self.slots[i].pending)
                                  for i in fresh))
        ok = []
        for i in fresh:
            try:
                self._ensure_pages(i, bucket)
                ok.append(i)
            except RuntimeError:
                req = self.slots[i].req
                self._release(i)
                self.waiting.insert(0, req)
        if len(ok) < 2:
            return set()
        b = self.max_seqs
        toks = np.zeros((b, bucket), np.int32)
        seqs = np.full((b,), self.max_seqs, np.int32)  # pad rows -> scratch
        last = np.zeros((b,), np.int32)
        for row, i in enumerate(ok):
            chunk = self.slots[i].pending
            toks[row, :len(chunk)] = chunk
            seqs[row] = i
            last[row] = len(chunk) - 1
        logits, self.caches = self._prefill_batch_for(bucket)(
            self.params, self.caches, jnp.asarray(toks), jnp.asarray(seqs),
            jnp.asarray(last))
        # one dispatch to fix all true lengths (bucket padding over-wrote)
        lens = np.asarray([len(self.slots[i].pending) for i in ok], np.int32)
        self.caches = self._set_len_many(
            self.caches, jnp.asarray(ok, dtype=jnp.int32), jnp.asarray(lens))
        if self.dcaches is not None:  # spec mode: mirror into the draft
            _, self.dcaches = self._draft_prefill_batch_for(bucket)(
                self.draft_params, self.dcaches, jnp.asarray(toks),
                jnp.asarray(seqs), jnp.asarray(last))
            self.dcaches = self._set_len_many(
                self.dcaches, jnp.asarray(ok, dtype=jnp.int32),
                jnp.asarray(lens))
        # ok slots occupy the first len(ok) batch rows by construction
        firsts, flps = self._sample_rows(logits[:len(ok)],
                                         [self.slots[i].req for i in ok])
        now = time.time()
        for row, i in enumerate(ok):
            slot = self.slots[i]
            n = len(slot.pending)
            slot.pos = n
            slot.pending = []
            self.prefill_tokens += n
            self._register_prefix(i)
            self.ttft.setdefault(slot.req.req_id,
                                 now - self._t_submit[slot.req.req_id])
            self._emit(i, int(firsts[row]),
                       float(flps[row]) if flps is not None else None)
        return set(ok)

    def _prefill_step(self, slot_id: int) -> bool:
        """Run ONE prefill chunk for a pending slot.  False on page stall."""
        slot = self.slots[slot_id]
        chunk = slot.pending[:self.prefill_chunk]
        n = len(chunk)
        bucket = self._bucket(n)
        try:
            self._ensure_pages(slot_id, slot.pos + bucket)
        except RuntimeError:
            victims = [j for j, t in enumerate(self.slots)
                       if t.req is not None and j != slot_id]
            if not victims:
                # nobody else holds pages: requeueing would livelock
                # (step() would keep returning True with zero progress)
                raise RuntimeError(
                    "KV pool too small for this prompt's prefill")
            req = slot.req
            self._release(slot_id)
            self.waiting.insert(0, req)
            return False
        hist = slot.pos
        hist_gather = -(-hist // self.page_size) * self.page_size \
            if hist else 0
        toks = np.zeros((1, bucket), np.int32)
        toks[0, :n] = chunk
        logits, self.caches = self._prefill_for(hist_gather)(
            self.params, self.caches, jnp.asarray(toks),
            jnp.int32(slot_id), jnp.int32(slot.pos), jnp.int32(n - 1))
        # bucket padding wrote extra KV positions; reset length to the true
        # count (padding is masked and later overwritten)
        true_len = slot.pos + n
        self.caches = self._set_len(self.caches, jnp.int32(slot_id),
                                    jnp.int32(true_len))
        if self.dcaches is not None:
            # mirror this chunk into the draft cache: the draft sees
            # exactly the token stream (and chunking) the target saw
            _, self.dcaches = self._draft_prefill_for(hist_gather)(
                self.draft_params, self.dcaches, jnp.asarray(toks),
                jnp.int32(slot_id), jnp.int32(slot.pos), jnp.int32(n - 1))
            self.dcaches = self._set_len(self.dcaches, jnp.int32(slot_id),
                                         jnp.int32(true_len))
        slot.pos = true_len
        slot.pending = slot.pending[n:]
        self.prefill_tokens += n
        self._register_prefix(slot_id)
        if not slot.pending:
            first, first_lp = self._sample_from(logits, slot.req)
            self.ttft.setdefault(
                slot.req.req_id,
                time.time() - self._t_submit[slot.req.req_id])
            self._emit(slot_id, first, first_lp)
        return True

    def _sample_rows(self, logits, reqs: List[Optional[Request]]):
        """One batched sampler dispatch for len(reqs) rows (None = greedy).

        Returns (tokens (B,) np, logprobs (B,) np or None)."""
        from .sampling import uses_logit_controls
        t = np.zeros((len(reqs),), np.float32)
        k = np.zeros((len(reqs),), np.int32)
        p = np.ones((len(reqs),), np.float32)
        for i, r in enumerate(reqs):
            if r is not None:
                t[i] = r.sampling.temperature
                k[i] = r.sampling.top_k
                p[i] = r.sampling.top_p
        self._sample_step += 1
        mode = pick_sample_mode([r.sampling for r in reqs if r is not None])
        ctl = (self._controls_arrays(reqs)
               if uses_logit_controls([r.sampling for r in reqs
                                       if r is not None]) else ())
        lp = any(r is not None and r.logprobs for r in reqs)
        out = self._sampler_for(mode, bool(ctl), lp)(
            logits, self._base_key, jnp.int32(self._sample_step),
            jnp.asarray(t), jnp.asarray(k), jnp.asarray(p), *ctl)
        if lp:
            return np.asarray(out[0]), np.asarray(out[1])
        return np.asarray(out), None

    def _sample_from(self, logits, req: Request):
        toks, lps = self._sample_rows(logits, [req])
        return int(toks[0]), (float(lps[0]) if lps is not None else None)

    def _emit(self, slot_id: int, token: int,
              lp: Optional[float] = None) -> None:
        slot = self.slots[slot_id]
        req = slot.req
        req.output.append(token)
        if req.logprobs and lp is not None:
            req.token_logprobs.append(lp)
        if req.on_token is not None:
            req.on_token(token)
        if (req.eos_id is not None and token == req.eos_id) or \
                (req.stop_ids is not None and token in req.stop_ids) or \
                len(req.output) >= req.max_new_tokens:
            req.done = True
            self._release(slot_id)

    def cancel(self, req_id: int) -> bool:
        """Abort a request: dequeue it, or release its slot mid-flight.

        Already-emitted tokens stay in ``req.output``; ``req.done`` is set
        so callers can distinguish completion from abandonment by length.
        Safe between steps and from ``on_token`` callbacks (the same
        release path _emit uses — the step loop re-checks slot liveness).
        Returns False if the request is unknown or already finished.
        """
        for i, r in enumerate(self.waiting):
            if r.req_id == req_id:
                self.waiting.pop(i)
                r.done = True
                return True
        for slot_id, slot in enumerate(self.slots):
            if slot.req is not None and slot.req.req_id == req_id:
                slot.req.done = True
                self._release(slot_id)
                return True
        return False

    def _apply_chunk(self, toks: np.ndarray, lps, active, reqs) -> None:
        """Emit one fetched decode chunk.  ``reqs`` (slot→Request at
        dispatch time) guards against slots recycled since dispatch
        (finished or cancelled mid-flight): their rows are dropped."""
        for j in range(toks.shape[0]):
            for i in active:
                s = self.slots[i]
                if not s.ready or (reqs is not None
                                   and s.req is not reqs[i]):
                    continue
                s.pos += 1
                self.decode_tokens += 1
                self.ttft.setdefault(
                    s.req.req_id,
                    time.time() - self._t_submit[s.req.req_id])
                self._emit(i, int(toks[j, i]),
                           float(lps[j, i]) if lps is not None else None)

    def _process_inflight(self, rec: Dict[str, Any]) -> None:
        with self._phase("decode"):
            toks = np.asarray(rec["toks"])
        self._apply_chunk(toks, None, rec["active"], rec["reqs"])

    def _try_pipeline(self) -> bool:
        """Steady-state continuation: dispatch the next decode chunk from
        the in-flight chunk's DEVICE-side last tokens, then process the
        in-flight results while the new chunk executes.

        Returns False (caller drains and takes the normal path) on any
        scheduling event: queued arrivals, pending prefill, a changed
        active set or request identity (cancel), a sampler-program change,
        or page-pool pressure (the normal path owns preemption).
        """
        rec = self._inflight
        if rec is None or not self._pipeline_ok:
            return False
        # (queued arrivals don't block pipelining: _admit already ran, so a
        # non-empty waiting list means every slot is full — a finish is
        # noticed at processing time and drains via the active-set check)
        from .sampling import uses_logit_controls
        for s in self.slots:
            if s.req is not None and s.pending:
                return False
        live = []
        for i in rec["active"]:
            s = self.slots[i]
            if s.req is None or s.req is not rec["reqs"][i]:
                return False
            live.append(s.req)
        if [i for i, s in enumerate(self.slots) if s.ready] != rec["active"]:
            return False
        if uses_logit_controls([r.sampling for r in live]) \
                or any(r.logprobs for r in live):
            return False
        if pick_sample_mode([r.sampling for r in live]) != rec["mode"]:
            return False
        chunk = self.decode_chunk
        # slots that deterministically exhaust max_new_tokens during the
        # in-flight chunk would be pure zombies next chunk: point them at
        # the scratch row (eos finishes are unpredictable and cost one
        # zombie chunk before the active-set check drains)
        live_ids = [i for i in rec["active"]
                    if len(rec["reqs"][i].output) + chunk
                    < rec["reqs"][i].max_new_tokens]
        if not live_ids:
            return False
        positions = rec["positions"].copy()
        positions[live_ids] = positions[live_ids] + chunk
        for i in live_ids:
            try:
                self._ensure_pages(i, int(positions[i]) + chunk + 1)
            except RuntimeError:
                return False
        if live_ids != rec["active"]:
            sid = np.full((self.max_seqs,), self.max_seqs, np.int32)
            for i in live_ids:
                sid[i] = i
            sid_dev = jnp.asarray(sid)
        else:
            sid_dev = rec["seq_ids"]
        t, k, p = rec["tkp"]
        self._sample_step += 1
        with self._phase("decode"):
            toks_dev, last_dev, self.caches = self._decode_multi_for(
                rec["mode"])(
                self.params, self.caches, rec["last"], sid_dev,
                jnp.asarray(positions), self._base_key,
                jnp.int32(self._sample_step), jnp.asarray(t),
                jnp.asarray(k), jnp.asarray(p))
        nxt = dict(rec, toks=toks_dev, last=last_dev, positions=positions,
                   active=live_ids, seq_ids=sid_dev,
                   reqs={i: rec["reqs"][i] for i in live_ids})
        self._inflight = nxt
        self._process_inflight(rec)
        return True

    def step(self) -> bool:
        """Admit, drive pending prefill chunks, one decode chunk."""
        self._admit()
        if self._inflight is not None:
            if self._try_pipeline():
                return True
            rec, self._inflight = self._inflight, None
            self._process_inflight(rec)
        with self._phase("prefill"):
            handled = (self._prefill_batch_pass()
                       if self._can_batch_prefill else set())
        # piggybacking: ONE pending slot's next chunk rides the decode
        # (or speculative) dispatch below instead of its own.  The fused
        # programs have no logit-controls stage, so any slot requesting
        # repetition_penalty / min_new_tokens keeps the separate path.
        from .sampling import uses_logit_controls
        ctl_live = uses_logit_controls(
            [s.req.sampling for s in self.slots if s.req is not None]) \
            or any(s.req is not None and s.req.logprobs
                   for s in self.slots)
        if self._spec_on:
            ready_now = [i for i, s in enumerate(self.slots) if s.ready]
            piggy = (self._pick_piggy(handled)
                     if self._spec_piggyback_ok and ready_now
                     and not ctl_live and self._spec_ok(ready_now)
                     else None)

        else:
            piggy = (self._pick_piggy(handled)
                     if self._piggyback_ok and not ctl_live else None)
        # one prefill chunk per remaining pending slot per step: decode of
        # running sequences is never starved more than one chunk's latency
        for i, s in enumerate(self.slots):
            if i in handled or i == piggy:
                continue
            if s.req is not None and s.pending:
                with self._phase("prefill"):
                    ok = self._prefill_step(i)
                if not ok:
                    break  # page stall; retry next step
        active = [i for i, s in enumerate(self.slots) if s.ready]
        busy = any(s.req is not None for s in self.slots)
        if not active and not busy and not self.waiting:
            return False
        if not active:
            return True
        if self._spec_on:
            if self._spec_ok(active):
                with self._phase("spec"):
                    self._spec_step(active, piggy=piggy)
                return True
            if piggy is not None:
                # a newly-readied top-k/top-p slot disabled spec for this
                # step after the piggy was picked: run the chunk through
                # the plain (draft-mirroring) prefill instead — the
                # target-only _piggy_decode would desync the draft cache
                with self._phase("prefill"):
                    self._prefill_step(piggy)
                piggy = None
        chunk = self.decode_chunk
        tokens = np.zeros((self.max_seqs,), np.int32)
        positions = np.zeros((self.max_seqs,), np.int32)
        # mid-prefill / empty slots decode against the scratch row
        seq_ids = np.full((self.max_seqs,), self.max_seqs, np.int32)
        for i, s in enumerate(self.slots):
            if s.ready:
                seq_ids[i] = i
                # pages for the whole chunk up front (writes happen
                # in-graph); on exhaustion preempt other slots until the
                # allocation fits (recompute-style, vLLM semantics)
                while True:
                    try:
                        self._ensure_pages(i, s.pos + chunk + 1)
                        break
                    except RuntimeError:
                        victims = [j for j, t in enumerate(self.slots)
                                   if t.req is not None and j != i]
                        if not victims:
                            raise RuntimeError(
                                "KV pool too small for a single sequence")
                        # youngest victim: cheapest recompute
                        v = min(victims,
                                key=lambda j: len(self.slots[j].req.output))
                        self._preempt(v)
                        if self.slots[i].req is None:
                            break
                if not s.ready:
                    seq_ids[i] = self.max_seqs
                    continue
                last = (s.req.output[-1] if s.req.output
                        else s.req.prompt[-1])
                tokens[i] = last
                positions[i] = s.pos
        # inactive slots write to scratch page 0 at positions 0..chunk-1
        piggy_live = (piggy is not None
                      and self.slots[piggy].req is not None
                      and self.slots[piggy].pending)
        lps = None
        if piggy_live:
            with self._phase("mixed"):
                toks = self._piggy_decode(piggy, tokens, seq_ids, positions)
        elif chunk == 1:
            with self._phase("decode"):
                logits, self.caches = self._decode(
                    self.params, self.caches, jnp.asarray(tokens),
                    jnp.asarray(seq_ids), jnp.asarray(positions))
                toks, lp1 = self._sample_rows(
                    logits, [s.req for s in self.slots])
                toks = toks[None, :]
                lps = lp1[None, :] if lp1 is not None else None
        else:
            t = np.zeros((self.max_seqs,), np.float32)
            k = np.zeros((self.max_seqs,), np.int32)
            p = np.ones((self.max_seqs,), np.float32)
            for i, s in enumerate(self.slots):
                if s.req is not None:
                    t[i] = s.req.sampling.temperature
                    k[i] = s.req.sampling.top_k
                    p[i] = s.req.sampling.top_p
            self._sample_step += 1
            mode = pick_sample_mode(
                [s.req.sampling for s in self.slots if s.req is not None])
            from .sampling import uses_logit_controls
            live = [s.req if s.ready else None for s in self.slots]
            ctl = (self._controls_arrays(live)
                   if uses_logit_controls([r.sampling for r in live
                                           if r is not None]) else ())
            need_lp = any(r is not None and r.logprobs for r in live)
            sid_dev = jnp.asarray(seq_ids)
            with self._phase("decode"):
                out = self._decode_multi_for(mode, bool(ctl), need_lp)(
                    self.params, self.caches, jnp.asarray(tokens),
                    sid_dev, jnp.asarray(positions),
                    self._base_key,
                    jnp.int32(self._sample_step), jnp.asarray(t),
                    jnp.asarray(k), jnp.asarray(p), *ctl)
                if (self._custom_decode_multi is not None
                        and not self._custom_returns_last):
                    last_dev = None
                    if need_lp:
                        toks_dev, lps_dev, self.caches = out
                        lps = np.asarray(lps_dev)        # (chunk, B)
                    else:
                        toks_dev, self.caches = out
                elif need_lp:
                    toks_dev, last_dev, lps_dev, self.caches = out
                    lps = np.asarray(lps_dev)            # (chunk, B)
                else:
                    toks_dev, last_dev, self.caches = out
                if (self._pipeline_ok and last_dev is not None
                        and not ctl and not need_lp):
                    # defer the fetch: the next step() overlaps it with
                    # the following chunk's device execution
                    self._inflight = dict(
                        toks=toks_dev, last=last_dev, active=list(active),
                        reqs={i: self.slots[i].req for i in active},
                        seq_ids=sid_dev, positions=positions.copy(),
                        tkp=(t, k, p), mode=mode)
                    return True
                toks = np.asarray(toks_dev)              # (chunk, B)
        self._apply_chunk(toks, lps, active, None)
        return True

    # ---------------- speculative decode phase ----------------

    def _spec_ok(self, active) -> bool:
        """Spec rounds preserve greedy/temperature sampling only; any
        active top-k/top-p/logit-controls request falls back to normal
        decode chunks (the accept rule scores raw target logits)."""
        for i in active:
            req = self.slots[i].req
            sp = req.sampling
            if (sp.top_k and sp.top_k > 0) or sp.top_p < 1.0 \
                    or sp.min_p > 0.0 \
                    or sp.repetition_penalty != 1.0 \
                    or sp.min_new_tokens > 0 or req.logprobs:
                return False
        return True

    def _spec_step(self, active, piggy: Optional[int] = None) -> None:
        """One dispatch of spec_rounds draft/verify rounds for all slots.

        With ``piggy`` set, that pending slot's prefill chunk (target +
        draft mirror + fixups + first-token sample) rides the same
        dispatch via spec_prefill_decode.
        """
        from .speculative import SpecState
        worst = self.spec_rounds * (self.spec_gamma + 1)
        prev = np.zeros((self.max_seqs,), np.int32)
        cur = np.zeros((self.max_seqs,), np.int32)
        positions = np.ones((self.max_seqs,), np.int32)
        seq_ids = np.full((self.max_seqs,), self.max_seqs, np.int32)
        for i in list(active):
            s = self.slots[i]
            while True:
                try:
                    self._ensure_pages(i, s.pos + worst + 1)
                    break
                except RuntimeError:
                    victims = [j for j, t in enumerate(self.slots)
                               if t.req is not None and j != i]
                    if not victims:
                        raise RuntimeError(
                            "KV pool too small for a single sequence")
                    v = min(victims,
                            key=lambda j: len(self.slots[j].req.output))
                    self._preempt(v)
                    if self.slots[i].req is None:
                        break
            if not s.ready:
                continue
            seq_ids[i] = i
            cur[i] = s.req.output[-1]
            prev[i] = (s.req.output[-2] if len(s.req.output) >= 2
                       else s.req.prompt[-1])
            positions[i] = s.pos
        temps = np.zeros((self.max_seqs,), np.float32)
        for i, s in enumerate(self.slots):
            if s.req is not None:
                temps[i] = s.req.sampling.temperature
        self._sample_step += 1
        if self._plookup:
            state = self._plookup_state(seq_ids, positions)
        else:
            state = SpecState(prev=jnp.asarray(prev), cur=jnp.asarray(cur),
                              positions=jnp.asarray(positions))
        key = jax.random.fold_in(self._base_key, self._sample_step)
        if piggy is not None and self.slots[piggy].req is not None \
                and self.slots[piggy].pending:
            slot = self.slots[piggy]
            pchunk = slot.pending[:self.prefill_chunk]
            n = len(pchunk)
            bucket = self._bucket(n)
            hist = slot.pos
            hist_gather = -(-hist // self.page_size) * self.page_size \
                if hist else 0
            hist_key = hist_gather if (
                hist_gather == 0 or jax.default_backend() == "cpu") else -1
            ptoks = np.zeros((1, bucket), np.int32)
            ptoks[0, :n] = pchunk
            sp = slot.req.sampling
            pmode = pick_sample_mode([sp])
            pargs = (jnp.asarray(ptoks), jnp.int32(piggy),
                     jnp.int32(hist), jnp.int32(n - 1),
                     jnp.int32(hist + n),
                     jnp.asarray([sp.temperature], np.float32),
                     jnp.asarray([sp.top_k], np.int32),
                     jnp.asarray([sp.top_p], np.float32),
                     state, jnp.asarray(seq_ids), key, jnp.asarray(temps))
            if self._plookup:
                ptok, emitted, n_emitted, _, self.caches = \
                    self._plookup_piggy_for(hist_key, pmode)(
                        self.params, self.caches, *pargs)
            else:
                ptok, emitted, n_emitted, _, self.caches, self.dcaches = \
                    self._spec_piggy_for(hist_key, pmode)(
                        self.params, self.draft_params, self.caches,
                        self.dcaches, *pargs)
            slot.pos = hist + n
            slot.pending = slot.pending[n:]
            self.prefill_tokens += n
            self._register_prefix(piggy)
            if not slot.pending:
                self.ttft.setdefault(
                    slot.req.req_id,
                    time.time() - self._t_submit[slot.req.req_id])
                self._emit(piggy, int(np.asarray(ptok)[0]))
        elif self._plookup:
            emitted, n_emitted, _, self.caches = self._plookup_multi(
                self.params, self.caches, state, jnp.asarray(seq_ids),
                key, jnp.asarray(temps))
        else:
            emitted, n_emitted, _, self.caches, self.dcaches = \
                self._spec_multi(
                    self.params, self.draft_params, self.caches,
                    self.dcaches, state, jnp.asarray(seq_ids), key,
                    jnp.asarray(temps))
        emitted = np.asarray(emitted)            # (rounds, B, gamma+1)
        n_emitted = np.asarray(n_emitted)        # (rounds, B)
        for r in range(emitted.shape[0]):
            for i in list(active):
                if not self.slots[i].ready:
                    continue
                n = int(n_emitted[r, i])
                self.spec_proposed += self.spec_gamma
                self.spec_accepted += n - 1
                for t in emitted[r, i, :n]:
                    # _emit may release the slot (eos/max_new_tokens);
                    # re-check the LIVE slot object, not a stale binding
                    if not self.slots[i].ready:
                        break
                    self.slots[i].pos += 1
                    self.decode_tokens += 1
                    self._emit(i, int(t))
        # device-side lengths ran ahead for finished/truncated slots; the
        # per-slot true lengths are authoritative
        live = [i for i in active if self.slots[i].ready]
        if live:
            self.caches = self._set_len_many(
                self.caches, jnp.asarray(live, jnp.int32),
                jnp.asarray([self.slots[i].pos for i in live], jnp.int32))
            if self.dcaches is not None:
                self.dcaches = self._set_len_many(
                    self.dcaches, jnp.asarray(live, jnp.int32),
                    jnp.asarray([self.slots[i].pos for i in live],
                                jnp.int32))

    def run(self, requests: List[Request]) -> List[Request]:
        for r in requests:
            self.submit(r)
        while self.step():
            pass
        return requests
