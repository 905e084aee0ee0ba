"""Automatic prefix caching: page-sharing semantics + engine behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micromix_tpu.models import ModelConfig, random_dense_params
from micromix_tpu.serve import Engine, Request
from micromix_tpu.serve.prefix_cache import PrefixBlockManager


def _cfg(**kw):
    base = dict(
        arch="llama", vocab_size=128, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=2, num_kv_heads=2, head_dim=64,
        rope_theta=10000.0, rms_eps=1e-6,
    )
    base.update(kw)
    return ModelConfig(**base)


# ---------------- PrefixBlockManager unit semantics ----------------


def test_prefix_manager_match_register_release():
    bm = PrefixBlockManager(n_pages=9, page_size=4, max_seqs=2,
                            max_pages_per_seq=4)
    toks = list(range(10))                       # 2 full pages + 2 tokens
    assert bm.match_and_attach(0, toks) == 0     # cold
    bm.ensure(0, 10)
    bm.register_prefix(0, toks, covered=10)      # registers pages 0,1
    pages0 = list(bm._pages[0])

    # same prefix, different tail: both full pages match
    toks2 = list(range(8)) + [99, 98, 97]
    m = bm.match_and_attach(1, toks2)
    assert m == 8
    assert bm._pages[1] == pages0[:2]            # physically shared
    assert bm._ref[pages0[0]] == 2

    # divergent second page: only the first page matches
    bm.release(1)
    toks3 = list(range(4)) + [50, 51, 52, 53, 1]
    assert bm.match_and_attach(1, toks3) == 4
    assert bm._pages[1] == pages0[:1]
    bm.release(1)

    # release keeps registered pages matchable (evictable, not freed)
    bm.release(0)
    assert bm.num_free == 8                      # all reclaimable
    assert bm.match_and_attach(0, toks) == 8     # still a hit


def test_prefix_manager_eviction_invalidates_chain():
    bm = PrefixBlockManager(n_pages=5, page_size=4, max_seqs=2,
                            max_pages_per_seq=4)
    toks = list(range(9))
    bm.match_and_attach(0, toks)
    bm.ensure(0, 9)                              # 3 pages
    bm.register_prefix(0, toks, covered=9)       # pages for chunks 0,1
    bm.release(0)

    # pool pressure: a 4-page allocation must evict cached pages
    other = [77] * 17
    assert bm.match_and_attach(1, other) == 0
    bm.ensure(1, 16)                             # needs all 4 pages
    # the old chain is gone (evicted root invalidates children too)
    bm.release(1)
    assert bm.match_and_attach(0, toks) == 0


def test_prefix_manager_all_or_nothing_exhaustion():
    bm = PrefixBlockManager(n_pages=3, page_size=4, max_seqs=2,
                            max_pages_per_seq=4)
    bm.ensure(0, 8)                              # both pages
    with pytest.raises(RuntimeError):
        bm.ensure(1, 4)
    assert bm.num_pages(1) == 0                  # state unchanged


# ---------------- engine behavior ----------------


def test_engine_prefix_cache_exact_replay(rng):
    """A second identical prompt hits the cache and reproduces the first
    request's greedy output BIT-EXACTLY: the prompt is sized so the cache
    match point (32, page-aligned) coincides with the warm request's own
    chunk boundary, making the hit's final prefill chunk the same program
    on the same operands."""
    cfg = _cfg()
    params = random_dense_params(cfg, seed=80)
    prompt = list(rng.integers(0, cfg.vocab_size, 33))

    eng = Engine(params, cfg, max_seqs=1, page_size=16, max_pages_per_seq=8,
                 prefill_buckets=(16, 32), decode_chunk=2,
                 prefix_cache=True)
    a = Request(req_id=0, prompt=list(prompt), max_new_tokens=6)
    eng.run([a])
    assert eng.prefix_hit_tokens == 0            # cold

    b = Request(req_id=1, prompt=list(prompt), max_new_tokens=6)
    eng.run([b])
    assert eng.prefix_hit_tokens == 32           # 2 pages served from cache
    assert b.output == a.output
    # the hit skipped most prefill work
    assert eng.prefill_tokens == len(prompt) + (len(prompt) - 32)


def test_engine_prefix_cache_mixed_prompts(rng):
    """Distinct prompts sharing a long prefix: the shared pages are hit,
    divergent tails are not; everything completes with correct lengths."""
    cfg = _cfg()
    params = random_dense_params(cfg, seed=81)
    shared = list(rng.integers(0, cfg.vocab_size, 32))
    eng = Engine(params, cfg, max_seqs=2, page_size=16, max_pages_per_seq=8,
                 prefill_buckets=(16, 32, 64), decode_chunk=2,
                 prefix_cache=True)
    r0 = Request(req_id=0, prompt=shared + [1, 2, 3], max_new_tokens=4)
    eng.run([r0])
    hits0 = eng.prefix_hit_tokens
    r1 = Request(req_id=1, prompt=shared + [9, 8, 7, 6], max_new_tokens=4)
    r2 = Request(req_id=2, prompt=list(rng.integers(0, cfg.vocab_size, 20)),
                 max_new_tokens=4)
    eng.run([r1, r2])
    assert eng.prefix_hit_tokens - hits0 == 32   # r1 shares 2 pages; r2 cold
    for r in (r0, r1, r2):
        assert r.done and len(r.output) == 4


def test_engine_prefix_cache_preemption_recovery(rng):
    """After a recompute preemption, re-admission recovers the evicted
    sequence's prefix from the cache instead of re-prefilling it all."""
    cfg = _cfg()
    params = random_dense_params(cfg, seed=82)
    prompts = [list(rng.integers(0, cfg.vocab_size, 17)) for _ in range(3)]

    def run(prefix_cache):
        eng = Engine(params, cfg, max_seqs=3, page_size=16,
                     max_pages_per_seq=4, n_pages=8,
                     prefill_buckets=(16, 32, 64), decode_chunk=2,
                     prefix_cache=prefix_cache)
        # decode growth crosses a page boundary (17+16 > 32), forcing a
        # recompute preemption under the tight pool
        reqs = [Request(req_id=i, prompt=list(p), max_new_tokens=16)
                for i, p in enumerate(prompts)]
        eng.run(reqs)
        return [r.output for r in reqs], eng

    out_nc, eng_nc = run(False)
    out_pc, eng_pc = run(True)
    assert eng_nc.preemptions > 0, "pool never exhausted; test is vacuous"
    for r_nc, r_pc in zip(out_nc, out_pc):
        assert len(r_nc) == len(r_pc) == 16
    if eng_pc.preemptions:
        assert eng_pc.prefix_hit_tokens > 0      # recovery used the cache


def test_engine_prefix_cache_with_speculative(rng):
    """Prefix caching composes with spec mode: the draft cache's shared
    pages hold the draft-model prefix KV (mirrored at the same physical
    ids), so a cache hit replays the warm request exactly."""
    cfg = _cfg()
    params = random_dense_params(cfg, seed=83)
    dcfg = _cfg(num_layers=1)
    dparams = {**random_dense_params(dcfg, seed=84)}
    dparams["layers"] = dparams["layers"][:1]
    prompt = list(rng.integers(0, cfg.vocab_size, 33))

    eng = Engine(params, cfg, max_seqs=1, page_size=16, max_pages_per_seq=8,
                 prefill_buckets=(16, 32), decode_chunk=2,
                 prefix_cache=True, draft_params=dparams, draft_cfg=dcfg,
                 spec_gamma=2, spec_rounds=1)
    a = Request(req_id=0, prompt=list(prompt), max_new_tokens=6)
    eng.run([a])
    b = Request(req_id=1, prompt=list(prompt), max_new_tokens=6)
    eng.run([b])
    assert eng.prefix_hit_tokens == 32
    assert eng.spec_proposed > 0
    assert b.output == a.output


def test_engine_prefix_cache_multi_turn_reuse(rng):
    """Generated-token pages register at release, so a follow-up turn
    whose prompt extends the finished conversation (prompt + output)
    hits pages beyond the original prompt."""
    cfg = _cfg()
    params = random_dense_params(cfg, seed=85)
    prompt = list(rng.integers(0, cfg.vocab_size, 30))

    eng = Engine(params, cfg, max_seqs=1, page_size=16, max_pages_per_seq=8,
                 prefill_buckets=(16, 32, 64), decode_chunk=2,
                 prefix_cache=True)
    a = Request(req_id=0, prompt=list(prompt), max_new_tokens=6)
    eng.run([a])
    # written K/V covers prompt + output[:-1] = 35 tokens -> 2 full pages
    turn2 = prompt + a.output + [5, 7]
    b = Request(req_id=1, prompt=turn2, max_new_tokens=4)
    eng.run([b])
    assert eng.prefix_hit_tokens == 32   # includes the output-covering page
    assert b.done and len(b.output) == 4
