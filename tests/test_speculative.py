"""Speculative decoding: verify-forward parity + acceptance-rule locks.

On a random tiny model the top logits cluster within ~0.02 while f32
reduction-order noise across differently-compiled programs is of the same
size, so exact cross-program greedy token equality is NOT a testable
property (measured: jit vs eager of the same verify flips an argmax).
What is locked instead:

  * ``verify_block`` logits match the plain decode chain at every
    position at the logit level (atol ≫ noise, ≪ real signal) — including
    across a rollback, which would expose stale-cache / position bugs,
  * every token the speculative loop emits is within-noise of the target
    argmax when teacher-forced through the plain decode chain — the
    operational definition of greedy decoding,
  * ``accept_tokens`` (pure function) is bit-exact on constructed
    distributions.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micromix_tpu.models import ModelConfig, random_dense_params
from micromix_tpu.serve.kv_cache import make_cache
from micromix_tpu.serve.runner import decode_step, prefill, verify_block
from micromix_tpu.serve.speculative import (
    SpecState, accept_tokens, spec_decode_multi)

ATOL = 0.05  # >> measured cross-program f32 noise (~0.02)


def _cfg(**kw):
    base = dict(
        arch="llama", vocab_size=96, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=2, num_kv_heads=2, head_dim=64,
        rope_theta=10000.0, rms_eps=1e-6,
    )
    base.update(kw)
    return ModelConfig(**base)


def _make_caches(cfg, b, n_pages_per_seq=8, page=16):
    caches = [make_cache(b * n_pages_per_seq + 1, page, cfg.num_kv_heads,
                         cfg.head_dim, b, n_pages_per_seq, bits=4)
              for _ in range(cfg.num_layers)]
    table = np.zeros((b, n_pages_per_seq), np.int32)
    for i in range(b):
        table[i] = np.arange(n_pages_per_seq) + i * n_pages_per_seq + 1
    return [dataclasses.replace(c, page_table=jnp.asarray(table))
            for c in caches]


def _prefill_all(params, cfg, caches, prompts):
    """Per-slot prefill; returns (caches, state) with cur = greedy next."""
    curs, prevs, poss = [], [], []
    for i, prompt in enumerate(prompts):
        toks = jnp.asarray([prompt], jnp.int32)
        logits, caches = prefill(params, cfg, caches, toks,
                                 jnp.int32(i), jnp.int32(0))
        curs.append(int(jnp.argmax(logits[0])))
        prevs.append(prompt[-1])
        poss.append(len(prompt))
    return caches, SpecState(prev=jnp.asarray(prevs, jnp.int32),
                             cur=jnp.asarray(curs, jnp.int32),
                             positions=jnp.asarray(poss, jnp.int32))


def _spec_stream(emitted, n_emitted):
    """Host-side slice of the per-round emitted tokens -> per-slot lists."""
    r, b, _ = emitted.shape
    streams = [[] for _ in range(b)]
    for i in range(r):
        for j in range(b):
            streams[j].extend(
                np.asarray(emitted[i, j, :int(n_emitted[i, j])]).tolist())
    return streams


def test_verify_block_matches_decode_chain(rng):
    """Teacher-forced verify logits == decode-chain logits at every
    position, including a second block after a partial-accept rollback."""
    cfg = _cfg()
    b = 2
    params = random_dense_params(cfg, seed=30)
    prompts = [list(rng.integers(0, cfg.vocab_size, 7)),
               list(rng.integers(0, cfg.vocab_size, 5))]
    seq_ids = jnp.arange(b, dtype=jnp.int32)

    # decode-chain reference logits, teacher-forced on its own argmaxes
    rc, rst = _prefill_all(params, cfg, _make_caches(cfg, b), prompts)
    toks, pos, c = rst.cur, rst.positions, rc
    chain_logits, chain_toks = [], []
    for _ in range(6):
        lg, c = decode_step(params, cfg, c, toks, seq_ids, pos)
        toks = jnp.argmax(lg, -1).astype(jnp.int32)
        chain_logits.append(np.asarray(lg))
        chain_toks.append(np.asarray(toks))
        pos = pos + 1
    chain_logits = np.stack(chain_logits, 1)      # (B, 6, V)
    chain_toks = np.stack(chain_toks, 1)          # (B, 6)

    # block 1: [cur, t1, t2] -> logits must match chain positions 0..2
    tc, st = _prefill_all(params, cfg, _make_caches(cfg, b), prompts)
    block1 = np.concatenate([np.asarray(st.cur)[:, None],
                             chain_toks[:, :2]], axis=1)
    tl1, tc = verify_block(params, cfg, tc, jnp.asarray(block1), seq_ids,
                           st.positions)
    np.testing.assert_allclose(np.asarray(tl1), chain_logits[:, :3],
                               atol=ATOL, rtol=0)

    # emulate a partial accept: roll back to keep only 2 of the 3
    # scored positions, then verify the NEXT block — any stale K/V from
    # the dropped position would corrupt these logits
    from micromix_tpu.serve.speculative import _set_lengths
    keep = 2
    new_pos = st.positions + keep
    tc = _set_lengths(tc, seq_ids, new_pos)
    block2 = np.concatenate([chain_toks[:, keep - 1][:, None],
                             chain_toks[:, keep:keep + 2]], axis=1)
    tl2, tc = verify_block(params, cfg, tc, jnp.asarray(block2), seq_ids,
                           new_pos)
    np.testing.assert_allclose(np.asarray(tl2),
                               chain_logits[:, keep - 1 + 1:keep + 3],
                               atol=ATOL, rtol=0)


@pytest.mark.parametrize("draft_seed", [30, 77])
def test_spec_stream_is_near_greedy(rng, draft_seed):
    """Every emitted token is within-noise of the target argmax when
    teacher-forced through the plain decode chain; identical draft (seed
    30) keeps the acceptance rate high."""
    cfg = _cfg()
    b, gamma, rounds = 2, 3, 4
    tparams = random_dense_params(cfg, seed=30)
    dparams = random_dense_params(cfg, seed=draft_seed)
    prompts = [list(rng.integers(0, cfg.vocab_size, 7)),
               list(rng.integers(0, cfg.vocab_size, 5))]
    seq_ids = jnp.arange(b, dtype=jnp.int32)

    tcaches, state = _prefill_all(tparams, cfg, _make_caches(cfg, b),
                                  prompts)
    dcaches, _ = _prefill_all(dparams, cfg, _make_caches(cfg, b), prompts)
    temps = jnp.zeros((b,))
    emitted, n_emitted, state2, _, _ = spec_decode_multi(
        tparams, dparams, cfg, cfg, tcaches, dcaches, state, seq_ids,
        jax.random.PRNGKey(0), temps, gamma=gamma, n_rounds=rounds)
    streams = _spec_stream(np.asarray(emitted), np.asarray(n_emitted))

    # teacher-force each slot's emitted stream through the decode chain
    rc, rst = _prefill_all(tparams, cfg, _make_caches(cfg, b), prompts)
    for j in range(b):
        toks = rst.cur[j][None]
        pos = rst.positions[j][None]
        c = rc
        for e in streams[j]:
            lg, c = decode_step(tparams, cfg, c, toks,
                                jnp.asarray([j], jnp.int32), pos)
            lg = np.asarray(lg[0])
            assert lg[e] >= lg.max() - ATOL, (j, e, int(np.argmax(lg)))
            toks = jnp.asarray([e], jnp.int32)
            pos = pos + 1

    total = np.asarray([len(s) for s in streams])
    assert (total >= rounds).all()
    np.testing.assert_array_equal(
        np.asarray(state2.positions),
        np.asarray(state.positions) + total)
    if draft_seed == 30:
        # identical draft: most proposals match (modulo f32 argmax flips)
        assert np.asarray(n_emitted).sum() >= 0.6 * rounds * b * (gamma + 1)


def test_accept_tokens_rule():
    """Unit math: identical dists accept everything; a zero-prob proposal
    rejects immediately and the fixup comes from the residual support."""
    b, gamma, v = 2, 3, 8
    key = jax.random.PRNGKey(1)
    temps = jnp.ones((b,))

    base = jax.nn.softmax(
        jnp.linspace(0.0, 1.0, v)[None, None, :]
        * jnp.ones((b, gamma + 1, 1)), axis=-1)
    proposed = jnp.full((b, gamma), int(jnp.argmax(base[0, 0])), jnp.int32)
    # draft == target -> accept prob exactly 1 for every proposal
    emitted, n_emitted, mask = accept_tokens(
        proposed, base[:, :gamma], jnp.log(base), key, temps)
    np.testing.assert_array_equal(np.asarray(n_emitted),
                                  np.full((b,), gamma + 1))

    # target gives ZERO prob to the proposed token -> immediate reject,
    # fixup must come from target support minus draft mass
    tlogits = jnp.full((b, gamma + 1, v), -1e30)
    tlogits = tlogits.at[:, :, 3].set(0.0)          # target: all mass on 3
    dprobs = jnp.zeros((b, gamma, v)).at[:, :, 5].set(1.0)  # draft: on 5
    proposed5 = jnp.full((b, gamma), 5, jnp.int32)
    emitted, n_emitted, mask = accept_tokens(proposed5, dprobs, tlogits,
                                             key, temps)
    np.testing.assert_array_equal(np.asarray(n_emitted), np.ones((b,)))
    np.testing.assert_array_equal(np.asarray(emitted[:, 0]),
                                  np.full((b,), 3))

    # greedy rows: acceptance is exact argmax equality, fixup = argmax
    tg = jnp.zeros((b,))
    rngl = np.random.default_rng(3)
    tl = jnp.asarray(rngl.normal(0, 1, (b, gamma + 1, v)), jnp.float32)
    tm = np.asarray(jnp.argmax(tl, -1))
    prop = jnp.asarray(np.stack([tm[:, 0], tm[:, 1],
                                 (tm[:, 2] + 1) % v], axis=1), jnp.int32)
    dpr = jax.nn.softmax(tl[:, :gamma], axis=-1)
    emitted, n_emitted, _ = accept_tokens(prop, dpr, tl, key, tg)
    np.testing.assert_array_equal(np.asarray(n_emitted),
                                  np.full((b,), 3))  # 2 accepts + fixup
    np.testing.assert_array_equal(np.asarray(emitted[:, 2]), tm[:, 2])


def test_greedy_rows_mixed_with_sampled_rows(rng):
    """temps mixes greedy (0) and sampled (>0) rows; both emit plausible
    near-greedy / in-support tokens and counts stay in [1, gamma+1]."""
    cfg = _cfg()
    b, gamma, rounds = 2, 2, 3
    tparams = random_dense_params(cfg, seed=40)
    dparams = random_dense_params(cfg, seed=41)
    prompts = [list(rng.integers(0, cfg.vocab_size, 6)) for _ in range(b)]
    seq_ids = jnp.arange(b, dtype=jnp.int32)

    tcaches, state = _prefill_all(tparams, cfg, _make_caches(cfg, b),
                                  prompts)
    dcaches, _ = _prefill_all(dparams, cfg, _make_caches(cfg, b), prompts)

    temps = jnp.asarray([0.0, 0.8])
    emitted, n_emitted, _, _, _ = spec_decode_multi(
        tparams, dparams, cfg, cfg, tcaches, dcaches, state, seq_ids,
        jax.random.PRNGKey(7), temps, gamma=gamma, n_rounds=rounds)
    counts = np.asarray(n_emitted)
    assert ((counts >= 1) & (counts <= gamma + 1)).all()

    # greedy row teacher-forced near-argmax check
    streams = _spec_stream(np.asarray(emitted), counts)
    rc, rst = _prefill_all(tparams, cfg, _make_caches(cfg, b), prompts)
    toks = rst.cur[0][None]
    pos = rst.positions[0][None]
    c = rc
    for e in streams[0]:
        lg, c = decode_step(tparams, cfg, c, toks,
                            jnp.asarray([0], jnp.int32), pos)
        lg = np.asarray(lg[0])
        assert lg[e] >= lg.max() - ATOL
        toks = jnp.asarray([e], jnp.int32)
        pos = pos + 1


def test_engine_speculative_mode(rng):
    """Engine with a draft model: completes exactly, tracks acceptance,
    and the emitted stream is near-greedy under teacher forcing."""
    from micromix_tpu.serve import Engine, Request

    cfg = _cfg()
    tparams = random_dense_params(cfg, seed=30)
    dcfg = _cfg(num_layers=1)
    dparams = random_dense_params(dcfg, seed=31)
    dparams["layers"] = dparams["layers"][:1]

    eng = Engine(tparams, cfg, max_seqs=2, page_size=16,
                 max_pages_per_seq=8, prefill_buckets=(16, 32),
                 draft_params=dparams, draft_cfg=dcfg, spec_gamma=2,
                 spec_rounds=2)
    prompts = [list(rng.integers(0, cfg.vocab_size, 6)),
               list(rng.integers(0, cfg.vocab_size, 9))]
    reqs = [Request(req_id=i, prompt=p, max_new_tokens=7)
            for i, p in enumerate(prompts)]
    eng.run(reqs)
    for r in reqs:
        assert r.done and len(r.output) == 7, r
    assert eng.spec_proposed > 0
    assert 0 <= eng.spec_accepted <= eng.spec_proposed

    # teacher-forced near-argmax check of each full output stream
    for j, r in enumerate(reqs):
        caches = _make_caches(cfg, 2)
        logits, caches = prefill(tparams, cfg, caches,
                                 jnp.asarray([r.prompt], jnp.int32),
                                 jnp.int32(j), jnp.int32(0))
        lg = np.asarray(logits[0])
        assert lg[r.output[0]] >= lg.max() - ATOL
        toks = jnp.asarray([r.output[0]], jnp.int32)
        pos = jnp.asarray([len(r.prompt)], jnp.int32)
        for e in r.output[1:]:
            lgs, caches = decode_step(tparams, cfg, caches, toks,
                                      jnp.asarray([j], jnp.int32), pos)
            lg = np.asarray(lgs[0])
            assert lg[e] >= lg.max() - ATOL, (r.output, e, int(lg.argmax()))
            toks = jnp.asarray([e], jnp.int32)
            pos = pos + 1


def test_engine_spec_with_chunked_and_batched_prefill(rng):
    """Spec mode now composes with chunked AND batched prefill: every
    target prefill dispatch is mirrored into the draft cache, so the
    draft sees exactly the chunked token stream the target saw.  The
    emitted streams must still be near-greedy under teacher forcing."""
    from micromix_tpu.serve import Engine, Request

    cfg = _cfg()
    tparams = random_dense_params(cfg, seed=40)
    dcfg = _cfg(num_layers=1)
    dparams = {**random_dense_params(dcfg, seed=41)}
    dparams["layers"] = dparams["layers"][:1]

    eng = Engine(tparams, cfg, max_seqs=3, page_size=16,
                 max_pages_per_seq=8, prefill_buckets=(16, 32),
                 prefill_chunk=16,            # chunked prefill stays on
                 draft_params=dparams, draft_cfg=dcfg, spec_gamma=2,
                 spec_rounds=2)
    prompts = [list(rng.integers(0, cfg.vocab_size, 40)),  # 3 chunks
               list(rng.integers(0, cfg.vocab_size, 9)),   # batched pair
               list(rng.integers(0, cfg.vocab_size, 11))]
    reqs = [Request(req_id=i, prompt=p, max_new_tokens=6)
            for i, p in enumerate(prompts)]
    eng.run(reqs)
    for r in reqs:
        assert r.done and len(r.output) == 6, r
    assert eng.spec_proposed > 0
    # the mirrored draft cache kept the same lengths as the target cache
    np.testing.assert_array_equal(np.asarray(eng.caches[0].lengths),
                                  np.asarray(eng.dcaches[0].lengths))

    # teacher-forced near-argmax check of each full output stream
    for j, r in enumerate(reqs):
        caches = _make_caches(cfg, 3)
        logits, caches = prefill(tparams, cfg, caches,
                                 jnp.asarray([r.prompt], jnp.int32),
                                 jnp.int32(j), jnp.int32(0))
        lg = np.asarray(logits[0])
        assert lg[r.output[0]] >= lg.max() - ATOL
        toks = jnp.asarray([r.output[0]], jnp.int32)
        pos = jnp.asarray([len(r.prompt)], jnp.int32)
        for e in r.output[1:]:
            lgs, caches = decode_step(tparams, cfg, caches, toks,
                                      jnp.asarray([j], jnp.int32), pos)
            lg = np.asarray(lgs[0])
            assert lg[e] >= lg.max() - ATOL, (r.output, e, int(lg.argmax()))
            toks = jnp.asarray([e], jnp.int32)
            pos = pos + 1


def test_engine_spec_piggyback_mixed_load(rng):
    """Spec-mode piggybacking: a pending slot's prefill chunk rides the
    speculative dispatch (spec_prefill_decode).  Greedy streams must
    exactly match the piggyback-off engine — the fused program processes
    the same tokens in the same order, just in one dispatch."""
    from micromix_tpu.serve import Engine, Request

    cfg = _cfg()
    tparams = random_dense_params(cfg, seed=50)
    dcfg = _cfg(num_layers=1)
    dparams = {**random_dense_params(dcfg, seed=51)}
    dparams["layers"] = dparams["layers"][:1]

    def build(piggyback):
        return Engine(tparams, cfg, max_seqs=2, page_size=16,
                      max_pages_per_seq=8, prefill_buckets=(16, 32),
                      prefill_chunk=16, draft_params=dparams,
                      draft_cfg=dcfg, spec_gamma=2, spec_rounds=1,
                      piggyback=piggyback)

    def reqs():
        r = np.random.default_rng(7)
        # short prompt decodes while the 40-token prompt still prefills
        return [Request(req_id=0, prompt=list(r.integers(0, cfg.vocab_size,
                                                         6)),
                        max_new_tokens=8),
                Request(req_id=1, prompt=list(r.integers(0, cfg.vocab_size,
                                                         40)),
                        max_new_tokens=4)]

    eng_on = build(True)
    out_on = [r.output for r in eng_on.run(reqs())]
    assert eng_on._spec_piggy_cache, "fused spec piggyback program unused"
    assert eng_on.spec_proposed > 0
    # the draft cache mirrored every piggybacked chunk
    np.testing.assert_array_equal(np.asarray(eng_on.caches[0].lengths),
                                  np.asarray(eng_on.dcaches[0].lengths))

    eng_off = build(False)
    out_off = [r.output for r in eng_off.run(reqs())]
    assert not eng_off._spec_piggy_cache
    assert out_on == out_off


def test_engine_spec_piggyback_topk_piggy(rng):
    """A top-k piggy rides the spec dispatch through the per-mode
    first-token sampler: with top_k=1 (argmax) its whole stream equals
    the same request run greedily, while the other slot keeps
    speculating."""
    from micromix_tpu.serve import Engine, Request
    from micromix_tpu.serve.sampling import SamplingParams

    cfg = _cfg()
    tparams = random_dense_params(cfg, seed=55)
    dcfg = _cfg(num_layers=1)
    dparams = {**random_dense_params(dcfg, seed=56)}
    dparams["layers"] = dparams["layers"][:1]

    def build():
        return Engine(tparams, cfg, max_seqs=2, page_size=16,
                      max_pages_per_seq=8, prefill_buckets=(16, 32),
                      prefill_chunk=16, draft_params=dparams,
                      draft_cfg=dcfg, spec_gamma=2, spec_rounds=1)

    pa = list(np.random.default_rng(3).integers(0, cfg.vocab_size, 6))
    pb = list(np.random.default_rng(4).integers(0, cfg.vocab_size, 40))

    def run(sampling_b):
        eng = build()
        ra = Request(req_id=0, prompt=list(pa), max_new_tokens=8)
        eng.submit(ra)
        eng.step()                     # A prefills + starts speculating
        rb = Request(req_id=1, prompt=list(pb), max_new_tokens=4,
                     sampling=sampling_b)
        eng.submit(rb)
        while eng.step():
            pass
        return ra, rb, eng

    ra1, rb1, eng1 = run(SamplingParams(temperature=1.0, top_k=1))
    assert any(k[1] == "topk" for k in eng1._spec_piggy_cache), \
        "top-k piggy never rode the spec dispatch"
    ra2, rb2, _ = run(SamplingParams())          # greedy reference
    assert rb1.output == rb2.output
    assert ra1.output == ra2.output


def test_truncated_stack_draft_acceptance(rng):
    """VERDICT r4 missing #4: a truncated-stack draft (first N target
    layers + the shared lm_head) must show GENUINE draft/target
    correlation even on random weights — acceptance well above the
    ~0.002 independent-random-draft floor (docs/perf_notes.md r2), and
    increasing with draft depth.  Absolute rates on random weights stay
    low (each random layer is a chaotic map); real-checkpoint rates
    (0.7-0.9 in the literature) remain weights-blocked — recorded as
    such in docs/perf_notes.md."""
    import dataclasses

    from micromix_tpu.models import (
        ModelConfig, default_calibration, quantize_model,
        random_dense_params)
    from micromix_tpu.serve import Engine, Request

    cfg = ModelConfig(arch="llama", vocab_size=256, hidden_size=256,
                      intermediate_size=512, num_layers=4, num_heads=2,
                      num_kv_heads=2, head_dim=128, rope_theta=1e4,
                      rms_eps=1e-5)
    qp = quantize_model(random_dense_params(cfg, seed=5), cfg,
                        default_calibration(cfg, 64, 64))
    arng = np.random.default_rng(3)

    def acceptance(dl):
        dcfg = dataclasses.replace(cfg, num_layers=dl)
        dparams = {**qp, "layers": qp["layers"][:dl]}
        eng = Engine(qp, cfg, max_seqs=2, page_size=16,
                     max_pages_per_seq=8, prefill_buckets=(16,),
                     draft_params=dparams, draft_cfg=dcfg,
                     spec_gamma=4, spec_rounds=2)
        reqs = [Request(req_id=i, prompt=list(arng.integers(0, 256, 8)),
                        max_new_tokens=24) for i in range(2)]
        eng.run(reqs)
        assert eng.spec_proposed > 0
        return eng.spec_accepted / eng.spec_proposed

    shallow = acceptance(1)     # measured 0.030 (2026-08-20)
    deep = acceptance(3)        # measured 0.121
    assert shallow > 0.005, shallow   # >> the 0.002 independent floor
    assert deep > shallow, (deep, shallow)
