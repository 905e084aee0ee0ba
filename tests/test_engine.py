"""Continuous-batching engine: correctness vs the full-forward reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micromix_tpu.models import (
    ModelConfig,
    forward,
    random_dense_params,
)
from micromix_tpu.serve import Engine, Request
from micromix_tpu.serve.sampling import SamplingParams, sample


def _cfg(**kw):
    base = dict(
        arch="llama", vocab_size=128, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=2, num_kv_heads=2, head_dim=64,
        rope_theta=10000.0, rms_eps=1e-6,
    )
    base.update(kw)
    return ModelConfig(**base)


def test_engine_first_token_matches_forward(rng):
    cfg = _cfg()
    params = random_dense_params(cfg, seed=20)
    prompt = list(rng.integers(0, cfg.vocab_size, 12))
    eng = Engine(params, cfg, max_seqs=2, page_size=16,
                 max_pages_per_seq=8, prefill_buckets=(16, 32))
    req = Request(req_id=0, prompt=prompt, max_new_tokens=1)
    eng.run([req])
    # prefill attention is unquantized -> first token == plain forward argmax
    logits = forward(params, cfg, jnp.asarray([prompt], jnp.int32))
    want = int(jnp.argmax(logits[0, len(prompt) - 1]))
    assert req.output == [want]


def test_engine_decode_matches_kv_fakequant_forward(rng):
    """Decode-step logits over the int4 paged cache must match the
    accuracy-mode forward (kv_quant_bits=4) on the same token history —
    same quantization semantics, so only f32 accumulation-order noise
    remains (greedy tokens can still flip on a random model whose top
    logits are clustered, hence the logit-level comparison)."""
    import dataclasses
    from micromix_tpu.serve.kv_cache import make_cache
    from micromix_tpu.serve.runner import decode_step, prefill

    cfg = _cfg()
    params = random_dense_params(cfg, seed=21)
    prompt = list(rng.integers(0, cfg.vocab_size, 10))

    caches = [make_cache(17, 16, cfg.num_kv_heads, cfg.head_dim, 2, 8,
                         bits=4) for _ in range(cfg.num_layers)]
    row = jnp.asarray([1, 2, 0, 0, 0, 0, 0, 0], jnp.int32)
    caches = [dataclasses.replace(c, page_table=c.page_table.at[0].set(row))
              for c in caches]
    toks = np.zeros((1, 16), np.int32)
    toks[0, :10] = prompt
    logits, caches = prefill(params, cfg, caches, jnp.asarray(toks),
                             jnp.int32(0), jnp.int32(0), jnp.int32(9))
    caches = [dataclasses.replace(c, lengths=c.lengths.at[0].set(10))
              for c in caches]
    t0 = int(jnp.argmax(logits[0]))

    lg, caches = decode_step(params, cfg, caches,
                             jnp.asarray([t0], jnp.int32),
                             jnp.asarray([0], jnp.int32),
                             jnp.asarray([10], jnp.int32))
    ref = forward(params, cfg, jnp.asarray([prompt + [t0]], jnp.int32),
                  kv_quant_bits=4)
    a = np.asarray(lg[0], np.float32)
    b = np.asarray(ref[0, -1], np.float32)
    assert np.corrcoef(a, b)[0, 1] > 0.99
    np.testing.assert_allclose(a, b, atol=0.15, rtol=0.1)


def test_engine_multi_request_interleaving(rng):
    cfg = _cfg()
    params = random_dense_params(cfg, seed=22)
    eng = Engine(params, cfg, max_seqs=2, page_size=16,
                 max_pages_per_seq=8, prefill_buckets=(16,))
    reqs = [
        Request(req_id=i, prompt=list(rng.integers(0, cfg.vocab_size,
                                                   6 + 3 * i)),
                max_new_tokens=3 + i)
        for i in range(4)  # more requests than slots -> queueing
    ]
    eng.run(reqs)
    for r in reqs:
        assert r.done and len(r.output) == r.max_new_tokens
        assert all(0 <= t < cfg.vocab_size for t in r.output)
    assert eng.decode_tokens > 0 and eng.prefill_tokens == sum(
        len(r.prompt) for r in reqs)
    # all pages returned after completion
    assert eng.block_manager.num_free == eng.block_manager.n_pages - 1
    assert all(s.req is None for s in eng.slots)


def test_sampling_modes(rng):
    logits = jnp.asarray(rng.normal(0, 3, (2, 64)), jnp.float32)
    key = jax.random.PRNGKey(0)
    greedy = sample(logits, key, SamplingParams(temperature=0.0))
    np.testing.assert_array_equal(np.asarray(greedy),
                                  np.asarray(jnp.argmax(logits, -1)))
    topk = sample(logits, key, SamplingParams(temperature=1.0, top_k=5))
    top5 = np.argsort(np.asarray(logits), axis=-1)[:, -5:]
    for i in range(2):
        assert int(topk[i]) in top5[i]
    topp = sample(logits, key, SamplingParams(temperature=1.0, top_p=0.5))
    assert topp.shape == (2,)


def test_chunked_decode_matches_single_step(rng):
    """Greedy generation is identical for decode_chunk=1 and chunk=4."""
    cfg = _cfg()
    params = random_dense_params(cfg, seed=7)
    prompts = [list(rng.integers(0, cfg.vocab_size, n)) for n in (5, 9)]

    def gen(chunk):
        eng = Engine(params, cfg, max_seqs=2, page_size=16,
                     max_pages_per_seq=8, prefill_buckets=(16,),
                     decode_chunk=chunk)
        reqs = [Request(req_id=i, prompt=p, max_new_tokens=6)
                for i, p in enumerate(prompts)]
        eng.run(reqs)
        return [r.output for r in reqs]

    assert gen(1) == gen(4)


def test_preemption_on_page_exhaustion(rng):
    """Tiny page pool forces eviction; all requests still finish correctly
    via recompute re-admission (greedy outputs match a roomy engine)."""
    cfg = _cfg()
    params = random_dense_params(cfg, seed=9)
    prompts = [list(rng.integers(0, cfg.vocab_size, 10)) for _ in range(3)]

    def gen(n_pages):
        eng = Engine(params, cfg, max_seqs=3, page_size=16,
                     max_pages_per_seq=4, n_pages=n_pages,
                     prefill_buckets=(16, 32, 64), decode_chunk=2)
        reqs = [Request(req_id=i, prompt=p, max_new_tokens=12)
                for i, p in enumerate(prompts)]
        eng.run(reqs)
        return [r.output for r in reqs], eng

    tight_out, tight = gen(5)    # 4 usable pages; 3 seqs need 2 each
    roomy_out, roomy = gen(13)
    assert tight.preemptions > 0, "pool was never exhausted; test is vacuous"
    assert roomy.preemptions == 0
    assert tight_out == roomy_out


def test_engine_mixtral_moe(rng):
    """Continuous batching over a quantized Mixtral (MoE decode path)."""
    from micromix_tpu.models import default_calibration, quantize_model

    cfg = ModelConfig(arch="mixtral", vocab_size=64, hidden_size=128,
                      intermediate_size=256, num_layers=2, num_heads=4,
                      num_kv_heads=2, head_dim=32, rope_theta=10000.0,
                      rms_eps=1e-6, num_experts=4, num_experts_per_tok=2)
    params = quantize_model(
        random_dense_params(cfg, seed=30), cfg,
        default_calibration(cfg, p6=32, p8=32, seed=30))
    eng = Engine(params, cfg, max_seqs=2, page_size=16, max_pages_per_seq=4,
                 prefill_buckets=(16,), decode_chunk=2)
    reqs = [Request(req_id=i, prompt=list(rng.integers(0, 64, 6)),
                    max_new_tokens=4) for i in range(2)]
    eng.run(reqs)
    assert all(r.done and len(r.output) == 4 for r in reqs)
    assert all(0 <= t < 64 for r in reqs for t in r.output)


def test_engine_mixtral_capacity_dispatch(rng):
    """MoE serving with fixed-capacity dispatch: generous capacity matches
    the dense-dispatch engine's greedy outputs token for token."""
    import dataclasses
    from micromix_tpu.models import default_calibration, quantize_model

    cfg = ModelConfig(arch="mixtral", vocab_size=64, hidden_size=128,
                      intermediate_size=256, num_layers=2, num_heads=4,
                      num_kv_heads=2, head_dim=32, rope_theta=10000.0,
                      rms_eps=1e-6, num_experts=4, num_experts_per_tok=2)
    params = quantize_model(
        random_dense_params(cfg, seed=31), cfg,
        default_calibration(cfg, p6=32, p8=32, seed=31))
    prompts = [list(rng.integers(0, 64, 6)) for _ in range(2)]

    def run(c):
        eng = Engine(params, c, max_seqs=2, page_size=16,
                     max_pages_per_seq=4, prefill_buckets=(16,),
                     decode_chunk=2)
        reqs = [Request(req_id=i, prompt=list(p), max_new_tokens=4)
                for i, p in enumerate(prompts)]
        eng.run(reqs)
        return [r.output for r in reqs]

    dense_out = run(cfg)
    cap_cfg = dataclasses.replace(cfg, moe_capacity_factor=2.0)  # = E/top_k
    assert run(cap_cfg) == dense_out


def test_engine_qwen2_sliding_window(rng):
    """Qwen2 shape: qkv bias + sliding window through prefill and decode."""
    from micromix_tpu.models import default_calibration, quantize_model

    cfg = ModelConfig(arch="qwen2", vocab_size=64, hidden_size=128,
                      intermediate_size=256, num_layers=2, num_heads=4,
                      num_kv_heads=2, head_dim=32, rope_theta=10000.0,
                      rms_eps=1e-6, qkv_bias=True, sliding_window=24)
    params = quantize_model(
        random_dense_params(cfg, seed=31), cfg,
        default_calibration(cfg, p6=0, p8=0))
    eng = Engine(params, cfg, max_seqs=2, page_size=16, max_pages_per_seq=4,
                 prefill_buckets=(16, 32), decode_chunk=2)
    reqs = [Request(req_id=i, prompt=list(rng.integers(0, 64, 20)),
                    max_new_tokens=16) for i in range(2)]  # crosses window
    eng.run(reqs)
    assert all(r.done and len(r.output) == 16 for r in reqs)


def test_chunked_prefill_matches_single_shot(rng):
    """Prompt longer than the largest bucket streams through in chunks and
    (with a dense bf16 KV cache, so gathered history is exact) produces the
    same greedy output as a single-shot prefill with a big bucket."""
    cfg = _cfg()
    params = random_dense_params(cfg, seed=40)
    prompt = list(rng.integers(0, cfg.vocab_size, 40))

    def gen(buckets, chunk):
        eng = Engine(params, cfg, max_seqs=1, page_size=16,
                     max_pages_per_seq=8, prefill_buckets=buckets,
                     decode_chunk=2, prefill_chunk=chunk, kv_bits=16)
        req = Request(req_id=0, prompt=prompt, max_new_tokens=4)
        eng.run([req])
        return req.output

    single = gen((64,), 64)          # whole prompt in one prefill
    chunked = gen((16,), 16)         # 40 tokens -> 16 + 16 + 8
    assert single == chunked


def test_chunked_prefill_int4_kv(rng):
    """Chunked prefill over the quantized cache: valid completion, correct
    bookkeeping (prompt longer than the largest bucket previously raised)."""
    cfg = _cfg()
    params = random_dense_params(cfg, seed=41)
    eng = Engine(params, cfg, max_seqs=2, page_size=16, max_pages_per_seq=8,
                 prefill_buckets=(16,), decode_chunk=2)
    reqs = [Request(req_id=i, prompt=list(rng.integers(0, cfg.vocab_size,
                                                       30 + i)),
                    max_new_tokens=4) for i in range(2)]
    eng.run(reqs)
    assert all(r.done and len(r.output) == 4 for r in reqs)
    assert eng.prefill_tokens == sum(30 + i for i in range(2))


def test_sample_batch_modes(rng):
    """Mode-specialized samplers agree with the full path where defined."""
    from micromix_tpu.serve.sampling import pick_sample_mode, sample_batch

    logits = jnp.asarray(rng.normal(0, 3, (4, 256)), jnp.float32)
    key = jax.random.PRNGKey(1)
    temps0 = jnp.zeros((4,))
    z = jnp.zeros((4,), jnp.int32)
    ones = jnp.ones((4,))
    # greedy identical across all modes
    outs = [np.asarray(sample_batch(logits, key, temps0, z, ones, mode=m))
            for m in ("greedy", "simple", "topk", "full")]
    for o in outs[1:]:
        np.testing.assert_array_equal(outs[0], o)
    # topk mode: draws land inside the top-k set
    k = jnp.full((4,), 5, jnp.int32)
    draws = np.asarray(sample_batch(logits, key, ones, k, ones, mode="topk"))
    top5 = np.argsort(np.asarray(logits), axis=-1)[:, -5:]
    for i in range(4):
        assert draws[i] in top5[i]
    # topk mode, mixed batch: a top_k=0 row keeps the FULL distribution
    # (regression: it used to inherit the kmax-th-logit threshold, clipping
    # pure temperature sampling to the top _TOPK_WIDTH logits)
    k_mixed = jnp.asarray([5, 0, 5, 0], jnp.int32)
    spread = jnp.broadcast_to(jnp.linspace(-1.0, 1.0, 256), (4, 256))
    kth = float(np.sort(np.asarray(spread)[1])[-128])  # 128th-best logit
    many = [np.asarray(sample_batch(
        spread, jax.random.PRNGKey(s), jnp.full((4,), 100.0),
        k_mixed, ones, mode="topk")) for s in range(40)]
    # at T=100 the top_k=0 row is near-uniform over all 256 tokens: ~50%
    # of draws land below the 128th logit, which the old clip forbade
    assert any(float(spread[1, int(d[1])]) < kth for d in many), \
        "top_k=0 row must be able to draw below the _TOPK_WIDTH-th logit"
    # top_k=5 rows in the same batch stay filtered
    top5 = set(np.argsort(np.asarray(spread)[0])[-5:].tolist())
    assert all(int(d[0]) in top5 for d in many)
    # mode picker
    gp = SamplingParams()
    assert pick_sample_mode([gp]) == "greedy"   # all rows temperature<=0
    assert pick_sample_mode([gp, SamplingParams(temperature=0.7)]) == \
        "simple"
    assert pick_sample_mode([SamplingParams(temperature=1.0, top_k=5)]) == \
        "topk"
    assert pick_sample_mode([SamplingParams(temperature=1.0, top_p=0.9)]) == \
        "full"
    assert pick_sample_mode(
        [SamplingParams(temperature=1.0, top_k=4096)]) == "full"


def test_batched_multi_slot_prefill(rng):
    """Several waiting fresh prompts prefill in one dispatch and produce
    the same outputs as sequential engines (greedy determinism)."""
    from micromix_tpu.models import default_calibration, quantize_model

    cfg = ModelConfig(arch="llama", vocab_size=64, hidden_size=128,
                      intermediate_size=256, num_layers=2, num_heads=4,
                      num_kv_heads=2, head_dim=32, rope_theta=10000.0,
                      rms_eps=1e-6)
    params = quantize_model(
        random_dense_params(cfg, seed=40), cfg,
        default_calibration(cfg, p6=0, p8=0, seed=40))
    prompts = [list(rng.integers(0, 64, 5 + i)) for i in range(3)]

    eng = Engine(params, cfg, max_seqs=4, page_size=16, max_pages_per_seq=4,
                 prefill_buckets=(16,), decode_chunk=2)
    assert eng._can_batch_prefill
    reqs = [Request(req_id=i, prompt=list(p), max_new_tokens=4)
            for i, p in enumerate(prompts)]
    for r in reqs:
        eng.submit(r)
    # first step admits all three and must batch them into one prefill
    eng.step()
    assert eng._prefill_batch_cache, "batched prefill program not built"
    assert all(not s.pending for s in eng.slots if s.req is not None)
    while eng.step():
        pass
    batched_out = [r.output for r in reqs]
    assert all(len(o) == 4 for o in batched_out)

    # reference: one-at-a-time engines (no batching possible)
    for i, p in enumerate(prompts):
        e1 = Engine(params, cfg, max_seqs=4, page_size=16,
                    max_pages_per_seq=4, prefill_buckets=(16,),
                    decode_chunk=2)
        r = Request(req_id=0, prompt=list(p), max_new_tokens=4)
        e1.run([r])
        assert r.output == batched_out[i], f"prompt {i} diverged"


def test_router_spreads_and_matches_single_engine(rng):
    """Least-loaded routing over replicas; greedy outputs identical to a
    lone engine (replicas are independent, so per-request results are
    placement-invariant)."""
    from micromix_tpu.serve import Router

    cfg = _cfg()
    params = random_dense_params(cfg, seed=33)

    def mk_engine():
        return Engine(params, cfg, max_seqs=1, page_size=16,
                      max_pages_per_seq=8, prefill_buckets=(16,),
                      decode_chunk=2)

    prompts = [list(rng.integers(0, cfg.vocab_size, 6 + i))
               for i in range(4)]
    router = Router([mk_engine(), mk_engine()])
    reqs = [Request(req_id=i, prompt=list(p), max_new_tokens=4)
            for i, p in enumerate(prompts)]
    router.run(reqs)
    assert all(r.done and len(r.output) == 4 for r in reqs)
    # both replicas took work (4 requests, 1 slot each)
    assert all(n > 0 for n in router.stats["assigned"])
    # cancel finds the owning replica (already-finished -> False)
    assert router.cancel(reqs[0].req_id) is False
    extra = Request(req_id=9, prompt=list(prompts[0]), max_new_tokens=4)
    router.submit(extra)
    assert router.cancel(9) is True and extra.output == []

    for i, p in enumerate(prompts):
        solo = mk_engine()
        r = Request(req_id=0, prompt=list(p), max_new_tokens=4)
        solo.run([r])
        assert r.output == reqs[i].output, f"request {i} diverged"


def test_piggybacked_prefill_matches_plain(rng):
    """Folding a prefill chunk into the decode dispatch (prefill_decode)
    must not change any emitted token vs the separate-dispatch path."""
    cfg = _cfg()
    params = random_dense_params(cfg, seed=33)
    pa = list(rng.integers(0, cfg.vocab_size, 10))
    pb = list(rng.integers(0, cfg.vocab_size, 40))  # 3 chunks at chunk=16
    outs = {}
    for piggy in (True, False):
        eng = Engine(params, cfg, max_seqs=2, page_size=16,
                     max_pages_per_seq=8, prefill_buckets=(16, 32),
                     prefill_chunk=16, decode_chunk=2, piggyback=piggy)
        ra = Request(req_id=0, prompt=pa, max_new_tokens=8)
        eng.submit(ra)
        eng.step()  # A prefills and starts decoding
        rb = Request(req_id=1, prompt=pb, max_new_tokens=8)
        eng.submit(rb)
        while eng.step():
            pass
        outs[piggy] = (list(ra.output), list(rb.output))
        if piggy:
            assert eng._piggyback_cache, "fused path never dispatched"
    assert outs[True] == outs[False]
    assert len(outs[True][0]) == 8 and len(outs[True][1]) == 8


def test_engine_streaming_and_cancel(rng):
    """on_token streams every emitted token in order; cancel aborts a
    queued request before it runs and a running request mid-flight while
    the remaining requests complete normally."""
    cfg = _cfg()
    params = random_dense_params(cfg, seed=60)
    eng = Engine(params, cfg, max_seqs=1, page_size=16,
                 max_pages_per_seq=8, prefill_buckets=(16,),
                 decode_chunk=2)

    streamed = []
    r0 = Request(req_id=0, prompt=list(rng.integers(0, cfg.vocab_size, 5)),
                 max_new_tokens=6, on_token=streamed.append)
    # max_seqs=1 keeps r1/r2 queued while r0 runs
    r1 = Request(req_id=1, prompt=list(rng.integers(0, cfg.vocab_size, 7)),
                 max_new_tokens=6)
    r2 = Request(req_id=2, prompt=list(rng.integers(0, cfg.vocab_size, 4)),
                 max_new_tokens=6)
    for r in (r0, r1, r2):
        eng.submit(r)
    assert eng.cancel(1) is True          # cancel while queued
    assert eng.cancel(99) is False        # unknown id
    eng.step()                            # r0 prefills + first decode chunk
    assert 0 < len(r0.output) < 6
    assert streamed == r0.output          # streamed as produced, in order
    assert eng.cancel(0) is True          # cancel mid-flight
    assert r0.done and len(r0.output) < 6
    while eng.step():
        pass
    assert r1.done and r1.output == []    # never ran
    assert r2.done and len(r2.output) == 6
    assert streamed == r0.output          # no tokens after cancellation


def test_engine_stop_ids(rng):
    """stop_ids terminate generation like eos_id; deterministic via a
    greedy run observed first, then re-run with its 3rd token as a stop."""
    cfg = _cfg()
    params = random_dense_params(cfg, seed=61)
    prompt = list(rng.integers(0, cfg.vocab_size, 9))

    probe = Request(req_id=0, prompt=list(prompt), max_new_tokens=6)
    Engine(params, cfg, max_seqs=1, page_size=16, max_pages_per_seq=8,
           prefill_buckets=(16,), decode_chunk=2).run([probe])
    assert len(probe.output) == 6
    stop = probe.output[2]
    if stop in probe.output[:2]:  # would stop earlier; still a valid lock
        cut = probe.output.index(stop) + 1
    else:
        cut = 3

    req = Request(req_id=0, prompt=list(prompt), max_new_tokens=6,
                  stop_ids=[stop])
    Engine(params, cfg, max_seqs=1, page_size=16, max_pages_per_seq=8,
           prefill_buckets=(16,), decode_chunk=2).run([req])
    assert req.done and req.output == probe.output[:cut]


def test_apply_logit_controls_numerics():
    """HF repetition-penalty rule + eos suppression, bit-exact."""
    from micromix_tpu.serve.sampling import apply_logit_controls

    logits = jnp.asarray([[2.0, -1.0, 0.5, -3.0],
                          [2.0, -1.0, 0.5, -3.0]], jnp.float32)
    presence = jnp.asarray([[True, True, False, False],
                            [False, False, False, False]])
    pen = jnp.asarray([2.0, 2.0], jnp.float32)
    suppress = jnp.zeros((2, 4), bool).at[1, 3].set(True)
    out = np.asarray(apply_logit_controls(logits, presence, pen, suppress))
    # row 0: token 0 (positive, present) halved; token 1 (negative) doubled
    np.testing.assert_allclose(out[0], [1.0, -2.0, 0.5, -3.0])
    # row 1: nothing present; eos (3) suppressed
    assert out[1, 3] == -np.inf
    np.testing.assert_allclose(out[1, :3], [2.0, -1.0, 0.5])


def test_engine_repetition_penalty(rng):
    """A huge penalty bans every context token under greedy decoding, so
    the output never repeats a prompt or generated token (robust to
    cross-program argmax noise, unlike exact-token checks)."""
    cfg = _cfg()
    params = random_dense_params(cfg, seed=62)
    prompt = list(rng.integers(0, cfg.vocab_size, 8))
    req = Request(req_id=0, prompt=list(prompt), max_new_tokens=8,
                  sampling=SamplingParams(repetition_penalty=1e6))
    eng = Engine(params, cfg, max_seqs=1, page_size=16, max_pages_per_seq=8,
                 prefill_buckets=(16,), decode_chunk=3)
    eng.run([req])
    assert req.done and len(req.output) == 8
    seen = set(prompt)
    for t in req.output:
        assert t not in seen, f"penalized token {t} re-emitted"
        seen.add(t)
    # the penalized programs actually compiled in
    assert any(k[1] for k in eng._decode_multi_cache)


def test_engine_min_new_tokens(rng):
    """min_new_tokens suppresses eos until the floor is reached; without
    it the same eos ends the request immediately."""
    cfg = _cfg()
    params = random_dense_params(cfg, seed=63)
    prompt = list(rng.integers(0, cfg.vocab_size, 7))

    probe = Request(req_id=0, prompt=list(prompt), max_new_tokens=6)
    Engine(params, cfg, max_seqs=1, page_size=16, max_pages_per_seq=8,
           prefill_buckets=(16,), decode_chunk=2).run([probe])
    eos = probe.output[0]  # greedy first token as eos -> stops at 1 token

    r_plain = Request(req_id=0, prompt=list(prompt), max_new_tokens=6,
                      eos_id=eos)
    Engine(params, cfg, max_seqs=1, page_size=16, max_pages_per_seq=8,
           prefill_buckets=(16,), decode_chunk=2).run([r_plain])
    assert r_plain.output == [eos]

    r_min = Request(req_id=0, prompt=list(prompt), max_new_tokens=6,
                    eos_id=eos,
                    sampling=SamplingParams(min_new_tokens=4))
    Engine(params, cfg, max_seqs=1, page_size=16, max_pages_per_seq=8,
           prefill_buckets=(16,), decode_chunk=2).run([r_min])
    assert len(r_min.output) >= 4
    assert eos not in r_min.output[:3]


def test_engine_logprobs(rng):
    """Request.logprobs returns one raw-model log-probability per emitted
    token; enabling it must not perturb greedy sampling, and the values
    must match a teacher-forced log_softmax of the decode chain."""
    import dataclasses as dc
    from micromix_tpu.serve.kv_cache import make_cache
    from micromix_tpu.serve.runner import decode_step, prefill

    cfg = _cfg()
    params = random_dense_params(cfg, seed=64)
    prompt = list(rng.integers(0, cfg.vocab_size, 9))

    def run(lp):
        req = Request(req_id=0, prompt=list(prompt), max_new_tokens=5,
                      logprobs=lp)
        Engine(params, cfg, max_seqs=1, page_size=16, max_pages_per_seq=8,
               prefill_buckets=(16,), decode_chunk=2).run([req])
        return req

    base = run(False)
    assert base.token_logprobs == []
    req = run(True)
    assert req.output == base.output      # logprobs don't perturb sampling
    assert len(req.token_logprobs) == len(req.output)
    assert all(np.isfinite(v) and v <= 0.0 for v in req.token_logprobs)

    # teacher-force the same stream and compare log_softmax values
    caches = [make_cache(17, 16, cfg.num_kv_heads, cfg.head_dim, 2, 8,
                         bits=4) for _ in range(cfg.num_layers)]
    row = jnp.asarray([1, 2, 0, 0, 0, 0, 0, 0], jnp.int32)
    caches = [dc.replace(c, page_table=c.page_table.at[0].set(row))
              for c in caches]
    toks = np.zeros((1, 16), np.int32)
    toks[0, :len(prompt)] = prompt
    logits, caches = prefill(params, cfg, caches, jnp.asarray(toks),
                             jnp.int32(0), jnp.int32(0),
                             jnp.int32(len(prompt) - 1))
    caches = [dc.replace(c, lengths=c.lengths.at[0].set(len(prompt)))
              for c in caches]
    want = [float(jax.nn.log_softmax(logits[0])[req.output[0]])]
    cur, pos = req.output[0], len(prompt)
    for nxt in req.output[1:]:
        lg, caches = decode_step(params, cfg, caches,
                                 jnp.asarray([cur], jnp.int32),
                                 jnp.asarray([0], jnp.int32),
                                 jnp.asarray([pos], jnp.int32))
        want.append(float(jax.nn.log_softmax(lg[0])[nxt]))
        cur, pos = nxt, pos + 1
    np.testing.assert_allclose(req.token_logprobs, want, atol=0.05)


def test_engine_min_new_tokens_suppresses_stop_ids(rng):
    """min_new_tokens must also hold against stop_ids (and work with
    eos_id=None): the floor suppresses every terminator, not just eos."""
    cfg = _cfg()
    params = random_dense_params(cfg, seed=65)
    prompt = list(rng.integers(0, cfg.vocab_size, 7))

    probe = Request(req_id=0, prompt=list(prompt), max_new_tokens=6)
    Engine(params, cfg, max_seqs=1, page_size=16, max_pages_per_seq=8,
           prefill_buckets=(16,), decode_chunk=2).run([probe])
    stop = probe.output[0]  # would stop at 1 token without the floor

    r = Request(req_id=0, prompt=list(prompt), max_new_tokens=6,
                stop_ids=[stop],
                sampling=SamplingParams(min_new_tokens=4))
    Engine(params, cfg, max_seqs=1, page_size=16, max_pages_per_seq=8,
           prefill_buckets=(16,), decode_chunk=2).run([r])
    assert len(r.output) >= 4
    assert stop not in r.output[:3]


def _run_engine(params, cfg, reqs, *, pipeline, seed=3, **kw):
    eng = Engine(params, cfg, max_seqs=4, page_size=16, max_pages_per_seq=8,
                 prefill_buckets=(16, 32), decode_chunk=4, seed=seed,
                 pipeline=pipeline, **kw)
    eng.run(reqs)
    return eng


def test_pipelined_decode_streams_identical(rng):
    """Async decode pipelining must be a pure latency optimization: token
    streams (greedy AND sampled), logprob-free, with staggered
    max_new_tokens and an eos mid-stream, are bit-identical to the
    unpipelined engine."""
    cfg = _cfg()
    params = random_dense_params(cfg, seed=70)
    prompts = [list(rng.integers(0, cfg.vocab_size, 5 + i)) for i in range(4)]

    def mk():
        return [
            Request(req_id=0, prompt=list(prompts[0]), max_new_tokens=13),
            Request(req_id=1, prompt=list(prompts[1]), max_new_tokens=7,
                    sampling=SamplingParams(temperature=0.8)),
            Request(req_id=2, prompt=list(prompts[2]), max_new_tokens=17,
                    eos_id=5),
            Request(req_id=3, prompt=list(prompts[3]), max_new_tokens=9,
                    sampling=SamplingParams(temperature=1.2)),
        ]

    a = mk()
    b = mk()
    ea = _run_engine(params, cfg, a, pipeline=True)
    _run_engine(params, cfg, b, pipeline=False)
    assert ea._inflight is None
    for ra, rb in zip(a, b):
        assert ra.output == rb.output, (ra.req_id, ra.output, rb.output)


def test_pipelined_decode_with_queue_churn(rng):
    """More requests than slots: finishes drain the pipeline, admissions
    restart it; streams still match the unpipelined engine."""
    cfg = _cfg()
    params = random_dense_params(cfg, seed=71)
    prompts = [list(rng.integers(0, cfg.vocab_size, 4 + i % 5))
               for i in range(10)]

    def mk():
        return [Request(req_id=i, prompt=list(p),
                        max_new_tokens=5 + (i % 3) * 4)
                for i, p in enumerate(prompts)]

    a, b = mk(), mk()
    _run_engine(params, cfg, a, pipeline=True)
    _run_engine(params, cfg, b, pipeline=False)
    for ra, rb in zip(a, b):
        assert ra.output == rb.output, (ra.req_id, ra.output, rb.output)


def test_pipelined_decode_cancel_midflight(rng):
    """Cancelling while a chunk is in flight must drop that request's
    pending rows (no cross-request emission, no crash)."""
    cfg = _cfg()
    params = random_dense_params(cfg, seed=72)
    reqs = [Request(req_id=i,
                    prompt=list(rng.integers(0, cfg.vocab_size, 6)),
                    max_new_tokens=20) for i in range(2)]
    eng = Engine(params, cfg, max_seqs=2, page_size=16, max_pages_per_seq=8,
                 prefill_buckets=(16,), decode_chunk=4, pipeline=True)
    for r in reqs:
        eng.submit(r)
    steps = 0
    while eng.step():
        steps += 1
        if eng._inflight is not None and not reqs[0].done:
            assert eng.cancel(0)
        assert steps < 100
    assert reqs[0].done and reqs[1].done
    assert len(reqs[1].output) == 20
    # cancelled request stopped early
    assert len(reqs[0].output) < 20


def test_engine_stacking_preserves_generations_qwen2(rng, monkeypatch):
    """The engine-init stacking transform (q/k/v + gate/up stacks incl.
    Qwen2 qkv BIASES) must not change greedy generations vs the
    per-linear param form (MICROMIX_NO_STACK ablation path)."""
    import os

    from micromix_tpu.models import (
        ModelConfig, default_calibration, quantize_model,
        random_dense_params)

    cfg = ModelConfig(arch="qwen2", vocab_size=128, hidden_size=256,
                      intermediate_size=512, num_layers=2, num_heads=2,
                      num_kv_heads=1, head_dim=128, rope_theta=1e4,
                      rms_eps=1e-6, qkv_bias=True)
    qp = quantize_model(random_dense_params(cfg, seed=17), cfg,
                        default_calibration(cfg, 64, 64))
    assert qp["layers"][0]["q"].bias is not None  # qwen2 ships qkv biases

    def run(env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        rr = np.random.default_rng(9)
        eng = Engine(qp, cfg, max_seqs=2, page_size=16,
                     max_pages_per_seq=8, prefill_buckets=(16,),
                     decode_chunk=2)
        reqs = [Request(req_id=i,
                        prompt=list(rr.integers(0, 128, 6 + i)),
                        max_new_tokens=6) for i in range(2)]
        eng.run(reqs)
        for k in env:
            monkeypatch.delenv(k)
        return [r.output for r in reqs]

    stacked = run({})
    assert "qkv_stack" not in qp["layers"][0]  # input pytree untouched
    unstacked = run({"MICROMIX_NO_STACK": "1"})
    assert stacked == unstacked
