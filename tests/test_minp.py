"""min-p sampling (SamplingParams.min_p): keep tokens with
p >= min_p * pmax.

Implementation rides the logit-controls stage as a log-space threshold
(x >= xmax + T*ln(min_p), computed host-side per row) — no sampler-mode
or sort changes; see sampling.uses_logit_controls.  Locked here:

  * the log-space filter equals the probability-space definition,
  * shift construction (greedy limit, off rows, row mixing),
  * engine end-to-end: a temperature row with min_p=1.0 must emit the
    argmax chain — bit-identical to a greedy row of the same prompt in
    the same program.
"""

import numpy as np

import jax.numpy as jnp

from micromix_tpu.models import ModelConfig, random_dense_params
from micromix_tpu.serve import Engine, Request
from micromix_tpu.serve.sampling import (
    SamplingParams, apply_logit_controls, minp_shifts,
    uses_logit_controls)


def test_minp_filter_matches_probability_definition():
    rng = np.random.default_rng(0)
    b, v = 4, 64
    logits = rng.normal(0, 3, (b, v)).astype(np.float32)
    temps = np.asarray([1.0, 0.7, 2.5, 1.3], np.float32)
    minp = np.asarray([0.5, 0.1, 0.9, 0.02], np.float32)
    params = [SamplingParams(temperature=float(t), min_p=float(m))
              for t, m in zip(temps, minp)]
    shift = minp_shifts(params)
    neutral_presence = np.zeros((b, v), bool)
    ones = np.ones((b,), np.float32)
    out = np.asarray(apply_logit_controls(
        jnp.asarray(logits), jnp.asarray(neutral_presence),
        jnp.asarray(ones), jnp.asarray(neutral_presence),
        minp_shift=jnp.asarray(shift)))
    # probability-space reference: post-temperature softmax
    z = logits / temps[:, None]
    p = np.exp(z - z.max(axis=1, keepdims=True))
    p /= p.sum(axis=1, keepdims=True)
    keep_ref = p >= minp[:, None] * p.max(axis=1, keepdims=True)
    keep_got = np.isfinite(out)
    np.testing.assert_array_equal(keep_got, keep_ref)
    # surviving logits unchanged
    np.testing.assert_allclose(out[keep_got], logits[keep_ref])


def test_minp_shifts_construction():
    ps = [SamplingParams(temperature=1.0, min_p=0.5),   # ln(.5)
          SamplingParams(temperature=0.0, min_p=0.5),   # greedy -> 0.0
          SamplingParams(temperature=1.0),               # off -> -inf
          None]                                          # off -> -inf
    s = minp_shifts(ps)
    assert np.isclose(s[0], np.log(0.5))
    assert s[1] == 0.0
    assert s[2] == -np.inf and s[3] == -np.inf
    assert uses_logit_controls([ps[0]])
    assert not uses_logit_controls([ps[2]])


def test_engine_minp_one_equals_greedy():
    """min_p=1.0 at temperature 1.0 keeps ONLY the argmax — the sampled
    stream must equal a greedy request's stream over the same prompt in
    the same engine (identical per-row decode chains)."""
    cfg = ModelConfig(arch="llama", vocab_size=96, hidden_size=128,
                      intermediate_size=256, num_layers=2, num_heads=2,
                      num_kv_heads=2, head_dim=64, rope_theta=10000.0,
                      rms_eps=1e-6)
    params = random_dense_params(cfg, seed=9)
    eng = Engine(params, cfg, max_seqs=2, page_size=16,
                 max_pages_per_seq=8, prefill_buckets=(16,),
                 decode_chunk=2)
    prompt = list(np.random.default_rng(4).integers(0, 96, 7))
    ra = Request(req_id=0, prompt=list(prompt), max_new_tokens=6,
                 sampling=SamplingParams(temperature=1.0, min_p=1.0))
    rb = Request(req_id=1, prompt=list(prompt), max_new_tokens=6)
    eng.run([ra, rb])
    assert ra.output == rb.output
    assert len(ra.output) == 6


def test_sample_mode_registry_complete():
    """One registry (sampling.SAMPLE_MODES) drives every engine flavor's
    per-mode decode programs, and pick_sample_mode only returns members —
    the r4 bug class (a mode added to one factory but not another,
    commit 1d4efbe) is structurally impossible."""
    import itertools

    import jax
    import pytest

    import micromix_tpu.parallel.ep_serve as epm
    import micromix_tpu.parallel.tp_serve as tpm
    from micromix_tpu.serve.sampling import (
        SAMPLE_MODES, SamplingParams, pick_sample_mode, sample_batch)

    for t, k, p in itertools.product((0.0, 0.7), (0, 5, 1000), (1.0, 0.9)):
        mode = pick_sample_mode([SamplingParams(temperature=t, top_k=k,
                                                top_p=p)])
        assert mode in SAMPLE_MODES
    # the TP/EP factories iterate THE registry object, not a copy
    assert tpm.SAMPLE_MODES is SAMPLE_MODES
    assert epm.SAMPLE_MODES is SAMPLE_MODES
    with pytest.raises(AssertionError):
        sample_batch(jnp.zeros((1, 8)), jax.random.PRNGKey(0),
                     jnp.zeros((1,)), jnp.zeros((1,), jnp.int32),
                     jnp.ones((1,)), mode="nope")
