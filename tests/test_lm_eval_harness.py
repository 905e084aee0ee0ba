"""MicroMixLM driven through the lm-evaluation-harness calling convention.

The real lm-eval package cannot be installed here (zero egress), so this
vendors the minimal slice of its 0.4.x API surface our adapter binds to —
``lm_eval.api.model.LM`` (abstract base), ``Instance`` request objects
whose ``.args`` carry (context, continuation) / (context, gen kwargs), and
a ``simple_evaluate`` that iterates a task's documents, issues
loglikelihood requests, and aggregates accuracy — then runs
eval.lm_eval_adapter.make_lm_eval_model / run_lm_eval against it
end-to-end on a quantized model (VERDICT r1 item 4a: the adapter had
never been loaded by an actual harness).
"""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from micromix_tpu.eval.lm_eval_adapter import Scorer
from micromix_tpu.models import (
    ModelConfig, default_calibration, quantize_model, random_dense_params)


# --------------------------------------------------------------------------
# vendored mini-harness (lm-eval 0.4.x API shape)
# --------------------------------------------------------------------------


class _Instance:
    """lm_eval.api.instance.Instance: requests carry .args tuples."""

    def __init__(self, request_type, args):
        self.request_type = request_type
        self.args = args


def _install_mini_lm_eval():
    """Create lm_eval / lm_eval.api.model modules in sys.modules."""
    lm_eval = types.ModuleType("lm_eval")
    api = types.ModuleType("lm_eval.api")
    model_mod = types.ModuleType("lm_eval.api.model")

    class LM:
        """Abstract base: subclasses implement the three request methods."""

        def __init__(self):
            pass

        def loglikelihood(self, requests):
            raise NotImplementedError

        def loglikelihood_rolling(self, requests):
            raise NotImplementedError

        def generate_until(self, requests):
            raise NotImplementedError

    model_mod.LM = LM
    api.model = model_mod

    def simple_evaluate(model, tasks, num_fewshot=0, limit=None):
        """Multiple-choice accuracy over the synthetic task, issuing
        loglikelihood Instances exactly like the real harness."""
        assert isinstance(model, model_mod.LM), \
            "harness requires an lm_eval.api.model.LM subclass"
        results = {}
        for task in tasks:
            docs = _TASKS[task][:limit] if limit else _TASKS[task]
            correct = 0
            for doc in docs:
                reqs = [_Instance("loglikelihood", (doc["query"], choice))
                        for choice in doc["choices"]]
                lls = model.loglikelihood(reqs)
                pred = int(np.argmax([ll for ll, _greedy in lls]))
                correct += int(pred == doc["gold"])
            results[task] = {"acc": correct / len(docs)}
        # rolling loglikelihood request path (wikitext-style tasks)
        roll = model.loglikelihood_rolling(
            [_Instance("loglikelihood_rolling", ("a b c d e f",))])
        assert len(roll) == 1 and np.isfinite(roll[0])
        # generation request path
        gen = model.generate_until(
            [_Instance("generate_until", ("a b", {"max_gen_toks": 3}))])
        assert len(gen) == 1 and isinstance(gen[0], str)
        return {"results": results}

    lm_eval.api = api
    lm_eval.simple_evaluate = simple_evaluate
    sys.modules["lm_eval"] = lm_eval
    sys.modules["lm_eval.api"] = api
    sys.modules["lm_eval.api.model"] = model_mod
    return lm_eval


_TASKS = {
    "synthetic_mc": [
        {"query": "a b c", "choices": [" d", " e", " f"], "gold": 0},
        {"query": "b c d", "choices": [" a", " e", " b"], "gold": 2},
        {"query": "c a", "choices": [" b b", " c"], "gold": 1},
    ],
}


class _WordTokenizer:
    """Whitespace vocab tokenizer exposing the HF surface the adapter uses."""

    vocab = {w: i for i, w in enumerate("a b c d e f g h".split())}
    inv = {i: w for w, i in vocab.items()}
    bos_token_id = 0

    def encode(self, text, add_special_tokens=True):
        return [self.vocab[w] for w in text.split()]

    def decode(self, ids):
        return " ".join(self.inv[int(i)] for i in ids)


@pytest.fixture(autouse=True)
def _mini_harness():
    saved = {k: sys.modules.get(k)
             for k in ("lm_eval", "lm_eval.api", "lm_eval.api.model")}
    _install_mini_lm_eval()
    yield
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v


def test_micromix_lm_under_harness(rng):
    from micromix_tpu.eval.lm_eval_adapter import run_lm_eval

    cfg = ModelConfig(arch="llama", vocab_size=8, hidden_size=64,
                      intermediate_size=128, num_layers=1, num_heads=2,
                      num_kv_heads=2, head_dim=32, rope_theta=10000.0,
                      rms_eps=1e-6)
    params = quantize_model(random_dense_params(cfg, seed=60), cfg,
                            default_calibration(cfg, p6=0, p8=0))
    scorer = Scorer(params, cfg, max_len=32)
    out = run_lm_eval(scorer, _WordTokenizer(), ["synthetic_mc"])
    acc = out["results"]["synthetic_mc"]["acc"]
    assert 0.0 <= acc <= 1.0
    # determinism: the harness run scores the same twice
    out2 = run_lm_eval(scorer, _WordTokenizer(), ["synthetic_mc"])
    assert out2["results"] == out["results"]


def test_harness_rejects_non_lm_models():
    import lm_eval
    with pytest.raises(AssertionError):
        lm_eval.simple_evaluate(model=object(), tasks=["synthetic_mc"])
