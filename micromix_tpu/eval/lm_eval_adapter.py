"""lm-evaluation-harness adapter (zero/few-shot tasks).

Equivalent of the HFLM wrap in model/main.py:135-181.  The harness itself
is an optional dependency (requirements.txt:3 pins lm-eval 0.4.8 in the
reference); the scoring primitives below are dependency-free and unit-tested
directly, and ``MicroMixLM`` registers them with the harness when available.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..models.common import ModelConfig
from ..models.transformer import forward


class Scorer:
    """Batched log-likelihood scoring on a (possibly quantized) model."""

    def __init__(self, params, cfg: ModelConfig, max_len: int = 2048,
                 kv_quant_bits: Optional[int] = None):
        self.params = params
        self.cfg = cfg
        self.max_len = max_len
        self._logits = jax.jit(
            lambda p, t: forward(p, cfg, t, kv_quant_bits=kv_quant_bits))

    def loglikelihood_tokens(self, context: List[int],
                             continuation: List[int]) -> Tuple[float, bool]:
        """Returns (sum logp of continuation tokens, greedy-match flag)."""
        toks = (context + continuation)[-self.max_len:]
        n_cont = len(continuation)
        t = jnp.asarray(np.asarray(toks, np.int32)[None, :])
        logits = np.asarray(self._logits(self.params, t))[0]
        logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
        logp = np.asarray(logp)
        # positions predicting the continuation
        start = len(toks) - n_cont - 1
        ll = 0.0
        greedy = True
        for i in range(n_cont):
            pos = start + i
            tok = toks[pos + 1]
            ll += float(logp[pos, tok])
            if int(np.argmax(logp[pos])) != tok:
                greedy = False
        return ll, greedy

    def rolling_loglikelihood(self, tokens: List[int]) -> float:
        total = 0.0
        for i in range(0, max(1, len(tokens) - 1), self.max_len - 1):
            window = tokens[i:i + self.max_len]
            if len(window) < 2:
                break
            t = jnp.asarray(np.asarray(window, np.int32)[None, :])
            logits = np.asarray(self._logits(self.params, t))[0]
            logp = np.asarray(jax.nn.log_softmax(jnp.asarray(
                logits[:-1].astype(np.float32)), axis=-1))
            tgt = np.asarray(window[1:])
            total += float(logp[np.arange(len(tgt)), tgt].sum())
        return total

    def greedy_generate(self, context: List[int], max_new: int,
                        stop_ids: Optional[List[int]] = None) -> List[int]:
        toks = list(context)
        for _ in range(max_new):
            t = jnp.asarray(np.asarray(toks[-self.max_len:], np.int32)[None, :])
            logits = np.asarray(self._logits(self.params, t))[0]
            nxt = int(np.argmax(logits[-1]))
            toks.append(nxt)
            if stop_ids and nxt in stop_ids:
                break
        return toks[len(context):]


def make_lm_eval_model(scorer: Scorer, tokenizer):
    """Build an lm-eval LM instance; raises ImportError if lm_eval missing."""
    import lm_eval.api.model as lm_model

    class MicroMixLM(lm_model.LM):
        def __init__(self):
            super().__init__()
            self.tok = tokenizer

        def loglikelihood(self, requests):
            out = []
            for req in requests:
                ctx, cont = req.args
                ctx_ids = self.tok.encode(ctx) if ctx else [
                    self.tok.bos_token_id or 0]
                cont_ids = self.tok.encode(cont, add_special_tokens=False)
                out.append(scorer.loglikelihood_tokens(ctx_ids, cont_ids))
            return out

        def loglikelihood_rolling(self, requests):
            return [
                scorer.rolling_loglikelihood(self.tok.encode(req.args[0]))
                for req in requests
            ]

        def generate_until(self, requests):
            outs = []
            for req in requests:
                ctx, kw = req.args
                ctx_ids = self.tok.encode(ctx)
                max_new = kw.get("max_gen_toks", 128)
                ids = scorer.greedy_generate(ctx_ids, max_new)
                outs.append(self.tok.decode(ids))
            return outs

    return MicroMixLM()


def run_lm_eval(scorer: Scorer, tokenizer, tasks: List[str],
                num_fewshot: int = 0, limit: Optional[int] = None):
    """simple_evaluate wrapper (model/main.py:167-181)."""
    import lm_eval
    lm = make_lm_eval_model(scorer, tokenizer)
    return lm_eval.simple_evaluate(model=lm, tasks=tasks,
                                   num_fewshot=num_fewshot, limit=limit)
