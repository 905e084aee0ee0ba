"""Perplexity evaluation over a token stream.

Equivalent of eval_ppl (model/eval.py:13-87): split the test stream into
seqlen windows, forward, shifted cross-entropy, ppl = exp(sum_nll / tokens).
The reference streams decoder layers one at a time through a single GPU to
fit 70B models; on TPU the whole quantized model fits in HBM (4-bit weights)
and windows are batched through one jitted forward instead.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..models.common import ModelConfig
from ..models.transformer import forward


def windowed_nll(params, cfg: ModelConfig, window: jnp.ndarray,
                 kv_quant_bits: Optional[int] = None) -> jnp.ndarray:
    """window (B, S) -> summed next-token NLL over (B, S-1) positions."""
    logits = forward(params, cfg, window, kv_quant_bits=kv_quant_bits)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = window[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(nll)


def eval_ppl(params, cfg: ModelConfig, token_stream: np.ndarray, *,
             seqlen: int = 2048, batch: int = 1,
             kv_quant_bits: Optional[int] = None,
             progress: Optional[Callable[[int, int], None]] = None) -> float:
    """token_stream: 1-D array of test-set token ids (wikitext2 style)."""
    tokens = np.asarray(token_stream).reshape(-1)
    nwin = len(tokens) // seqlen
    assert nwin > 0, "token stream shorter than one window"
    tokens = tokens[: nwin * seqlen].reshape(nwin, seqlen)

    step = jax.jit(
        lambda p, w: windowed_nll(p, cfg, w, kv_quant_bits=kv_quant_bits))
    total = 0.0
    count = 0
    i = 0
    while i < nwin:
        w = tokens[i: i + batch]
        b = w.shape[0]
        total += float(step(params, jnp.asarray(w, jnp.int32)))
        count += b * (seqlen - 1)
        i += b
        if progress is not None:
            progress(i, nwin)
    return math.exp(total / count)
