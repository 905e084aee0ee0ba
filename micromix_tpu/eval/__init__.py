"""Evaluation: perplexity, lm-eval adapter, dataset loaders, CLI driver."""

from .ppl import eval_ppl, windowed_nll
from .datasets import get_loaders, synthetic_tokens

__all__ = ["eval_ppl", "windowed_nll", "get_loaders", "synthetic_tokens"]
