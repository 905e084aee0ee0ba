"""Streaming activation-statistics capture.

Reference semantics (reorder_indices.py:35-131) reproduced without storing
the full |x| matrices:

  * saliency  = elementwise max over calibration samples of the per-sample
    channel mean |x|  (stat_tensor, :41-51)  -> channel sort order
  * absmax    = running per-channel max |x|  -> SmoothQuant act scales
    (the artifact model/main.py:111 loads but no reference script produces)
  * below4/below6/total = element counts against the per-row thresholds
    thr4 = rowmax*448/6/2^10*lambda, thr6 = rowmax*448/28/2^6*lambda
    (:103-108), accumulated streaming so the ratios match the reference's
    full-matrix counts exactly.

MoE sites carry a row mask (tokens routed to the expert), matching the
reference's per-nn.Linear forward hooks which see only routed tokens.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..models.common import ModelConfig
from ..models.surgery import ATTN_IN, DOWN_IN, MLP_IN, O_IN
from ..models.transformer import forward

SiteStats = Dict[str, jnp.ndarray]
StatsTree = Dict[str, SiteStats]

_C4 = 448.0 / 6.0 / 2.0 ** 10
_C6 = 448.0 / 28.0 / 2.0 ** 6


def init_stats(k: int) -> SiteStats:
    return {
        "saliency": jnp.zeros((k,), jnp.float32),
        "absmax": jnp.zeros((k,), jnp.float32),
        "below4": jnp.zeros((), jnp.float32),
        "below6": jnp.zeros((), jnp.float32),
        "total": jnp.zeros((), jnp.float32),
    }


def site_sizes(cfg: ModelConfig) -> Dict[str, int]:
    hid = cfg.hidden_size
    sizes = {ATTN_IN: hid, O_IN: cfg.num_heads * cfg.head_dim}
    if cfg.is_moe:
        for e in range(cfg.num_experts):
            sizes[f"expert{e}_{MLP_IN}"] = hid
            sizes[f"expert{e}_{DOWN_IN}"] = cfg.intermediate_size
        sizes[MLP_IN] = hid  # router + experts fan-in (smoothing site)
    else:
        sizes[MLP_IN] = hid
        sizes[DOWN_IN] = cfg.intermediate_size
    return sizes


def init_stats_tree(cfg: ModelConfig) -> StatsTree:
    sizes = site_sizes(cfg)
    return {
        f"layer{i}/{name}": init_stats(k)
        for i in range(cfg.num_layers)
        for name, k in sizes.items()
    }


def _update_site(acc: SiteStats, x: jnp.ndarray, lamda: float,
                 mask: Optional[jnp.ndarray]) -> SiteStats:
    ax = jnp.abs(x.reshape(-1, x.shape[-1]).astype(jnp.float32))
    rows = ax.shape[0]
    if mask is not None:
        m = mask.reshape(-1, 1).astype(jnp.float32)
    else:
        m = jnp.ones((rows, 1), jnp.float32)
    nrows = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(ax * m, axis=0) / nrows
    rowmax = jnp.max(ax, axis=-1, keepdims=True)
    below4 = jnp.sum((ax < rowmax * (_C4 * lamda)) * m)
    below6 = jnp.sum((ax < rowmax * (_C6 * lamda)) * m)
    return {
        "saliency": jnp.maximum(acc["saliency"], mean),
        "absmax": jnp.maximum(acc["absmax"], jnp.max(ax * m, axis=0)),
        "below4": acc["below4"] + below4,
        "below6": acc["below6"] + below6,
        "total": acc["total"] + jnp.sum(m) * ax.shape[-1],
    }


def calibration_step(params, cfg: ModelConfig, tokens: jnp.ndarray,
                     accs: StatsTree, lamda: float = 1.0) -> StatsTree:
    """One jittable calibration step: forward + stats update.  Dense params."""
    new = dict(accs)

    def tap(layer_idx, name, x, mask=None):
        key = f"layer{layer_idx}/{name}"
        new[key] = _update_site(new[key], x, lamda, mask)

    forward(params, cfg, tokens, tap=tap)
    return new


def collect_calibration(params, cfg: ModelConfig,
                        token_batches: List[np.ndarray],
                        lamda: float = 1.0) -> StatsTree:
    """Run all calibration samples; returns the final stats tree."""
    accs = init_stats_tree(cfg)
    step = jax.jit(functools.partial(calibration_step, cfg=cfg, lamda=lamda),
                   static_argnames=())
    for toks in token_batches:
        accs = step(params, tokens=jnp.asarray(toks, jnp.int32), accs=accs)
    return jax.device_get(accs)
