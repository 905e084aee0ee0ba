"""SmoothQuant-style weight/activation smoothing (pre-quantization pass).

Functional equivalent of smooth_lm / smooth_ln_fcs_llama_like
(model/smooth.py:55-166): per layer,

    s = clamp(act_absmax^alpha / colmax(|W|)^(1-alpha), min=1e-5)
    ln.g <- ln.g / s ;  W_fc <- W_fc * s  (columns)

applied to (ln1, [q,k,v]) and (ln2, [gate,up]) — or for Mixtral
(ln2, [router] + all experts' [w1,w3]).  Unlike the reference, the act
scales come from our own calibration stats (the reference loads a file no
script in its repo produces, SURVEY §2.1 note).
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

import jax.numpy as jnp

from ..models.common import DenseLinear, ModelConfig
from ..models.surgery import ATTN_IN, MLP_IN
from .stats import StatsTree


def _smooth_group(gamma, fcs: List[DenseLinear], act_absmax, alpha: float):
    act = jnp.maximum(jnp.asarray(act_absmax, jnp.float32), 1e-5)
    wmax = jnp.max(jnp.stack(
        [jnp.max(jnp.abs(fc.w.astype(jnp.float32)), axis=0) for fc in fcs]),
        axis=0)
    wmax = jnp.maximum(wmax, 1e-5)
    s = jnp.clip(act ** alpha / wmax ** (1.0 - alpha), 1e-5, None)
    new_gamma = (gamma.astype(jnp.float32) / s).astype(gamma.dtype)
    new_fcs = [
        DenseLinear(w=(fc.w.astype(jnp.float32) * s[None, :]).astype(fc.w.dtype),
                    bias=fc.bias)
        for fc in fcs
    ]
    return new_gamma, new_fcs


def smooth_params(params: Dict[str, Any], cfg: ModelConfig,
                  stats: StatsTree, alpha: float = 0.5) -> Dict[str, Any]:
    """Dense pytree -> smoothed dense pytree (weights/norms rescaled)."""
    out = dict(params)
    layers = []
    for i, p in enumerate(params["layers"]):
        q = dict(p)
        g1, (fq, fk, fv) = _smooth_group(
            p["ln1"], [p["q"], p["k"], p["v"]],
            stats[f"layer{i}/{ATTN_IN}"]["absmax"], alpha)
        q.update(ln1=g1, q=fq, k=fk, v=fv)
        if cfg.is_moe:
            fcs = [p["router"]]
            for ep in p["experts"]:
                fcs.extend([ep["w1"], ep["w3"]])
            g2, new_fcs = _smooth_group(
                p["ln2"], fcs, stats[f"layer{i}/{MLP_IN}"]["absmax"], alpha)
            q["ln2"] = g2
            q["router"] = new_fcs[0]
            experts = []
            for e, ep in enumerate(p["experts"]):
                experts.append({**ep, "w1": new_fcs[1 + 2 * e],
                                "w3": new_fcs[2 + 2 * e]})
            q["experts"] = experts
        else:
            g2, (fg, fu) = _smooth_group(
                p["ln2"], [p["gate"], p["up"]],
                stats[f"layer{i}/{MLP_IN}"]["absmax"], alpha)
            q.update(ln2=g2, gate=fg, up=fu)
        layers.append(q)
    out["layers"] = layers
    return out
