"""Expert-parallel (EP) serving: Mixtral engines with experts sharded.

Completes the multi-chip serving matrix for the MoE family (tp_serve.py
covers dense models): expert FFN weights — the dominant parameter mass of
a Mixtral — shard over the mesh's "expert" axis while attention, router,
embeddings, and the paged KV cache stay replicated.  The layer dicts
carry STACKED experts (every expert leaf gains a leading expert dim,
sharded on "expert"), and models/transformer.moe_block's stacked branch
computes each device's local experts on the replicated tokens with one
psum per MoE block (the moe_ep.py design).

Because only the MoE block needs the axis, the step programs are the
UNMODIFIED serve/runner.py functions shard-mapped over the mesh — one
code path serves single-chip and EP.

Reference analog: none — the reference iterates Mixtral experts serially
on one device (model/qMixtralLayer.py:437-450); EP is net-new per the
north star.  Uniform per-expert budgets are required to stack (the
hetero budgets-as-data form lifts this for the plain forward,
moe_ep.stack_hetero_experts).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.common import ModelConfig
from ..serve.runner import decode_multi, decode_step, prefill, prefill_batch
from ..serve.sampling import SAMPLE_MODES

Params = Dict[str, Any]


def stack_layer_experts(layer: Params) -> Params:
    """One quantized Mixtral layer dict -> stacked-experts form.

    Stacks EVERY leaf of the per-expert dicts along a new leading dim via
    moe_ep.stack_hetero_experts (the generic whole-pytree stacker).
    Uniform per-expert budgets are required (QuantSite static splits are
    part of the treedef) — checked here for a clear error.

    When the experts are the canonical ScaledW8/QuantSite form, the
    layer instead carries the GROUPED form (surgery._group_experts):
    each shard's local experts run as TWO block-diagonal Pallas calls
    (moe_block's ``experts_grouped_ep`` branch) instead of an E_local x 3
    per-expert call loop — the EP twin of the single-chip grouped path.
    Hetero budgets-as-data experts keep the stacked-loop form.
    """
    from ..models.common import QuantLinear, QuantSite
    from ..mx.scaledw8 import ScaledW8
    from .moe_ep import stack_hetero_experts

    experts = layer["experts"]
    sites = [ep.get("site_in") for ep in experts]
    out = {k: v for k, v in layer.items() if k != "experts"}
    if all(isinstance(s, QuantSite) for s in sites) and all(
            isinstance(ep.get(n), QuantLinear)
            and isinstance(ep[n].w, ScaledW8)
            for ep in experts for n in ("w1", "w2", "w3")):
        assert all(s.splits == sites[0].splits for s in sites), \
            "uniform per-expert budgets required to group (got %s)" % (
                [s.splits for s in sites],)
        from ..models.surgery import _group_experts
        out["experts_grouped_ep"] = _group_experts(experts)
        return out
    assert all(s.splits == sites[0].splits for s in sites), \
        "uniform per-expert budgets required to stack (got %s)" % (
            [s.splits for s in sites],)
    out["experts_stacked"] = stack_hetero_experts(experts)
    return out


def quantize_model_ep(params: Params, cfg: ModelConfig,
                      calibs) -> Params:
    """Quantize (models/surgery.py) then stack each layer's experts."""
    from ..models.surgery import quantize_model

    qm = quantize_model(params, cfg, calibs)
    return {**qm, "layers": [stack_layer_experts(p) for p in qm["layers"]]}


def param_specs_ep(params: Params) -> Params:
    """PartitionSpec pytree: expert-stacked/grouped leaves shard dim 0 on
    "expert"; everything else replicated."""
    def layer_specs(p):
        return {
            k: (jax.tree.map(lambda _: P("expert"), v) if
                k in ("experts_stacked", "experts_grouped_ep")
                else jax.tree.map(lambda _: P(), v))
            for k, v in p.items()
        }
    return {
        "embed": P(), "final_ln": P(), "lm_head": P(),
        "layers": [layer_specs(p) for p in params["layers"]],
    }


def shard_params_ep(params: Params, mesh: Mesh) -> Params:
    specs = param_specs_ep(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def make_ep_step_fns(params: Params, cfg: ModelConfig, mesh: Mesh, *,
                     decode_chunk: int = 8):
    """Shard-mapped serve/runner.py step programs for an EP Mixtral.

    Attention/KV are replicated (P() prefix specs), so the bodies are the
    single-chip runner functions verbatim; the MoE psum happens inside
    moe_block's stacked branch.  Mirrors tp_serve.make_tp_step_fns's
    StepFns surface (per-mode + controls/logprobs decode variants,
    chunked-history prefill factory, batched prefill).
    """
    ep = mesh.shape["expert"]
    assert cfg.num_experts % ep == 0, (cfg.num_experts, ep)
    pspecs = param_specs_ep(params)

    def mk(body, n_args, n_lead_outs=1):
        def wrapped(p, c, *args):
            fn = jax.shard_map(
                body, mesh=mesh,
                in_specs=(pspecs, P()) + (P(),) * n_args,
                out_specs=(P(),) * n_lead_outs + (P(),),
                check_vma=False,
            )
            return fn(p, c, *args)
        # caches donated: the engine replaces them after every dispatch
        return jax.jit(wrapped, donate_argnums=(1,))

    prefill_fn = mk(lambda p, c, t, sid, sp, li: prefill(
        p, cfg, c, t, sid, sp, li), 4)
    decode_fn = mk(lambda p, c, t, sid, pos: decode_step(
        p, cfg, c, t, sid, pos), 3)

    def multi_body(p, c, t, sid, pos, key, step, tt, kk, tp_, *ctl,
                   mode="full", logprobs=False):
        out = decode_multi(
            p, cfg, c, t, sid, pos, jax.random.fold_in(key, step),
            tt, kk, tp_, ctl if ctl else None, n_steps=decode_chunk,
            sample_mode=mode, with_logprobs=logprobs)
        # builtin-wrapper shape (toks, last, [lps,] caches): enables the
        # engine's async decode pipelining (StepFns.decode_multi_returns_last)
        if logprobs:
            toks, lps, caches = out
            return toks, toks[-1], lps, caches
        toks, caches = out
        return toks, toks[-1], caches

    decode_multi_fns = {}
    for m in SAMPLE_MODES:
        for ctl in (False, True):
            for lp in (False, True):
                decode_multi_fns[(m, ctl, lp)] = mk(
                    functools.partial(multi_body, mode=m, logprobs=lp),
                    12 if ctl else 8, n_lead_outs=3 if lp else 2)

    def prefill_hist(hist_len: int):
        return mk(lambda p, c, t, sid, sp, li, h=hist_len: prefill(
            p, cfg, c, t, sid, sp, li, hist_len=h), 4)

    prefill_batch_fn = mk(lambda p, c, t, sid, li: prefill_batch(
        p, cfg, c, t, sid, li), 3)

    from ..serve.engine import StepFns
    return StepFns(prefill=prefill_fn, decode=decode_fn,
                   decode_multi=decode_multi_fns,
                   prefill_hist=prefill_hist,
                   prefill_batch=prefill_batch_fn,
                   decode_multi_returns_last=True)


def make_ep_engine(params_ep: Params, cfg: ModelConfig, mesh: Mesh,
                   **engine_kw):
    """serve.Engine over an expert-sharded Mixtral."""
    from ..serve.engine import Engine

    decode_chunk = engine_kw.pop("decode_chunk", 8)
    sharded = shard_params_ep(params_ep, mesh)
    step_fns = make_ep_step_fns(sharded, cfg, mesh,
                                decode_chunk=decode_chunk)
    return Engine(sharded, cfg, decode_chunk=decode_chunk,
                  step_fns=step_fns, **engine_kw)


__all__ = ["make_ep_engine", "make_ep_step_fns", "quantize_model_ep",
           "stack_layer_experts", "param_specs_ep", "shard_params_ep"]
