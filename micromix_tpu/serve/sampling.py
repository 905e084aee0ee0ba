"""Token sampling: greedy / temperature / top-k / top-p (nucleus).

Net-new vs the reference (it inherits HF generation; serving needs an
in-graph sampler).  Fully jittable: one fused op over (B, vocab) logits.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 0.0        # 0 -> greedy
    top_k: int = 0                  # 0 -> disabled
    top_p: float = 1.0              # 1 -> disabled
    min_p: float = 0.0              # 0 -> disabled (keep p >= min_p*pmax)
    repetition_penalty: float = 1.0  # 1 -> disabled (HF rule)
    min_new_tokens: int = 0          # suppress eos until this many emitted


def uses_logit_controls(sampling_params) -> bool:
    """True if any request needs the logit-controls stage (penalized /
    eos-suppressed / min-p programs compile in only when actually
    requested).  min_p rides this stage rather than the sampler modes:
    on raw logits the filter p >= min_p*pmax is exactly
    x >= xmax + T*ln(min_p) — a (B, V) compare, no sort, no softmax —
    and T*ln(min_p) is a host-computed per-row constant."""
    return any(p is not None and (p.repetition_penalty != 1.0
                                  or p.min_new_tokens > 0
                                  or p.min_p > 0.0)
               for p in sampling_params)


def minp_shifts(params):
    """Per-row log-space min-p threshold offsets for the controls stage.

    Row value is T*ln(min_p) (<= 0): keep logits x >= xmax + shift.
    -inf disables the filter; greedy rows (T<=0) use 0.0, which keeps
    exactly the argmax — the greedy limit of the min-p rule.
    """
    import numpy as np
    out = np.full((len(params),), -np.inf, np.float32)
    for i, p in enumerate(params):
        if p is not None and p.min_p > 0.0:
            out[i] = (p.temperature * float(np.log(min(p.min_p, 1.0)))
                      if p.temperature > 0.0 else 0.0)
    return out


def unpack_presence(packed: jnp.ndarray, v: int) -> jnp.ndarray:
    """Bit-packed (B, ceil(V/8)) u8 (little bit order, np.packbits) ->
    (B, V) bool.  The engine ships presence packed to cut the per-chunk
    host->device transfer 8x on the dispatch tunnel."""
    idx = jnp.arange(v)
    return ((packed[:, idx // 8] >> (idx % 8)) & 1).astype(bool)


def ban_mask(ban_ids: jnp.ndarray, v: int) -> jnp.ndarray:
    """(B, W) int32 token ids (-1 padding) -> (B, V) bool suppression
    mask covering every listed terminator (eos_id and stop_ids)."""
    return jnp.any(jnp.arange(v)[None, :, None] == ban_ids[:, None, :],
                   axis=-1)


def apply_logit_controls(logits: jnp.ndarray, presence: jnp.ndarray,
                         penalties: jnp.ndarray,
                         suppress: jnp.ndarray,
                         minp_shift: Optional[jnp.ndarray] = None
                         ) -> jnp.ndarray:
    """Pre-sampling logit transforms, one fused op over (B, V).

    presence (B, V) bool — tokens present in the row's context (prompt +
    generated); penalties (B,) — HF repetition-penalty rule on present
    tokens (positive logits divided, negative multiplied; 1.0 = no-op);
    suppress (B, V) bool — tokens forbidden this step (min_new_tokens
    eos suppression); minp_shift (B,) — min-p filter as a log-space
    offset (keep x >= xmax + shift; -inf = off, see ``minp_shift``).
    The min-p mask applies LAST, over the penalized/suppressed logits —
    the distribution the row will actually sample from.
    """
    x = logits.astype(jnp.float32)
    p = penalties[:, None]
    pen = jnp.where(x > 0, x / p, x * p)
    x = jnp.where(jnp.logical_and(presence, p != 1.0), pen, x)
    x = jnp.where(suppress, -jnp.inf, x)
    if minp_shift is not None:
        thresh = jnp.max(x, axis=-1, keepdims=True) + minp_shift[:, None]
        x = jnp.where(x < thresh, -jnp.inf, x)
    return x


def sample(logits: jnp.ndarray, key: jax.Array,
           params: SamplingParams = SamplingParams()) -> jnp.ndarray:
    """logits (B, V) -> token ids (B,) int32."""
    if params.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    x = logits.astype(jnp.float32) / params.temperature
    if params.top_k and params.top_k > 0:
        kth = jax.lax.top_k(x, params.top_k)[0][..., -1:]
        x = jnp.where(x < kth, -jnp.inf, x)
    if params.top_p < 1.0:
        sorted_x = jnp.sort(x, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_x, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest set with cumulative prob >= top_p; keep at least 1
        cutoff_idx = jnp.sum(cum < params.top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_x, cutoff_idx, axis=-1)
        x = jnp.where(x < cutoff, -jnp.inf, x)
    return jax.random.categorical(key, x, axis=-1).astype(jnp.int32)


# THE sampler-mode registry, cheapest first.  Every engine flavor
# (serve/engine.py, parallel/tp_serve.py, parallel/ep_serve.py) builds its
# per-mode decode programs by iterating THIS tuple, and pick_sample_mode
# only returns members of it — so adding a mode here is the single edit
# that propagates everywhere (the r4 "greedy" mode crashed TP/EP engines
# because each factory hand-listed its modes; commit 1d4efbe).
SAMPLE_MODES = ("greedy", "simple", "topk", "full")


def sample_batch(logits: jnp.ndarray, key: jax.Array,
                 temperature: jnp.ndarray, top_k: jnp.ndarray,
                 top_p: jnp.ndarray, *, mode: str = "full") -> jnp.ndarray:
    """Heterogeneous per-row sampling in ONE program.

    logits (B, V); temperature/top_k/top_p (B,) arrays (top_k<=0 and
    top_p>=1 disable the respective filter; temperature<=0 -> greedy).
    One jitted dispatch per engine step regardless of batch size — per-slot
    eager sampling costs a tunnel round-trip per op on the axon backend.

    ``mode`` (static) picks the cheapest program that covers the active
    sampling params — a full vocab argsort costs ~100 ms at V=32k on v5e
    and must not run when nobody asked for top-p:

      * "simple": greedy / temperature only (argmax + categorical)
      * "topk":   + top-k filter via lax.top_k (k <= _TOPK_WIDTH)
      * "full":   + top-p (nucleus) — needs the full descending sort
    """
    assert mode in SAMPLE_MODES, mode
    x = logits.astype(jnp.float32)
    b, v = x.shape
    t = jnp.maximum(temperature, 1e-6)[:, None]
    greedy = jnp.argmax(x, axis=-1).astype(jnp.int32)

    if mode == "greedy":
        # every active row is temperature<=0: skip the gumbel-noise
        # categorical entirely (a (B, V) random-bits + log pass per step,
        # ~0.4 ms at V=32k — docs/perf_notes.md r4)
        return greedy

    if mode == "simple":
        drawn = jax.random.categorical(key, x / t, axis=-1).astype(jnp.int32)
        return jnp.where(temperature <= 0.0, greedy, drawn)

    if mode == "topk":
        kmax = min(_TOPK_WIDTH, v)
        vals, _ = jax.lax.top_k(x, kmax)                       # (B, kmax) desc
        k_idx = jnp.clip(jnp.where(top_k > 0, top_k, kmax) - 1, 0, kmax - 1)
        kth = jnp.take_along_axis(vals, k_idx[:, None], axis=-1)
        # rows with top_k<=0 asked for NO filter: their threshold is -inf,
        # not the kmax-th logit (which would silently clip to _TOPK_WIDTH)
        kth = jnp.where(top_k[:, None] > 0, kth, -jnp.inf)
        xm = jnp.where(x < kth, -jnp.inf, x)
        drawn = jax.random.categorical(key, xm / t, axis=-1).astype(jnp.int32)
        return jnp.where(temperature <= 0.0, greedy, drawn)

    order = jnp.argsort(x, axis=-1)[:, ::-1]            # descending
    sx = jnp.take_along_axis(x, order, axis=-1)
    rank = jnp.arange(v)[None, :]
    # top-k: keep ranks < k (k<=0 -> keep all)
    k_arr = jnp.where(top_k > 0, top_k, v)[:, None]
    keep = rank < k_arr
    # top-p over the temperature-scaled distribution
    probs = jax.nn.softmax(sx / t, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff = jnp.sum(cum < top_p[:, None], axis=-1, keepdims=True)
    keep = jnp.logical_and(keep, rank <= cutoff)
    masked = jnp.where(keep, sx / t, -jnp.inf)
    drawn_sorted = jax.random.categorical(key, masked, axis=-1)
    drawn = jnp.take_along_axis(order, drawn_sorted[:, None], axis=-1)[:, 0]
    return jnp.where(temperature <= 0.0, order[:, 0], drawn).astype(jnp.int32)


_TOPK_WIDTH = 128


def pick_sample_mode(sampling_params) -> str:
    """Cheapest sample_batch mode covering the given SamplingParams list."""
    ps = [p for p in sampling_params if p is not None]
    if any(p.top_p < 1.0 or p.top_k > _TOPK_WIDTH for p in ps):
        return "full"
    if any(p.top_k > 0 for p in ps):
        return "topk"
    if all(p.temperature <= 0.0 for p in ps):
        return "greedy"
    return "simple"
