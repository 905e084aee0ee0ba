"""Shared benchmark timing utilities.

Timing on the experimental axon backend has two quirks (see bench.py):
dispatch through the tunnel costs ~400 us per call, and
``block_until_ready`` can return before the device is idle.  So every
benchmark here:

  * iterates the op inside one jitted ``lax.fori_loop`` whose body is kept
    loop-variant by a cheap per-iteration perturbation,
  * forces a synchronous scalar fetch (``float(...)``) to bound the work,
  * times two loop lengths and reports the marginal per-iteration rate,
    cancelling the constant RPC/compile/fetch overhead.

On CPU (tests / --quick) the same machinery runs with tiny shapes.

This module is the TPU-side analog of the reference's CUDA-event timing
helpers (/root/reference/mgemm/benchmark/mxf4f6f8_bench.cu:61-86).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Callable

import jax

# Persistent compilation cache: compiled programs round-trip through the
# axon remote-compile tunnel ONCE and are reused across processes
# (measured 12.1 s -> 0.28 s for a toy jit; the 8B serving bench's ~15 min
# of compiles drop to minutes on a warm cache).  Safe on miss/failure —
# jax just compiles normally.
_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)

__all__ = [
    "marginal_time",
    "emit",
    "common_parser",
    "on_tpu",
]


def on_tpu() -> bool:
    return jax.devices()[0].platform not in ("cpu",)


def marginal_time(mkloop: Callable[[int], Callable], iters: int, *,
                  reps: int = 3, max_scale: int = 64) -> float:
    """Per-iteration seconds via two-point marginal-rate timing.

    ``mkloop(n)`` must return a compiled callable ``f(seed:int) -> scalar``
    that runs the measured op ``n`` times; the scalar forces completion.

    The two-point estimate is only trustworthy when the long loop clearly
    dominates the constant dispatch/fetch overhead; if it doesn't (fast
    ops, RPC jitter), the loop length auto-scales up (at the cost of one
    recompile per scale step) until t_hi >= 1.5 * t_lo.
    """
    def timed(n: int) -> float:
        f = mkloop(n)
        float(f(0))  # compile + warm
        best = float("inf")
        for s in range(1, reps + 1):
            t0 = time.perf_counter()
            float(f(s))
            best = min(best, time.perf_counter() - t0)
        return best

    scale = 1
    while True:
        n_hi = iters * scale
        n_lo = max(1, n_hi // 4)
        t_lo, t_hi = timed(n_lo), timed(n_hi)
        if t_hi >= 1.5 * t_lo or scale >= max_scale:
            return max((t_hi - t_lo) / (n_hi - n_lo), 1e-12)
        scale *= 4


def emit(metric: str, value: float, unit: str, **extra) -> None:
    rec = {"metric": metric, "value": round(float(value), 4), "unit": unit}
    rec.update(extra)
    print(json.dumps(rec))


def common_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--iters", type=int, default=128,
                   help="high loop length for marginal timing")
    p.add_argument("--quick", action="store_true",
                   help="tiny shapes + few iters (CI / CPU smoke)")
    return p
