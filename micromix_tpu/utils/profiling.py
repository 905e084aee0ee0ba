"""Tracing / profiling helpers (SURVEY.md §5 "Tracing / profiling").

The reference's observability is an nsys wrapper around a missing script
(prof_micromix.sh) plus CUDA-event timing.  The TPU-native equivalents:

  * ``trace(logdir)``     — jax.profiler device+host trace, viewable in
                            Perfetto / TensorBoard (the nsys analog)
  * ``annotate(name)``    — named range visible in traces (the NVTX analog)
  * ``hlo_dump_env(dir)`` — env vars that make XLA dump HLO before/after
                            optimization for kernel-level inspection
  * ``marginal_timer``    — dispatch-overhead-cancelling wall timing for
                            jitted callables (CUDA-event-timing analog);
                            shared with benchmarks/timing.py methodology
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Iterator

import jax

__all__ = ["trace", "annotate", "hlo_dump_env", "marginal_timer"]


@contextlib.contextmanager
def trace(logdir: str, *, host: bool = True) -> Iterator[None]:
    """Capture a device trace under ``logdir`` (Perfetto/TensorBoard)."""
    jax.profiler.start_trace(logdir, create_perfetto_trace=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Context manager: named range in profiler traces and HLO metadata.

    Usable around traced code (becomes jax.named_scope) — attention /
    quantize / matmul phases show up as labelled spans.
    """
    return jax.named_scope(name)


def hlo_dump_env(dump_dir: str) -> Dict[str, str]:
    """Env-var dict enabling XLA HLO dumps (set before process start)."""
    return {
        "XLA_FLAGS": f"--xla_dump_to={dump_dir} "
                     "--xla_dump_hlo_as_text --xla_dump_hlo_pass_re=.*",
    }


def marginal_timer(fn: Callable[[], object], *, iters: int = 64,
                   reps: int = 3) -> float:
    """Seconds per call of ``fn`` (which must synchronize internally).

    Times ``iters//4`` and ``iters`` back-to-back calls and returns the
    marginal rate, cancelling constant dispatch/fetch overhead — required
    on the axon tunnel where a single dispatch costs ~400 us.
    """
    def run(n: int) -> float:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n):
                fn()
            best = min(best, time.perf_counter() - t0)
        return best

    fn()  # warm / compile
    lo = max(1, iters // 4)
    t_lo, t_hi = run(lo), run(iters)
    return max((t_hi - t_lo) / (iters - lo), 1e-12)
