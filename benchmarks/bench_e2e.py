"""End-to-end serving benchmark: continuous-batching decode throughput.

The driver the reference's profiling script points at but never shipped
(/root/reference/prof_micromix.sh references a missing
benchmarks/benchmark_e2e_micromix.py — SURVEY.md §1): batched generation
through the full stack — quantized matmuls, fused quantize ops, paged
quantized KV cache, Pallas decode attention, continuous batching engine.

Reports decode tokens/s (aggregate across slots) and mean TTFT.

Usage: python benchmarks/bench_e2e.py [--quick]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(_HERE))
sys.path.insert(0, str(_HERE.parent))  # repo root for micromix_tpu
from timing import common_parser, emit  # noqa: E402


def main(argv=None) -> None:
    p = common_parser(__doc__)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--hidden", type=int, default=1024)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--new-tokens", type=int, default=64)
    args = p.parse_args(argv)

    from micromix_tpu.models import (
        ModelConfig, default_calibration, quantize_model,
        random_dense_params)
    from micromix_tpu.serve import Engine, Request

    if args.quick:
        args.layers, args.hidden, args.batch, args.new_tokens = 2, 256, 2, 4

    heads = max(args.hidden // 128, 2)
    cfg = ModelConfig(
        arch="llama", vocab_size=1024, hidden_size=args.hidden,
        intermediate_size=args.hidden * 2, num_layers=args.layers,
        num_heads=heads, num_kv_heads=max(heads // 2, 1),
        head_dim=args.hidden // heads, rope_theta=500000.0, rms_eps=1e-5)
    params = quantize_model(
        random_dense_params(cfg, seed=0), cfg,
        default_calibration(cfg, p6=128, p8=128, seed=0))

    rng = np.random.default_rng(0)
    eng = Engine(params, cfg, max_seqs=args.batch, page_size=128,
                 max_pages_per_seq=8, prefill_buckets=(16, 32))
    reqs = [
        Request(req_id=i,
                prompt=list(rng.integers(0, cfg.vocab_size, 12)),
                max_new_tokens=args.new_tokens)
        for i in range(args.batch * 2)
    ]
    # warm: compile prefill + decode programs on a throwaway request
    eng.run([Request(req_id=-1, prompt=[1, 2, 3], max_new_tokens=2)])
    eng.prefill_tokens = eng.decode_tokens = 0

    t0 = time.perf_counter()
    eng.run(reqs)
    dt = time.perf_counter() - t0
    assert all(r.done for r in reqs)
    ttfts = [eng.ttft[r.req_id] for r in reqs if r.req_id in eng.ttft]
    emit(f"e2e decode throughput B={args.batch} L={args.layers} "
         f"H={args.hidden}", eng.decode_tokens / dt, "tokens/s",
         decode_tokens=eng.decode_tokens,
         prefill_tokens=eng.prefill_tokens,
         wall_s=round(dt, 3),
         mean_ttft_ms=round(1e3 * float(np.mean(ttfts)), 2))

    # prefix caching: shared-system-prompt workload — every request
    # repeats a common prefix (2 pages) + a short unique tail; compare
    # TTFT with and without the cache (serve/prefix_cache.py)
    shared = list(rng.integers(0, cfg.vocab_size, 256))
    new_tok = max(2, args.new_tokens // 8)

    def shared_prefix_run(prefix_cache: bool):
        e = Engine(params, cfg, max_seqs=args.batch, page_size=128,
                   max_pages_per_seq=8, prefill_buckets=(16, 32, 512),
                   prefix_cache=prefix_cache)
        e.run([Request(req_id=-1, prompt=shared + [1, 2, 3],
                       max_new_tokens=2)])  # warm (and seed the cache)
        rs = [Request(req_id=i,
                      prompt=shared + list(rng.integers(
                          0, cfg.vocab_size, 5 + i % 3)),
                      max_new_tokens=new_tok)
              for i in range(args.batch)]
        e.prefill_tokens = e.decode_tokens = e.prefix_hit_tokens = 0
        t0 = time.perf_counter()
        e.run(rs)
        wall = time.perf_counter() - t0
        ttft = float(np.mean([e.ttft[r.req_id] for r in rs]))
        return wall, ttft, e

    w_off, ttft_off, e_off = shared_prefix_run(False)
    w_on, ttft_on, e_on = shared_prefix_run(True)
    # At toy scale on a high-dispatch-latency link TTFT is queueing-bound,
    # so the deterministic signal is prefill work avoided: cache hits skip
    # the shared 256-token prefix per request entirely.
    emit("e2e shared-prefix prefill tokens saved (prefix cache)",
         e_off.prefill_tokens - e_on.prefill_tokens, "tokens",
         prefill_tokens_off=e_off.prefill_tokens,
         prefill_tokens_on=e_on.prefill_tokens,
         prefix_hit_tokens=e_on.prefix_hit_tokens,
         ttft_on_ms=round(1e3 * ttft_on, 2),
         ttft_off_ms=round(1e3 * ttft_off, 2),
         ttft_speedup=round(ttft_off / max(ttft_on, 1e-9), 2),
         wall_on_s=round(w_on, 3), wall_off_s=round(w_off, 3))


if __name__ == "__main__":
    main()
