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


if __name__ == "__main__":
    main()
