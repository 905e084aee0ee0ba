"""Dense bf16 matmul baseline sweep (the reference's fp16 baseline).

TPU analog of /root/reference/mgemm/fp16.py: plain dense matmul latency at
N=K=4096 over decode-to-prefill batch sizes, the "what quantization must
beat" line for speedup claims.

Usage: python benchmarks/bench_bf16.py [--iters N] [--quick]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

_HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(_HERE))
sys.path.insert(0, str(_HERE.parent))  # repo root for micromix_tpu
from timing import common_parser, emit, marginal_time  # noqa: E402


def run_one(M: int, N: int, K: int, iters: int) -> float:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.3, (N, K)), jnp.bfloat16)

    def mkloop(n):
        def loop(x, w, seed):
            def body(i, carry):
                acc, x = carry
                x = x.at[0, 0].add((seed + i).astype(jnp.bfloat16) * 1e-8)
                y = jnp.dot(x, w.T, preferred_element_type=jnp.float32)
                return acc + jnp.sum(y), x
            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(seed), x))
            return acc
        f = jax.jit(loop)
        return lambda seed: f(x, w, jnp.int32(seed))

    sec = marginal_time(mkloop, iters)
    return sec


def main(argv=None) -> None:
    args = common_parser(__doc__).parse_args(argv)
    if args.quick:
        Ms, N, K, iters = [8], 256, 256, 4
    else:
        Ms, N, K, iters = [1, 16, 32, 128, 512, 2048], 4096, 4096, args.iters
    for M in Ms:
        sec = run_one(M, N, K, iters)
        emit(f"bf16 dense GEMM M={M} N={N} K={K}", sec * 1e6, "us",
             M=M, N=N, K=K,
             tflops=round(2.0 * M * N * K / sec / 1e12, 4))


if __name__ == "__main__":
    main()
