"""Quantize -> mixed GEMM pipeline latency (the per-linear hot path).

TPU analog of the reference's reorder+quantize -> matmul pipeline bench
(/root/reference/mgemm/benchmark/bench_reorder_gemm.cu): measures the full
per-linear cost — channel gather, mixed MXFP4/6/8 quantize, and the
segmented block-scaled GEMM — as one jitted program, exactly as it runs
inside a quantized layer forward (one fused dispatch, vs the reference's
4 kernel launches, SURVEY.md §3.3).

Usage: python benchmarks/bench_quantize_gemm.py [--iters N] [--quick]
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
from timing import common_parser, emit, marginal_time, on_tpu  # noqa: E402


def run_one(M: int, N: int, k4: int, k6: int, k8: int, iters: int,
            interpret: bool) -> float:
    from micromix_tpu.kernels import mixed_matmul
    from micromix_tpu.mx.layout import compose_segmented
    from micromix_tpu.mx.mxtensor import quantize_mixed
    from micromix_tpu.ops import reorder_quantize_x

    K = k4 + k6 + k8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (M, K)).astype(np.float32),
                    jnp.bfloat16)
    w = rng.normal(0, 0.3, (N, K)).astype(np.float32)
    wq = quantize_mixed(jnp.asarray(w), k4, k6, k8, weight_fp4_only=True,
                        pack_fp4=True)
    perm = jnp.asarray(
        compose_segmented(rng.permutation(K).astype(np.int32), k4, k6, k8))

    def mkloop(n):
        def loop(x, wq, seed):
            def body(i, carry):
                acc, x = carry
                x = x.at[0, 0].add((seed + i).astype(jnp.bfloat16) * 1e-8)
                a = reorder_quantize_x(x, perm, k4, k6, k8,
                                       interpret=interpret)
                y = mixed_matmul(a, wq, interpret=interpret)
                return acc + jnp.sum(y.astype(jnp.float32)), x
            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(seed), x))
            return acc
        f = jax.jit(loop)
        return lambda seed: f(x, wq, jnp.int32(seed))

    return marginal_time(mkloop, iters)


def main(argv=None) -> None:
    args = common_parser(__doc__).parse_args(argv)
    interpret = not on_tpu()
    if args.quick:
        Ms, N, (k4, k6, k8), iters = [8], 256, (256, 128, 128), 4
    else:
        Ms, N, (k4, k6, k8), iters = [32, 512, 2048], 4096, \
            (3584, 256, 256), args.iters
    K = k4 + k6 + k8
    for M in Ms:
        sec = run_one(M, N, k4, k6, k8, iters, interpret)
        emit(f"quantize+GEMM M={M} N={N} K={K}", sec * 1e6, "us",
             M=M, N=N, K=K,
             tflops=round(2.0 * M * N * K / sec / 1e12, 4))


if __name__ == "__main__":
    main()
