"""Segmented mixed GEMM end-to-end latency/throughput sweep over M.

TPU analog of the reference's 3-segment ``matmul_host`` latency bench
(/root/reference/mgemm/benchmark/bench_gemm.cu): pre-quantized MXFP4/6/8
activations x MXFP4 weights through the fused Pallas kernel, swept over
decode-to-prefill batch sizes.

Usage: python benchmarks/bench_gemm.py [--iters N] [--quick]
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
    from micromix_tpu.mx.mxtensor import quantize_mixed

    K = k4 + k6 + k8
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (M, K)).astype(np.float32)
    if k8:
        x[:, -k8:] *= 60.0
    w = rng.normal(0, 0.3, (N, K)).astype(np.float32)
    a = quantize_mixed(jnp.asarray(x), k4, k6, k8)
    wq = quantize_mixed(jnp.asarray(w), k4, k6, k8, weight_fp4_only=True,
                        pack_fp4=True)

    def mkloop(n):
        def loop(a, wq, seed):
            def body(i, carry):
                acc, a = carry
                sf4 = a.sf4.at[0, 0].set(
                    (a.sf4[0, 0] & 0xFE) | ((i + seed) % 2).astype(jnp.uint8))
                a2 = type(a)(fp4=a.fp4, fp6=a.fp6, fp8=a.fp8, sf4=sf4,
                             sf6=a.sf6, sf8=a.sf8)
                y = mixed_matmul(a2, wq, interpret=interpret)
                return acc + jnp.sum(y.astype(jnp.float32)), a2
            acc, _ = jax.lax.fori_loop(0, n, body,
                                       (jnp.float32(seed), a))
            return acc
        f = jax.jit(loop)
        return lambda seed: f(a, wq, jnp.uint8(seed))

    sec = marginal_time(mkloop, iters)
    return 2.0 * M * N * K / sec / 1e12


def main(argv=None) -> None:
    args = common_parser(__doc__).parse_args(argv)
    interpret = not on_tpu()
    if args.quick:
        Ms, N, (k4, k6, k8) = [8], 256, (256, 128, 128)
        iters = 4
    else:
        Ms, N, (k4, k6, k8) = [1, 16, 32, 128, 512, 2048], 4096, \
            (3584, 256, 256)
        iters = args.iters
    K = k4 + k6 + k8
    for M in Ms:
        tflops = run_one(M, N, k4, k6, k8, iters, interpret)
        emit(f"mixed GEMM M={M} N={N} K={K}", tflops, "TFLOPs",
             M=M, N=N, K=K, k4=k4, k6=k6, k8=k8)


if __name__ == "__main__":
    main()
