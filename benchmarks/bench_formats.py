"""Single-format block-scaled GEMM microbench (MXFP4 / MXFP6 / MXFP8).

TPU analog of the reference's per-format CUTLASS microbenches
(/root/reference/mgemm/benchmark/bench_fp4.cu, bench_fp6.cu, bench_fp8.cu):
the whole K axis in one format, through the same fused Pallas kernel.

Usage: python benchmarks/bench_formats.py [--iters N] [--quick]
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


def run_one(fmt: str, M: int, N: int, K: int, iters: int,
            interpret: bool) -> float:
    from micromix_tpu.kernels import mixed_matmul
    from micromix_tpu.mx.mxtensor import quantize_mixed

    budget = {"mxfp4": (K, 0, 0), "mxfp6": (0, K, 0), "mxfp8": (0, 0, K)}
    k4, k6, k8 = budget[fmt]
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (M, K)).astype(np.float32)
    w = rng.normal(0, 0.3, (N, K)).astype(np.float32)
    a = quantize_mixed(jnp.asarray(x), k4, k6, k8)
    wq = quantize_mixed(jnp.asarray(w), k4, k6, k8, weight_fp4_only=True,
                        pack_fp4=(k4 > 0))

    sf_name = {"mxfp4": "sf4", "mxfp6": "sf6", "mxfp8": "sf8"}[fmt]

    def mkloop(n):
        def loop(a, wq, seed):
            def body(i, carry):
                acc, a = carry
                sf = getattr(a, sf_name)
                sf = sf.at[0, 0].set(
                    (sf[0, 0] & 0xFE) | ((i + seed) % 2).astype(jnp.uint8))
                a2 = type(a)(**{**{f: getattr(a, f) for f in
                                   ("fp4", "fp6", "fp8", "sf4", "sf6",
                                    "sf8")}, sf_name: sf})
                y = mixed_matmul(a2, wq, interpret=interpret)
                return acc + jnp.sum(y.astype(jnp.float32)), a2
            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(seed), a))
            return acc
        f = jax.jit(loop)
        return lambda seed: f(a, wq, jnp.uint8(seed))

    sec = marginal_time(mkloop, iters)
    return 2.0 * M * N * K / sec / 1e12


def main(argv=None) -> None:
    args = common_parser(__doc__).parse_args(argv)
    interpret = not on_tpu()
    if args.quick:
        M, N, K, iters = 8, 256, 256, 4
    else:
        M, N, K, iters = 512, 4096, 4096, args.iters
    for fmt in ("mxfp4", "mxfp6", "mxfp8"):
        tflops = run_one(fmt, M, N, K, iters, interpret)
        emit(f"{fmt} GEMM M={M} N={N} K={K}", tflops, "TFLOPs",
             fmt=fmt, M=M, N=N, K=K)


if __name__ == "__main__":
    main()
