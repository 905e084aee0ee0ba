"""Activation reorder+quantize kernel bandwidth.

TPU analog of the reference's standalone reorder/quantize kernel bench
(/root/reference/mgemm/benchmark/bench_reorder.cu): measures the fused
channel-gather + mixed MXFP4/6/8 quantize alone, reported as effective
HBM bandwidth (read bf16 input + write packed codes/scales).

Usage: python benchmarks/bench_quantize.py [--iters N] [--quick]
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


def run_one(M: int, k4: int, k6: int, k8: int, iters: int,
            interpret: bool) -> float:
    from micromix_tpu.mx.layout import compose_segmented
    from micromix_tpu.ops import reorder_quantize_x

    K = k4 + k6 + k8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (M, K)).astype(np.float32),
                    jnp.bfloat16)
    perm = jnp.asarray(
        compose_segmented(rng.permutation(K).astype(np.int32), k4, k6, k8))

    def mkloop(n):
        def loop(x, seed):
            def body(i, carry):
                acc, x = carry
                x = x.at[0, 0].add((seed + i).astype(jnp.bfloat16) * 1e-8)
                t = reorder_quantize_x(x, perm, k4, k6, k8,
                                       interpret=interpret)
                s = (jnp.sum(t.fp4.astype(jnp.int32))
                     + jnp.sum(t.sf8.astype(jnp.int32)))
                return acc + s, x
            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.int32(seed), x))
            return acc
        f = jax.jit(loop)
        return lambda seed: f(x, jnp.int32(seed))

    sec = marginal_time(mkloop, iters)
    read = M * K * 2                               # bf16 in
    write = M * (k4 + k6 * 6 // 8 + k8) + M * (K // 32)  # codes + scales
    return (read + write) / sec / 1e9


def main(argv=None) -> None:
    args = common_parser(__doc__).parse_args(argv)
    interpret = not on_tpu()
    if args.quick:
        Ms, (k4, k6, k8), iters = [8], (256, 128, 128), 4
    else:
        Ms, (k4, k6, k8), iters = [32, 512, 2048], (3584, 256, 256), \
            args.iters
    K = k4 + k6 + k8
    for M in Ms:
        gbs = run_one(M, k4, k6, k8, iters, interpret)
        emit(f"reorder+quantize M={M} K={K}", gbs, "GB/s",
             M=M, K=K, k4=k4, k6=k6, k8=k8)


if __name__ == "__main__":
    main()
