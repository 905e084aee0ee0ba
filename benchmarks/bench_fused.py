"""Fused producer->quantize vs separate passes.

TPU analog of the reference's fused-vs-separate comparison
(/root/reference/mgemm/benchmark/bench.cu:168-245, which compares a
separate reorder kernel + quantize kernel against the single fused
``run_reorder_bf16_mixed`` launch).  Here the pairs are:

  * rmsnorm_quantize_x (one fused pass)   vs  rmsnorm -> reorder_quantize_x
  * silu_mul_quantize_x (one fused pass)  vs  silu*mul -> quantize

On TPU both variants sit inside one jit, so "separate" means materializing
the bf16 intermediate through HBM (jnp ops in distinct kernels) while
"fused" runs the producer arithmetic inside the quantize Pallas kernel's
elementwise pass.

Usage: python benchmarks/bench_fused.py [--iters N] [--quick]
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


def _time(loop_builder, x_args, iters):
    def mkloop(n):
        def loop(args, seed):
            def body(i, carry):
                acc, args = carry
                x0 = args[0].at[0, 0].add(
                    (seed + i).astype(args[0].dtype) * 1e-8)
                args = (x0,) + args[1:]
                t = loop_builder(*args)
                s = jnp.sum(t.fp4.astype(jnp.int32)) + jnp.sum(
                    t.sf4.astype(jnp.int32))
                return acc + s, args
            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.int32(seed), args))
            return acc
        f = jax.jit(loop)
        return lambda seed: f(x_args, jnp.int32(seed))
    return marginal_time(mkloop, iters)


def main(argv=None) -> None:
    args = common_parser(__doc__).parse_args(argv)
    interpret = not on_tpu()
    if args.quick:
        M, (k4, k6, k8), iters = 8, (256, 128, 128), 4
    else:
        M, (k4, k6, k8), iters = 512, (3584, 256, 256), args.iters
    K = k4 + k6 + k8

    from micromix_tpu.mx.layout import compose_segmented
    from micromix_tpu.ops import (
        reorder_quantize_x, rmsnorm_quantize_x, silu_mul_quantize_x)
    from micromix_tpu.ops.quantize_ops import activation_quantize

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)
    gate = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)
    up = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)
    gamma = jnp.asarray(rng.normal(1, 0.1, (K,)), jnp.bfloat16)
    perm = jnp.asarray(
        compose_segmented(rng.permutation(K).astype(np.int32), k4, k6, k8))

    # --- RMSNorm -> quantize ---------------------------------------------
    def fused_rms(x, gamma):
        return rmsnorm_quantize_x(x, gamma, perm, k4, k6, k8,
                                  interpret=interpret)

    def separate_rms(x, gamma):
        xf = x.astype(jnp.float32)
        rvar = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True)
                             + 1e-6)
        y = (xf * rvar * gamma.astype(jnp.float32)[None, :]).astype(
            jnp.bfloat16)
        # opt barrier pins y as a materialized HBM intermediate
        y = jax.lax.optimization_barrier(y)
        return reorder_quantize_x(y, perm, k4, k6, k8, interpret=interpret)

    t_f = _time(fused_rms, (x, gamma), iters)
    t_s = _time(separate_rms, (x, gamma), iters)
    emit(f"rmsnorm+quantize fused M={M} K={K}", t_f * 1e6, "us",
         separate_us=round(t_s * 1e6, 4),
         speedup=round(t_s / t_f, 4))

    # --- SiLU*mul -> quantize --------------------------------------------
    def fused_act(gate, up):
        return silu_mul_quantize_x(gate, up, k4, k6, k8, interpret=interpret)

    def separate_act(gate, up):
        y = (jax.nn.silu(gate.astype(jnp.float32))
             * up.astype(jnp.float32)).astype(jnp.bfloat16)
        y = jax.lax.optimization_barrier(y)
        return activation_quantize(y.astype(jnp.float32), k4, k6, k8,
                                   interpret=interpret)

    t_f = _time(fused_act, (gate, up), iters)
    t_s = _time(separate_act, (gate, up), iters)
    emit(f"silu_mul+quantize fused M={M} K={K}", t_f * 1e6, "us",
         separate_us=round(t_s * 1e6, 4),
         speedup=round(t_s / t_f, 4))


if __name__ == "__main__":
    main()
