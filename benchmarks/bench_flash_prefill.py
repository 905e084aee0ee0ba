"""Streaming flash prefill attention: tile sweep + XLA baseline.

TODO r2 perf item 2: the streaming flash kernel
(kernels/flash_attention.py) is correctness-locked but was never timed
against XLA's dense attention at long S.  This sweeps (block_q, block_k)
at 8B-shape prefill sizes and prints causal-adjusted TFLOPs per config,
plus the dense-attention baseline where it fits, so the kernel's default
`_pick_block` heuristic can be set from measurement.

No reference analog (the reference has no prefill-attention bench; its
FlashInfer prefill kernels were never driven — SURVEY.md §1).

Usage: python benchmarks/bench_flash_prefill.py [--iters N] [--quick]
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


def _causal_tflops(s: int, h: int, d: int, secs: float) -> float:
    # qk + pv matmuls, halved for causal masking
    flops = 2 * (2.0 * h * s * s * d) * 0.5
    return flops / secs / 1e12


def run_flash(s: int, h: int, hkv: int, d: int, bq: int, bk: int,
              iters: int) -> float:
    from micromix_tpu.kernels.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (1, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (1, s, hkv, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (1, s, hkv, d)), jnp.bfloat16)

    def mkloop(n):
        def loop(q, k, v, seed):
            def body(i, carry):
                acc, q = carry
                q = q.at[0, 0, 0, 0].add(
                    (seed + i).astype(jnp.bfloat16) * 1e-8)
                o = flash_attention(q, k, v, block_q=bq, block_k=bk)
                return acc + jnp.sum(o[:, -1].astype(jnp.float32)), q
            acc, _ = jax.lax.fori_loop(
                0, n, body, (jnp.float32(seed), q))
            return acc
        f = jax.jit(loop)
        return lambda seed: f(q, k, v, jnp.int32(seed))

    return marginal_time(mkloop, iters)


def run_dense(s: int, h: int, hkv: int, d: int, iters: int) -> float:
    from micromix_tpu.models.common import attention, causal_mask

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (1, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (1, s, hkv, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (1, s, hkv, d)), jnp.bfloat16)
    mask = causal_mask(s, s, None)

    def mkloop(n):
        def loop(q, k, v, seed):
            def body(i, carry):
                acc, q = carry
                q = q.at[0, 0, 0, 0].add(
                    (seed + i).astype(jnp.bfloat16) * 1e-8)
                o = attention(q, k, v, mask)
                return acc + jnp.sum(o[:, -1].astype(jnp.float32)), q
            acc, _ = jax.lax.fori_loop(
                0, n, body, (jnp.float32(seed), q))
            return acc
        f = jax.jit(loop)
        return lambda seed: f(q, k, v, jnp.int32(seed))

    return marginal_time(mkloop, iters)


def main(argv=None) -> None:
    args = common_parser(__doc__.splitlines()[0]).parse_args(argv)
    if args.quick or not on_tpu():
        h, hkv, d = 4, 2, 64
        seqs = (512,)
        tiles = ((128, 128), (256, 256))
        dense_max = 512
        iters = min(args.iters, 8)
    else:
        h, hkv, d = 32, 8, 128            # 8B attention shape
        seqs = (2048, 4096, 8192)
        tiles = ((256, 256), (256, 512), (512, 256), (512, 512),
                 (512, 1024), (1024, 512), (1024, 1024))
        dense_max = 4096
        iters = args.iters

    best = {}
    for s in seqs:
        for bq, bk in tiles:
            if bq > s or bk > s:
                continue
            secs = run_flash(s, h, hkv, d, bq, bk, iters)
            tf = _causal_tflops(s, h, d, secs)
            emit(f"flash prefill S={s} bq={bq} bk={bk}", tf, "TFLOPs",
                 ms=round(secs * 1e3, 3))
            if tf > best.get(s, (0, None))[0]:
                best[s] = (tf, (bq, bk))
        if s <= dense_max:
            secs = run_dense(s, h, hkv, d, iters)
            emit(f"dense attention S={s}", _causal_tflops(s, h, d, secs),
                 "TFLOPs", ms=round(secs * 1e3, 3))
    for s, (tf, tile) in best.items():
        emit(f"flash prefill best S={s}", tf, "TFLOPs",
             tile=list(tile))


if __name__ == "__main__":
    main()
