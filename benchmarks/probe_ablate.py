"""Ablation probe: wall/step of the REAL 8B decode chunk with components
stubbed out (untraced marginal attribution — the profiler's per-op
instrumentation inflates tiny ops ~20x, docs/perf_notes.md r3 note).

Usage: python benchmarks/probe_ablate.py [--no-append] [--no-attn]
       [--no-sample] [--no-mlp]
Prints one line: variant wall/chunk and ms/step.
"""
import sys, time, argparse, dataclasses
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import numpy as np
import jax
import jax.numpy as jnp

ap = argparse.ArgumentParser()
ap.add_argument("--no-append", action="store_true")
ap.add_argument("--no-attn", action="store_true")
ap.add_argument("--no-sample", action="store_true")
ap.add_argument("--no-mlp", action="store_true")
ap.add_argument("--no-quant", action="store_true",
                help="skip activation fakequant (identity bf16 cast)")
ap.add_argument("--xla-sites", action="store_true",
                help="XLA fakequant chains instead of Pallas site kernels")
ap.add_argument("--unfused-sites", action="store_true",
                help="separate Pallas site kernels (FUSE_SITE_GEMM off)")
ap.add_argument("--no-sites", action="store_true",
                help="sites = plain XLA producers, no quantize at all")
ap.add_argument("--no-norm", action="store_true",
                help="skip the rmsnorm inside the quantize sites too")
ap.add_argument("--no-perm", action="store_true",
                help="skip the runtime channel gather at quantize sites "
                     "(timing only — values wrong)")
ap.add_argument("--chunk", type=int, default=16)
args = ap.parse_args()

from micromix_tpu.serve import runner as R
from micromix_tpu.serve import sampling as S

if args.no_append:
    R.append_kv = lambda cache, sids, pos, k, v, **kw: cache
if args.no_attn:
    def _fake_attn(q, cache, sids, **kw):
        return q * 0.125
    R.paged_decode_attention = _fake_attn
if args.no_sample:
    _orig = S.sample_batch
    S.sample_batch = lambda lg, key, t, k, p, mode="full": (
        jnp.argmax(lg[:, :8], axis=-1).astype(jnp.int32))
if args.no_mlp:
    R._mlp = lambda h, p, cfg: h * jnp.bfloat16(0.5)
if args.no_quant:
    from micromix_tpu.ops import quantize_ops as Q
    Q.fakequant_device = lambda x2d, k4, k6, k8: x2d.astype(jnp.bfloat16)
if args.xla_sites or args.no_sites or args.unfused_sites:
    # any site ablation must ALSO leave the fused site+GEMM path, else
    # project_all bypasses the patched twins entirely
    from micromix_tpu.models import common as C
    C.FUSE_SITE_GEMM = False
if args.xla_sites:
    # pre-r3 behavior: XLA fakequant chains instead of the fused Pallas
    # site kernels (measures the site-kernel composition win)
    from micromix_tpu.ops import quantize_ops as Q3
    Q3._use_site_kernel = lambda x2d: False
if args.no_sites:
    # sites become plain XLA producers with NO quantize at all: upper
    # bound on what the 128 site calls cost composed (values change,
    # timing-only variant)
    from micromix_tpu.models.common import rmsnorm as _rms
    from micromix_tpu.ops import quantize_ops as Q4

    def _rmsq(x, gamma, perm, k4, k6, k8, eps=1e-6):
        x2d = x.reshape(-1, x.shape[-1])
        return _rms(jnp.take(x2d, perm, axis=1),
                    jnp.take(gamma, perm, axis=0), eps)

    def _reoq(x, perm, k4, k6, k8):
        x2d = x.reshape(-1, x.shape[-1])
        if perm is not None:
            x2d = jnp.take(x2d, perm, axis=1)
        return x2d.astype(jnp.bfloat16)

    def _siluq(gate, up, k4, k6, k8):
        g2d = gate.reshape(-1, gate.shape[-1])
        u2d = up.reshape(-1, up.shape[-1])
        return (jax.nn.silu(g2d.astype(jnp.float32))
                * u2d.astype(jnp.float32)).astype(jnp.bfloat16)

    Q4.rmsnorm_fakequant_x = _rmsq
    Q4.reorder_fakequant_x = _reoq
    Q4.silu_mul_fakequant_x = _siluq
if args.no_norm:
    from micromix_tpu.ops import quantize_ops as Q2

    def _nrm(x, gamma, perm, k4, k6, k8, eps=1e-6):
        x2d = x.reshape(-1, x.shape[-1])
        return Q2.fakequant_device(jnp.take(x2d, perm, axis=1), k4, k6, k8)
    Q2.rmsnorm_fakequant_x = _nrm

if args.no_perm:
    from micromix_tpu.models import common as C5
    C5.SKIP_SITE_PERM = True

from bench_8b_decode import build_quantized
from micromix_tpu.models import ModelConfig
from micromix_tpu.serve.kv_cache import make_cache
from micromix_tpu.serve.runner import decode_multi

cfg = ModelConfig(arch="llama", vocab_size=32000, hidden_size=4096,
                  intermediate_size=14336, num_layers=32,
                  num_heads=32, num_kv_heads=8, head_dim=128,
                  rope_theta=5e5, rms_eps=1e-5)
B, CHUNK = 8, args.chunk
params = build_quantized(cfg, 256, 256, share_layers=True)
# probe the ENGINE's param form: stacked q/k/v + gate/up (r5)
from micromix_tpu.models.surgery import stack_layer_projections
params = stack_layer_projections(params)

n_pages = B * 16 + 1
caches = []
pt = np.zeros((B + 1, 16), np.int32)
pid = 1
for i in range(B):
    for j in range(16):
        pt[i, j] = pid
        pid += 1
lengths = np.full((B + 1,), 128, np.int32)
for _ in range(cfg.num_layers):
    c = make_cache(n_pages + B * 16, 128, cfg.num_kv_heads, cfg.head_dim,
                   B + 1, 16, bits=4)
    c = dataclasses.replace(c, page_table=jnp.asarray(pt),
                            lengths=jnp.asarray(lengths))
    caches.append(c)

tokens = jnp.zeros((B,), jnp.int32)
seq_ids = jnp.arange(B, dtype=jnp.int32)
positions = jnp.asarray(lengths[:B])
key = jax.random.PRNGKey(0)
temps = jnp.zeros((B,), jnp.float32)
tk = jnp.zeros((B,), jnp.int32)
tp = jnp.ones((B,), jnp.float32)


def run(p, c, t, sid, pos, k):
    return decode_multi(p, cfg, c, t, sid, pos, k, temps, tk, tp, None,
                        n_steps=CHUNK, sample_mode="simple")


jf = jax.jit(run)
t0 = time.perf_counter()
out, _ = jf(params, caches, tokens, seq_ids, positions, key)
np.asarray(out)  # block_until_ready can return early on axon — force fetch
print(f"compile+run {time.perf_counter()-t0:.1f}s", file=sys.stderr)
best = float("inf")
for r in range(6):
    t0 = time.perf_counter()
    out2, _ = jf(params, caches, tokens, seq_ids, positions,
                 jax.random.fold_in(key, r))
    np.asarray(out2)
    best = min(best, time.perf_counter() - t0)
tag = "".join(s for s, on in (
    ("-append", args.no_append), ("-attn", args.no_attn),
    ("-sample", args.no_sample), ("-mlp", args.no_mlp),
    ("+xla-sites", args.xla_sites), ("-sites", args.no_sites),
    ("+unfused-sites", args.unfused_sites),
    ("-perm", args.no_perm)) if on) or "full"
print(f"variant={tag} wall/chunk={best*1e3:.2f} ms  "
      f"({best*1e3/CHUNK:.2f} ms/step)")
