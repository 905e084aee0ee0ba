"""Profile the 8B decode chunk on-chip: jax.profiler trace -> top ops.

Companion to probe_decode.py — attributes the per-step time to ops so the
composition overhead (docs/perf_notes.md "8B decode step decomposition")
is measured, not guessed.
"""
import sys, time, glob, gzip, json, collections
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import numpy as np
import jax
import jax.numpy as jnp

from bench_8b_decode import build_quantized
from micromix_tpu.models import ModelConfig
from micromix_tpu.serve.kv_cache import make_cache
from micromix_tpu.serve.runner import decode_multi

cfg = ModelConfig(arch="llama", vocab_size=32000, hidden_size=4096,
                  intermediate_size=14336, num_layers=32,
                  num_heads=32, num_kv_heads=8, head_dim=128,
                  rope_theta=5e5, rms_eps=1e-5)
B, CHUNK = 8, 16
p6 = p8 = 256

params = build_quantized(cfg, p6, p8, share_layers=True)

n_pages = B * 16 + 1
caches = []
pt = np.zeros((B + 1, 16), np.int32)
pid = 1
for i in range(B):
    for j in range(16):
        pt[i, j] = pid
        pid += 1
lengths = np.full((B + 1,), 128, np.int32)
import dataclasses
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
out, newc = jf(params, caches, tokens, seq_ids, positions, key)
out.block_until_ready()
print("warm done", file=sys.stderr)

logdir = "/tmp/decode_trace"
try:
    with jax.profiler.trace(logdir):
        out2, _ = jf(params, caches, tokens, seq_ids, positions,
                     jax.random.fold_in(key, 1))
        out2.block_until_ready()
    print("trace written to", logdir)
    for f in glob.glob(logdir + "/**/*", recursive=True):
        print("  ", f)
except Exception as e:
    print("profiler failed:", e)
