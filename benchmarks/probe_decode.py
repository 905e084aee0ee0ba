"""Probe: where do the ~10 ms/step of composition overhead in the 8B
decode chunk live?  Compiles the REAL decode_multi program at 8B shapes,
measures wall per chunk, prints XLA cost analysis, and dumps optimized
HLO for copy/fusion inspection.
"""
import sys, time, json
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

t0 = time.perf_counter()
params = build_quantized(cfg, p6, p8, share_layers=True)
# probe the ENGINE's param form: stacked q/k/v + gate/up (r5)
from micromix_tpu.models.surgery import stack_layer_projections
params = stack_layer_projections(params)
print(f"build {time.perf_counter()-t0:.1f}s", file=sys.stderr)

n_pages = B * 16 + 1
caches = []
pt = np.zeros((B + 1, 16), np.int32)
pid = 1
for i in range(B):
    for j in range(16):
        pt[i, j] = pid
        pid += 1
lengths = np.full((B + 1,), 128, np.int32)  # one full page of history
for _ in range(cfg.num_layers):
    c = make_cache(n_pages + B * 16, 128, cfg.num_kv_heads, cfg.head_dim,
                   B + 1, 16, bits=4)
    import dataclasses
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
lowered = jf.lower(params, caches, tokens, seq_ids, positions, key)
compiled = lowered.compile()
print(f"compile {time.perf_counter()-t0:.1f}s", file=sys.stderr)

ca = compiled.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
print("cost_analysis keys sample:",
      {k: v for k, v in sorted(ca.items())
       if k in ("flops", "bytes accessed", "optimal_seconds",
                "bytes accessed output", "utilization operand 0 {}")})
print("flops/chunk = %.3g  bytes/chunk = %.3g" %
      (ca.get("flops", -1), ca.get("bytes accessed", -1)))
mem = compiled.memory_analysis()
print("memory_analysis:", mem)

# dump optimized HLO
txt = compiled.as_text()
Path("/tmp/decode_multi_8b.hlo").write_text(txt)
print("HLO dumped: %d bytes -> /tmp/decode_multi_8b.hlo" % len(txt))

# measure wall per dispatch
out, newc = jf(params, caches, tokens, seq_ids, positions, key)
out.block_until_ready()
best = float("inf")
for r in range(5):
    t0 = time.perf_counter()
    out2, newc2 = jf(params, caches, tokens, seq_ids, positions,
                     jax.random.fold_in(key, r))
    out2.block_until_ready()
    best = min(best, time.perf_counter() - t0)
print("wall/chunk best = %.2f ms  (%.2f ms/step)" %
      (best * 1e3, best * 1e3 / CHUNK))
