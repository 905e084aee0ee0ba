#!/usr/bin/env bash
# On-chip smoke backlog (TODO.md "TPU-smoke backlog"): run the moment the
# axon tunnel is back.  Everything here is already CPU-tested; this
# validates the Mosaic/TPU compile + execution of each program family the
# tunnel outage left unsmoked, then the perf benches.  Each section is
# independently timeboxed so one hang cannot eat the window.
#
# Usage: bash scripts/tpu_smoke.sh [results_dir]
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_smoke}"
mkdir -p "$OUT"

if ! timeout 240 python -c 'import jax; assert jax.devices()[0].platform != "cpu"'; then
  echo "TPU backend unavailable — nothing to smoke" >&2
  exit 1
fi

run() {  # run NAME TIMEOUT CMD...
  local name="$1" t="$2"; shift 2
  echo "== $name =="
  if timeout "$t" "$@" >"$OUT/$name.log" 2>&1; then
    echo "   OK  ($(tail -1 "$OUT/$name.log" | head -c 200))"
  else
    echo "   FAIL/TIMEOUT — see $OUT/$name.log"
  fi
}

# 1. kernel + headline sanity first (cheap, validates the chip itself)
run validate    900  python bench.py --validate
run headline    900  python bench.py --no-serving

# 2. engine program families on-chip via the e2e bench (piggybacked
#    prefill_decode under mixed load + the shared-prefix prefix-cache
#    scenario are both inside bench_e2e)
run e2e         1800 python benchmarks/bench_e2e.py

# 3. speculative decoding: spec rounds, spec_prefill_decode piggyback,
#    acceptance accounting + tok/s vs plain decode
run spec        1800 python benchmarks/bench_speculative.py
run spec_base   1200 python benchmarks/bench_speculative.py --baseline

# 4. prompt-lookup speculation on-chip (engine smoke via a short run)
run plookup     1200 python - <<'PY'
import numpy as np
from micromix_tpu.models import ModelConfig, random_dense_params
from micromix_tpu.serve import Engine, Request
cfg = ModelConfig(arch="llama", vocab_size=512, hidden_size=1024,
                  intermediate_size=2048, num_layers=4, num_heads=8,
                  num_kv_heads=8, head_dim=128, rope_theta=10000.0,
                  rms_eps=1e-6)
params = random_dense_params(cfg, seed=1)
eng = Engine(params, cfg, max_seqs=4, page_size=128,
             max_pages_per_seq=8, prefill_buckets=(128,),
             spec_ngram=2, spec_gamma=3, spec_rounds=2)
rng = np.random.default_rng(0)
reqs = [Request(req_id=i, prompt=list(rng.integers(0, 512, 16)),
                max_new_tokens=32) for i in range(4)]
eng.run(reqs)
print({"plookup_ok": all(len(r.output) == 32 for r in reqs),
       "accept_rate": round(eng.spec_accepted / max(eng.spec_proposed, 1),
                            3)})
PY

# 5. logit-controls decode program (repetition penalty + min_p + min
#    tokens in one compiled variant)
run controls    1200 python - <<'PY'
import numpy as np
from micromix_tpu.models import ModelConfig, random_dense_params
from micromix_tpu.serve import Engine, Request
from micromix_tpu.serve.sampling import SamplingParams
cfg = ModelConfig(arch="llama", vocab_size=512, hidden_size=1024,
                  intermediate_size=2048, num_layers=4, num_heads=8,
                  num_kv_heads=8, head_dim=128, rope_theta=10000.0,
                  rms_eps=1e-6)
eng = Engine(random_dense_params(cfg, seed=2), cfg, max_seqs=2,
             page_size=128, max_pages_per_seq=8, prefill_buckets=(128,))
rng = np.random.default_rng(1)
reqs = [Request(req_id=0, prompt=list(rng.integers(0, 512, 12)),
                max_new_tokens=24,
                sampling=SamplingParams(temperature=0.8, min_p=0.1,
                                        repetition_penalty=1.2,
                                        min_new_tokens=8), eos_id=3),
        Request(req_id=1, prompt=list(rng.integers(0, 512, 12)),
                max_new_tokens=24)]
eng.run(reqs)
print({"controls_ok": all(r.done for r in reqs)})
PY

# 6. hetero budgets forward on chip
run hetero      1200 python - <<'PY'
import numpy as np, jax.numpy as jnp
from micromix_tpu.models import ModelConfig, random_dense_params, forward
from micromix_tpu.models.hetero import quantize_model_hetero
from micromix_tpu.models import default_calibration
import dataclasses
cfg = ModelConfig(arch="llama", vocab_size=512, hidden_size=1024,
                  intermediate_size=2048, num_layers=2, num_heads=8,
                  num_kv_heads=8, head_dim=128, rope_theta=10000.0,
                  rms_eps=1e-6)
dense = random_dense_params(cfg, seed=3)
calibs = default_calibration(cfg, p6=128, p8=128)
q = quantize_model_hetero(dense, cfg, calibs)
toks = jnp.asarray(np.random.default_rng(0).integers(0, 512, (1, 128)))
out = forward(q, cfg, toks)
print({"hetero_ok": bool(jnp.isfinite(out).all())})
PY

# 7. HTTP API server over the real chip (boot, one completion, shutdown)
run api         1200 python - <<'PY'
import http.client, json
import numpy as np
from micromix_tpu.models import ModelConfig, random_dense_params
from micromix_tpu.serve import ApiServer, Engine
cfg = ModelConfig(arch="llama", vocab_size=512, hidden_size=1024,
                  intermediate_size=2048, num_layers=2, num_heads=8,
                  num_kv_heads=8, head_dim=128, rope_theta=10000.0,
                  rms_eps=1e-6)
eng = Engine(random_dense_params(cfg, seed=4), cfg, max_seqs=2,
             page_size=128, max_pages_per_seq=8, prefill_buckets=(128,))
srv = ApiServer(eng, lambda s: [int(w) for w in s.split()],
                lambda ids: " ".join(map(str, map(int, ids))))
srv.start()
c = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=600)
c.request("POST", "/v1/completions",
          json.dumps({"prompt": "5 6 7", "max_tokens": 8}),
          {"Content-Type": "application/json"})
out = json.loads(c.getresponse().read())
srv.close()
print({"api_ok": out["usage"]["completion_tokens"] == 8})
PY

# 8. prefill tile sweep (TODO item 2) + the 8B serving numbers
run prefill     2400 python benchmarks/bench_flash_prefill.py
run 8b_decode   2400 python benchmarks/bench_8b_decode.py --share-layers \
                     --decode-chunk 16 --new-tokens 48

echo "smoke done — logs in $OUT"
