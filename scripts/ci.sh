#!/usr/bin/env bash
# One-command verification: tests + bench smoke + driver hooks.
# CPU-only parts always run; on-chip parts run only if the TPU backend
# answers within a bounded probe (the axon tunnel can be down, and its
# init blocks indefinitely — never hang CI on it).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== tests (CPU, 8 virtual devices) =="
python -m pytest tests/ -q

echo "== multi-chip dryrun (dp/tp/ep/sp/pp/spec) =="
python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

if timeout 180 python -c "import jax; assert jax.devices()[0].platform != \"cpu\"" >/dev/null 2>&1; then
  echo "== single-chip compile check =="
  python - <<'PY'
import jax, __graft_entry__ as g
fn, args = g.entry()
jax.block_until_ready(jax.jit(fn)(*args))
print("entry OK")
PY

  echo "== kernel validation (bit-exact vs reference path) =="
  python bench.py --validate

  echo "== headline bench =="
  python bench.py

  echo "== bench suite (quick) =="
  for b in benchmarks/bench_*.py; do
    python "$b" --quick
  done
else
  echo "TPU backend unavailable (tunnel down?) — skipped on-chip sections"
fi
echo "CI OK"
