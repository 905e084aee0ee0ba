#!/usr/bin/env bash
# r5 on-chip measurement sequence (run after axon-tunnel recovery).
# Each step logs to /tmp/r5_<name>.log and is individually time-boxed;
# a failed step does not stop the rest.  Review logs, then update
# docs/perf_notes.md + BASELINE.md.
set -u
cd "$(dirname "$0")/.."
run() {
  name=$1; budget=$2; shift 2
  echo "=== $name ($*) budget ${budget}s ==="
  timeout "$budget" "$@" >"/tmp/r5_${name}.log" 2>&1
  echo "--- exit $? ; tail:"
  grep -v WARNING "/tmp/r5_${name}.log" | tail -5
}

# 0. kernel exactness on Mosaic (stack / sp / grouped / pair)
run validate 1800 python bench.py --validate

# 1. flagship A/B at the driver config: full r5 path, no-pair, no-stack
run e2e_r5      2400 python benchmarks/bench_8b_decode.py --share-layers --decode-chunk 16 --new-tokens 48
run e2e_nopair  2400 env MICROMIX_NO_PAIR=1 python benchmarks/bench_8b_decode.py --share-layers --decode-chunk 16 --new-tokens 48
run e2e_nostack 2400 env MICROMIX_NO_STACK=1 python benchmarks/bench_8b_decode.py --share-layers --decode-chunk 16 --new-tokens 48

# 2. MoE grouped-path decode at measured depth (dense + capacity dispatch)
run moe     2400 python benchmarks/bench_moe_decode.py --share-layers
run moe_cap 2400 python benchmarks/bench_moe_decode.py --share-layers --capacity 2.0

# 3. realistic prompt lengths (TTFT + prefill tok/s)
run prompt512  2400 python benchmarks/bench_8b_decode.py --share-layers --decode-chunk 16 --new-tokens 16 --prompt-len 512
run prompt2048 2700 python benchmarks/bench_8b_decode.py --share-layers --decode-chunk 16 --new-tokens 16 --prompt-len 2048

# 4. speculative at 8B shape (acceptance + tok/s, truncated drafts)
run spec4 2400 python benchmarks/bench_speculative.py --draft-layers 4 --baseline
run spec8 2400 python benchmarks/bench_speculative.py --draft-layers 8

# 5. capacity-first layout with the new SP glue
run splitplane 2400 python benchmarks/bench_8b_decode.py --share-layers --decode-chunk 16 --new-tokens 48 --layout splitplane

echo "=== all logs: /tmp/r5_*.log ==="
