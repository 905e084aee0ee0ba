"""Smoke the benchmark suite in --quick mode (CPU, tiny shapes).

Each bench must run end to end and print valid one-line-JSON records —
the same scripts the driver and users run on real TPU hardware.
"""

import io
import json
import sys
from contextlib import redirect_stdout
from pathlib import Path

import pytest

BENCH_DIR = Path(__file__).resolve().parent.parent / "benchmarks"
sys.path.insert(0, str(BENCH_DIR))


def _run(mod_name, argv):
    import importlib
    mod = importlib.import_module(mod_name)
    buf = io.StringIO()
    with redirect_stdout(buf):
        mod.main(argv)
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert lines, f"{mod_name} printed nothing"
    for ln in lines:
        rec = json.loads(ln)
        assert {"metric", "value", "unit"} <= set(rec), rec
        assert rec["value"] > 0, rec
    return [json.loads(ln) for ln in lines]


@pytest.mark.parametrize("mod", [
    "bench_gemm", "bench_quantize", "bench_quantize_gemm",
    "bench_formats", "bench_bf16", "bench_fused",
    "bench_flash_prefill",
])
def test_bench_quick(mod):
    _run(mod, ["--quick"])


def test_bench_e2e_quick():
    recs = _run("bench_e2e", ["--quick"])
    assert recs[0]["decode_tokens"] > 0


def test_bench_speculative_quick():
    recs = _run("bench_speculative", ["--quick", "--baseline"])
    assert recs[0]["decode_tokens"] > 0
    assert 0.0 <= recs[0]["acceptance"] <= 1.0


def test_bench_moe_decode_quick():
    recs = _run("bench_moe_decode", ["--quick"])
    assert recs[0]["decode_tokens"] > 0
    assert recs[0]["compile_s"] > 0
