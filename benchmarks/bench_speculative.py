"""Speculative-decoding benchmark: 8B-shape target + truncated draft.

Measures decode tokens/s with the engine in speculative mode vs the
plain decode-chunk baseline, and reports the measured acceptance rate.
With random weights the ACCEPTANCE is only as good as the draft/target
correlation — the default draft aliases the target's (shared) layer
stack truncated to --draft-layers plus the same lm_head, which keeps
hidden states correlated; real-model acceptance (0.7-0.9 in the
literature) should be read off the acceptance-vs-speedup line this
benchmark prints, not assumed.

Usage: python benchmarks/bench_speculative.py [--quick] [--batch N]
       [--gamma G] [--draft-layers N] [--baseline]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

import jax

_HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(_HERE))
sys.path.insert(0, str(_HERE.parent))
from timing import common_parser, emit  # noqa: E402
from bench_8b_decode import build_quantized  # noqa: E402


def main(argv=None) -> None:
    p = common_parser(__doc__)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--new-tokens", type=int, default=64)
    p.add_argument("--gamma", type=int, default=4)
    p.add_argument("--rounds", type=int, default=2)
    p.add_argument("--draft-layers", type=int, default=4)
    p.add_argument("--baseline", action="store_true",
                   help="also run the plain decode-chunk engine")
    args = p.parse_args(argv)

    from micromix_tpu.models import ModelConfig
    from micromix_tpu.serve import Engine, Request

    if args.quick:
        cfg = ModelConfig(arch="llama", vocab_size=512, hidden_size=512,
                          intermediate_size=1024, num_layers=4, num_heads=4,
                          num_kv_heads=2, head_dim=128, rope_theta=5e5,
                          rms_eps=1e-5)
        p6 = p8 = 128
        args.batch, args.new_tokens, args.draft_layers = 2, 8, 2
    else:
        cfg = ModelConfig(arch="llama", vocab_size=32000, hidden_size=4096,
                          intermediate_size=14336, num_layers=32,
                          num_heads=32, num_kv_heads=8, head_dim=128,
                          rope_theta=5e5, rms_eps=1e-5)
        p6 = p8 = 256

    params = build_quantized(cfg, p6, p8, share_layers=True)
    # draft: truncated alias of the target stack + the same lm_head
    import dataclasses
    dcfg = dataclasses.replace(cfg, num_layers=args.draft_layers)
    dparams = {**params, "layers": params["layers"][:args.draft_layers]}

    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(0, cfg.vocab_size, 12))
               for _ in range(args.batch)]

    def run_engine(**kw):
        eng = Engine(params, cfg, max_seqs=args.batch, page_size=128,
                     max_pages_per_seq=16, prefill_buckets=(16, 32), **kw)
        eng.run([Request(req_id=-1, prompt=[1, 2, 3], max_new_tokens=2)])
        eng.prefill_tokens = eng.decode_tokens = 0
        reqs = [Request(req_id=i, prompt=pr,
                        max_new_tokens=args.new_tokens)
                for i, pr in enumerate(prompts)]
        for r in reqs:
            eng.submit(r)
        while any(s.req is not None and s.pending for s in eng.slots) \
                or (eng.waiting and any(s.req is None for s in eng.slots)):
            eng._admit()
            for i, s in enumerate(eng.slots):
                if s.req is not None and s.pending:
                    eng._prefill_step(i)
        t0 = time.perf_counter()
        while eng.step():
            pass
        return eng, time.perf_counter() - t0

    eng, dt = run_engine(draft_params=dparams, draft_cfg=dcfg,
                         spec_gamma=args.gamma, spec_rounds=args.rounds)
    acc = (eng.spec_accepted / eng.spec_proposed
           if eng.spec_proposed else float("nan"))
    emit(f"spec decode tokens/s/chip B={args.batch} L={cfg.num_layers} "
         f"draft={args.draft_layers}L gamma={args.gamma}",
         eng.decode_tokens / dt, "tokens/s",
         decode_tokens=eng.decode_tokens, decode_s=round(dt, 3),
         acceptance=round(acc, 4),
         tokens_per_round=round(1 + acc * args.gamma, 3))

    if args.baseline:
        eng2, dt2 = run_engine(decode_chunk=args.rounds * (args.gamma + 1))
        emit(f"plain decode tokens/s/chip B={args.batch} "
             f"L={cfg.num_layers}",
             eng2.decode_tokens / dt2, "tokens/s",
             decode_tokens=eng2.decode_tokens, decode_s=round(dt2, 3))


if __name__ == "__main__":
    main()
