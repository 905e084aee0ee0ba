"""CLI drivers.

Equivalents of the reference entry points:
  * ``python -m micromix_tpu.cli calibrate``  <- reorder_indices.py
  * ``python -m micromix_tpu.cli eval``       <- model/main.py
(`test.sh`'s three jobs = eval with --eval-ppl / --tasks).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time


def _load_model(args):
    from .models.loader import load_dense_params, config_from_hf
    with open(os.path.join(args.model, "config.json")) as f:
        cfg = config_from_hf(json.load(f))
    params = load_dense_params(args.model, cfg)
    return cfg, params


def _tokenizer(args):
    from transformers import AutoTokenizer
    return AutoTokenizer.from_pretrained(args.model, use_fast=True)


def cmd_calibrate(args) -> None:
    from .calib import collect_calibration, save_calibration, stats_to_calibration
    from .calib.allocate import average_bits
    from .eval.datasets import get_loaders

    cfg, params = _load_model(args)
    tok = _tokenizer(args)
    t0 = time.time()
    batches, _ = get_loaders(args.dataset, tok, seqlen=args.seqlen,
                             nsamples=args.samples)
    stats = collect_calibration(params, cfg, batches, lamda=args.lamda)
    calibs = stats_to_calibration(stats, cfg)
    print(f"average bits: {average_bits(calibs, cfg):.3f}")
    print(f"calibration time: {time.time() - t0:.1f}s")
    save_calibration(args.output, calibs, stats)
    print(f"saved -> {args.output}")


def _load_and_smooth(params, cfg, args):
    """Shared calibrate-artifact load + SmoothQuant step (single-chip
    and --tp quantization must apply identical smoothing)."""
    from .calib import load_calibration, smooth_params

    calibs, absmax = load_calibration(args.calibration)
    if args.smooth and absmax:
        stats = {k: {"absmax": v} for k, v in absmax.items()}
        params = smooth_params(params, cfg, stats, alpha=args.alpha)
    return params, calibs


def _quantize(params, cfg, args):
    from .models.surgery import quantize_model

    params, calibs = _load_and_smooth(params, cfg, args)
    if getattr(args, "hetero", False):
        # budgets-as-data representation (models/hetero.py): stackable /
        # shardable under pp/tp/ep regardless of per-layer budgets
        from .models.hetero import quantize_model_hetero
        return quantize_model_hetero(params, cfg, calibs)
    return quantize_model(params, cfg, calibs,
                          weight_fp4_only=not args.symmetric_weights)


def cmd_quantize(args) -> None:
    """Bake smoothing + reorder + MX packing once; persist the result.

    The reference re-runs model surgery at every startup
    (model/model_utils.py:24-46); this writes the packed pytree so serving
    starts are a deserialize, not a re-quantize.
    """
    from .models.checkpoint import save_params

    cfg, params = _load_model(args)
    if getattr(args, "int8_turbo", False):
        from .models.surgery import quantize_model_int8_turbo
        params = quantize_model_int8_turbo(params, cfg)
    elif args.weight_only:
        from .models.surgery import quantize_model_weight_only
        params = quantize_model_weight_only(params, cfg, args.weight_only)
    else:
        params = _quantize(params, cfg, args)
    save_params(args.output, params, cfg,
                meta={"source": args.model,
                      "calibration": args.calibration,
                      "symmetric_weights": args.symmetric_weights})
    print(f"quantized checkpoint -> {args.output}")


def cmd_eval(args) -> None:
    import numpy as np
    from .eval.datasets import get_loaders
    from .eval.ppl import eval_ppl

    if getattr(args, "quantized_ckpt", None):
        from .models.checkpoint import load_params
        params, cfg, _ = load_params(args.quantized_ckpt)
        assert cfg is not None, "checkpoint has no ModelConfig"
    else:
        cfg, params = _load_model(args)
        if getattr(args, "weight_only", None):
            from .models.surgery import quantize_model_weight_only
            params = quantize_model_weight_only(params, cfg,
                                                args.weight_only)
        elif args.do_quant:
            params = _quantize(params, cfg, args)
    tok = _tokenizer(args)

    results = {}
    if args.eval_ppl:
        for name in args.eval_ppl.split(","):
            _, stream = get_loaders(name, tok)
            ppl = eval_ppl(params, cfg, stream, seqlen=args.seqlen,
                           kv_quant_bits=args.kv_bits,
                           progress=lambda i, n: print(
                               f"\r{name} {i}/{n}", end="", flush=True))
            print()
            results[f"ppl/{name}"] = ppl
            print(f"{name} perplexity: {ppl:.4f}")

    if args.tasks:
        from .eval.lm_eval_adapter import Scorer, run_lm_eval
        scorer = Scorer(params, cfg, max_len=args.seqlen,
                        kv_quant_bits=args.kv_bits)
        out = run_lm_eval(scorer, tok, args.tasks.split(","),
                          num_fewshot=args.num_fewshot, limit=args.limit)
        results["lm_eval"] = out["results"]
        print(json.dumps(out["results"], indent=2, default=str))

    if args.log_dir:
        os.makedirs(args.log_dir, exist_ok=True)
        stamp = time.strftime("%Y%m%d-%H%M%S")
        with open(os.path.join(args.log_dir, f"log_{stamp}.json"), "w") as f:
            json.dump(results, f, indent=2, default=str)


def cmd_serve(args) -> None:
    """Batch-generate with the continuous-batching engine.

    The serving entry point the reference lacks entirely (its FlashInfer
    kernels were bound but never driven, SURVEY.md §1).  Reads one prompt
    per line, streams them through the engine, prints completions + stats.
    """
    import numpy as np
    from .serve import Engine, Request
    from .serve.sampling import SamplingParams

    if args.tp > 1 and args.ep > 1:
        raise SystemExit("--tp and --ep are mutually exclusive (TP serves "
                         "dense models; EP serves Mixtral experts)")
    if (args.tp > 1 or args.ep > 1) and (args.quantized_ckpt
                                         or args.weight_only):
        # validate BEFORE deserializing a multi-GB checkpoint: --tp
        # quantizes shard-locally from dense weights at startup (baked
        # single-chip layouts / weight-only pytrees cannot be resharded)
        raise SystemExit("--tp requires --do-quant from a dense model "
                         "(not --quantized-ckpt or --weight-only)")
    if args.quantized_ckpt:
        from .models.checkpoint import load_params
        params, cfg, _ = load_params(args.quantized_ckpt)
        assert cfg is not None, "checkpoint has no ModelConfig"
    else:
        cfg, params = _load_model(args)
        if getattr(args, "weight_only", None):
            from .models.surgery import quantize_model_weight_only
            params = quantize_model_weight_only(params, cfg,
                                                args.weight_only)
        elif args.do_quant and args.tp <= 1 and args.ep <= 1:
            params = _quantize(params, cfg, args)
    tok = _tokenizer(args)

    if not args.port and not args.prompts:
        raise SystemExit("serve: need --prompts FILE (batch mode) or "
                         "--port N (HTTP API mode)")
    prompts = []
    if args.prompts:
        with open(args.prompts) as f:
            prompts = [ln.rstrip("\n") for ln in f if ln.strip()]
    spec_kw = {}
    if getattr(args, "draft_model", None):
        # speculative decoding: the draft stays dense bf16 (it is small;
        # quantizing it would trade acceptance rate for nothing — the
        # target model dominates both HBM and FLOPs)
        from .models.loader import config_from_hf, load_dense_params
        with open(os.path.join(args.draft_model, "config.json")) as f:
            dcfg = config_from_hf(json.load(f))
        spec_kw = dict(draft_params=load_dense_params(args.draft_model,
                                                      dcfg),
                       draft_cfg=dcfg, spec_gamma=args.spec_gamma)
    elif getattr(args, "spec_ngram", 0):
        spec_kw = dict(spec_ngram=args.spec_ngram,
                       spec_gamma=args.spec_gamma)
    eng_kw = dict(max_seqs=args.max_seqs, page_size=args.page_size,
                  kv_bits=args.kv_bits or 4,
                  decode_chunk=args.decode_chunk,
                  prefix_cache=args.prefix_cache, **spec_kw)
    if args.tp > 1:
        # multi-chip serving: TP-quantize from the dense checkpoint
        # (shard-local budgets differ from the single-chip layout; the
        # incompatible input modes were rejected before loading above)
        import jax
        from .parallel import make_mesh
        from .parallel.tp_serve import make_tp_engine
        params, calibs = _load_and_smooth(params, cfg, args)
        if args.hetero:
            from .parallel.tp_hetero import quantize_model_tp_hetero
            tparams = quantize_model_tp_hetero(params, cfg, calibs, args.tp)
        else:
            from .parallel.tp_quant import quantize_model_tp
            tparams = quantize_model_tp(
                params, cfg, calibs, args.tp,
                weight_fp4_only=not args.symmetric_weights)
        mesh = make_mesh(data=1, model=args.tp,
                         devices=jax.devices()[:args.tp])
        eng = make_tp_engine(tparams, cfg, mesh, **eng_kw)
    elif args.ep > 1:
        # expert-parallel Mixtral serving: quantize + group the experts,
        # shard them over the mesh's "expert" axis (parallel/ep_serve.py
        # — the deployment path for true 8x7B, which cannot even compile
        # single-chip; docs/perf_notes.md)
        import jax
        from .parallel import make_mesh
        from .parallel.ep_serve import make_ep_engine, quantize_model_ep
        if not cfg.is_moe:
            raise SystemExit("--ep requires a Mixtral (MoE) checkpoint")
        params, calibs = _load_and_smooth(params, cfg, args)
        qm = quantize_model_ep(params, cfg, calibs)
        mesh = make_mesh(expert=args.ep, devices=jax.devices()[:args.ep])
        eng = make_ep_engine(qm, cfg, mesh, **eng_kw)
    else:
        eng = Engine(params, cfg, **eng_kw)
    if args.port:
        # HTTP API mode: OpenAI-style completions server over the engine
        from .serve.api import ApiServer
        chat_tpl = None
        if getattr(tok, "chat_template", None):
            chat_tpl = lambda msgs: tok.apply_chat_template(  # noqa: E731
                msgs, tokenize=False, add_generation_prompt=True)
        srv = ApiServer(
            eng, lambda s: tok(s)["input_ids"],
            lambda ids: tok.decode(ids, skip_special_tokens=True),
            model_name=os.path.basename(args.model.rstrip("/")),
            eos_id=tok.eos_token_id, chat_template=chat_tpl,
            port=args.port)
        print(json.dumps({"serving": f"http://127.0.0.1:{srv.port}",
                          "endpoints": ["/v1/completions",
                                        "/v1/chat/completions",
                                        "/v1/models", "/health",
                                        "/metrics"]}),
              flush=True)
        srv.serve_forever()
        return
    sampling = SamplingParams(temperature=args.temperature,
                              top_k=args.top_k, top_p=args.top_p,
                              min_p=args.min_p)
    reqs = [
        Request(req_id=i, prompt=tok(p)["input_ids"],
                max_new_tokens=args.max_new_tokens, sampling=sampling,
                eos_id=tok.eos_token_id)
        for i, p in enumerate(prompts)
    ]
    t0 = time.time()
    if args.profile:
        from .utils.profiling import trace
        with trace(args.profile):
            eng.run(reqs)
    else:
        eng.run(reqs)
    dt = time.time() - t0
    for r in reqs:
        print(f"--- [{r.req_id}] ---")
        print(tok.decode(r.output, skip_special_tokens=True))
    ttfts = [eng.ttft[r.req_id] for r in reqs if r.req_id in eng.ttft]
    stats = {
        "requests": len(reqs),
        "prefill_tokens": eng.prefill_tokens,
        "decode_tokens": eng.decode_tokens,
        "preemptions": eng.preemptions,
        "wall_s": round(dt, 3),
        "decode_tokens_per_s": round(eng.decode_tokens / dt, 2),
        "mean_ttft_ms": round(1e3 * float(np.mean(ttfts)), 2),
        # host wall seconds per engine phase ("mixed" = piggybacked
        # prefill+decode dispatches); the --profile trace has the
        # device-side view, this is the scheduler-side breakdown
        "phase_s": {k: round(v, 3) for k, v in eng.phase_s.items() if v},
    }
    if eng.spec_proposed:
        stats["spec_accept_rate"] = round(
            eng.spec_accepted / eng.spec_proposed, 3)
    if eng.prefix_hit_tokens:
        stats["prefix_hit_tokens"] = eng.prefix_hit_tokens
    print(json.dumps(stats))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="micromix_tpu")
    ap.add_argument("--platform", choices=("auto", "cpu"), default="auto",
                    help="force the jax platform (cpu = run without TPU "
                         "access, e.g. smoke-testing when the device "
                         "tunnel is unavailable)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("calibrate", help="reorder-index calibration")
    c.add_argument("--model", required=True, help="local HF checkpoint dir")
    c.add_argument("--samples", type=int, default=32)
    c.add_argument("--seqlen", type=int, default=2048)
    c.add_argument("--lamda", type=float, default=1.0)
    c.add_argument("--dataset", default="wikitext2")
    c.add_argument("--output", default="saved/calibration.npz")
    c.set_defaults(fn=cmd_calibrate)

    q = sub.add_parser("quantize",
                       help="bake + persist a quantized checkpoint")
    q.add_argument("--model", required=True, help="local HF checkpoint dir")
    q.add_argument("--calibration", default="saved/calibration.npz")
    q.add_argument("--smooth", action="store_true", default=True)
    q.add_argument("--no-smooth", dest="smooth", action="store_false")
    q.add_argument("--alpha", type=float, default=0.5)
    q.add_argument("--symmetric-weights", action="store_true")
    q.add_argument("--hetero", action="store_true",
                   help="budgets-as-data hetero representation "
                        "(stackable/shardable under pp/tp/ep)")
    q.add_argument("--int8-turbo", action="store_true",
                   help="W8A8 int8 on the s8 MXU (out-of-spec speed mode, "
                        "not MicroMix numerics)")
    q.add_argument("--weight-only", choices=("mxfp4", "mxfp6", "mxfp8"),
                   default=None)
    q.add_argument("--output", default="saved/quantized")
    q.set_defaults(fn=cmd_quantize)

    e = sub.add_parser("eval", help="perplexity / lm-eval tasks")
    e.add_argument("--model", required=True)
    e.add_argument("--quantized-ckpt", default=None,
                   help="load a baked quantized checkpoint (skips surgery)")
    e.add_argument("--do-quant", action="store_true")
    e.add_argument("--weight-only", choices=("mxfp4", "mxfp6", "mxfp8"),
                   default=None,
                   help="weight-only MX quantization (no calibration)")
    e.add_argument("--calibration", default="saved/calibration.npz")
    e.add_argument("--smooth", action="store_true", default=True)
    e.add_argument("--no-smooth", dest="smooth", action="store_false")
    e.add_argument("--alpha", type=float, default=0.5)
    e.add_argument("--symmetric-weights", action="store_true",
                   help="W4/6/8 per segment instead of all-MXFP4 weights")
    e.add_argument("--hetero", action="store_true",
                   help="budgets-as-data hetero representation "
                        "(stackable/shardable under pp/tp/ep)")
    e.add_argument("--eval-ppl", default="", help="comma list: wikitext2,ptb,c4")
    e.add_argument("--tasks", default="", help="lm-eval task list")
    e.add_argument("--num-fewshot", type=int, default=0)
    e.add_argument("--limit", type=int, default=None)
    e.add_argument("--seqlen", type=int, default=2048)
    e.add_argument("--kv-bits", type=int, default=None,
                   help="int-group KV fake quant bits (e.g. 4)")
    e.add_argument("--log-dir", default="results")
    e.set_defaults(fn=cmd_eval)

    s = sub.add_parser("serve", help="batch generation (continuous batching)")
    s.add_argument("--model", required=True)
    s.add_argument("--quantized-ckpt", default=None)
    s.add_argument("--do-quant", action="store_true")
    s.add_argument("--weight-only", choices=("mxfp4", "mxfp6", "mxfp8"),
                   default=None, help="weight-only MX mode (bf16 acts)")
    s.add_argument("--calibration", default="saved/calibration.npz")
    s.add_argument("--smooth", action="store_true", default=True)
    s.add_argument("--no-smooth", dest="smooth", action="store_false")
    s.add_argument("--alpha", type=float, default=0.5)
    s.add_argument("--symmetric-weights", action="store_true")
    s.add_argument("--hetero", action="store_true",
                   help="budgets-as-data hetero representation "
                        "(stackable/shardable under pp/tp/ep)")
    s.add_argument("--prompts", default=None,
                   help="file, one prompt/line (batch mode)")
    s.add_argument("--port", type=int, default=0, metavar="N",
                   help="run an OpenAI-style completions HTTP server "
                        "instead of batch mode (/v1/completions, "
                        "/v1/models, /health, /metrics)")
    s.add_argument("--max-new-tokens", type=int, default=128)
    s.add_argument("--max-seqs", type=int, default=8)
    s.add_argument("--page-size", type=int, default=128)
    s.add_argument("--kv-bits", type=int, default=4)
    s.add_argument("--decode-chunk", type=int, default=8)
    s.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel ways (shards weights + KV heads "
                        "over the first N devices; implies --do-quant)")
    s.add_argument("--ep", type=int, default=1,
                   help="expert-parallel ways for Mixtral checkpoints "
                        "(shards grouped experts over the first N "
                        "devices; implies --do-quant)")
    s.add_argument("--prefix-cache", action="store_true",
                   help="share KV pages across requests with common "
                        "prompt prefixes (quantized-prefix semantics)")
    s.add_argument("--draft-model", default=None, metavar="DIR",
                   help="HF checkpoint dir of a small draft model; "
                        "enables speculative decoding")
    s.add_argument("--spec-gamma", type=int, default=4,
                   help="draft tokens proposed per speculative round")
    s.add_argument("--spec-ngram", type=int, default=0, metavar="N",
                   help="draft-free prompt-lookup speculation: propose "
                        "continuations of the latest matching N-gram in "
                        "each request's own history (no draft model)")
    s.add_argument("--profile", default=None, metavar="LOGDIR",
                   help="capture a jax.profiler trace of the run")
    s.add_argument("--temperature", type=float, default=0.0)
    s.add_argument("--top-k", type=int, default=0)
    s.add_argument("--top-p", type=float, default=1.0)
    s.add_argument("--min-p", type=float, default=0.0,
                   help="keep tokens with prob >= min_p * max prob")
    s.set_defaults(fn=cmd_serve)

    args = ap.parse_args(argv)
    if args.platform == "cpu":
        # must land before any backend init (the container sitecustomize
        # registers a TPU backend and the env pins JAX_PLATFORMS to it)
        import jax
        jax.config.update("jax_platforms", "cpu")
    args.fn(args)


if __name__ == "__main__":
    main()
