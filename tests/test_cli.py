"""End-to-end CLI tests over a synthetic on-disk HF checkpoint.

Builds a tiny Llama checkpoint (config.json + safetensors + a WordLevel
fast tokenizer), then drives calibrate -> quantize -> eval(ppl) -> serve
through micromix_tpu.cli main() exactly as a user would.
"""

import json
import os

import numpy as np
import pytest

from micromix_tpu.cli import main
from micromix_tpu.models import ModelConfig, random_dense_params
from micromix_tpu.models.loader import export_dense_params


VOCAB = 64


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("llama-tiny")
    cfg = ModelConfig(arch="llama", vocab_size=VOCAB, hidden_size=128,
                      intermediate_size=256, num_layers=2, num_heads=2,
                      num_kv_heads=2, head_dim=64, rope_theta=10000.0,
                      rms_eps=1e-6)
    params = random_dense_params(cfg, seed=0)
    from safetensors.numpy import save_file
    tensors = {k: v.astype(np.float32)
               for k, v in export_dense_params(params, cfg).items()}
    save_file(tensors, str(d / "model.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump({
            "model_type": "llama", "vocab_size": VOCAB,
            "hidden_size": 128, "intermediate_size": 256,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "num_key_value_heads": 2, "rope_theta": 10000.0,
            "rms_norm_eps": 1e-6,
        }, f)

    # WordLevel fast tokenizer over a toy vocab
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    words = {f"w{i}": i for i in range(VOCAB - 2)}
    words["[UNK]"] = VOCAB - 2
    words["</s>"] = VOCAB - 1
    tok = Tokenizer(WordLevel(vocab=words, unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(d / "tokenizer.json"))
    with open(d / "tokenizer_config.json", "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "eos_token": "</s>", "unk_token": "[UNK]",
                   "model_max_length": 2048}, f)
    return str(d)


def test_cli_calibrate_quantize_eval_serve(ckpt, tmp_path, capsys):
    calib = str(tmp_path / "calib.npz")
    main(["calibrate", "--model", ckpt, "--samples", "2", "--seqlen", "32",
          "--dataset", "synthetic", "--output", calib])
    assert os.path.exists(calib)

    qdir = str(tmp_path / "quantized")
    main(["quantize", "--model", ckpt, "--calibration", calib,
          "--output", qdir])
    assert os.path.exists(os.path.join(qdir, "manifest.json"))

    main(["eval", "--model", ckpt, "--quantized-ckpt", qdir,
          "--eval-ppl", "synthetic", "--seqlen", "32",
          "--log-dir", str(tmp_path / "results")])
    out = capsys.readouterr().out
    assert "perplexity" in out

    main(["eval", "--model", ckpt, "--weight-only", "mxfp8",
          "--eval-ppl", "synthetic", "--seqlen", "32",
          "--log-dir", str(tmp_path / "results")])
    out = capsys.readouterr().out
    assert "perplexity" in out

    prompts = tmp_path / "prompts.txt"
    prompts.write_text("w1 w2 w3\nw4 w5\n")
    main(["serve", "--model", ckpt, "--quantized-ckpt", qdir,
          "--prompts", str(prompts), "--max-new-tokens", "4",
          "--max-seqs", "2", "--page-size", "16", "--decode-chunk", "2",
          "--prefix-cache"])
    out = capsys.readouterr().out
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["requests"] == 2
    assert stats["decode_tokens"] > 0


def test_cli_hetero_quantize_and_serve(ckpt, tmp_path, capsys):
    """--hetero bakes the budgets-as-data representation; the checkpoint
    restores (FakeQuantSite nodes) and serves through the engine."""
    calib = str(tmp_path / "calib.npz")
    main(["calibrate", "--model", ckpt, "--samples", "2", "--seqlen", "32",
          "--dataset", "synthetic", "--output", calib])
    qdir = str(tmp_path / "hetero")
    main(["quantize", "--model", ckpt, "--calibration", calib,
          "--hetero", "--output", qdir])
    from micromix_tpu.models.checkpoint import load_params
    from micromix_tpu.models.hetero import FakeQuantSite
    params, cfg, _ = load_params(qdir)
    assert isinstance(params["layers"][0]["attn_site"], FakeQuantSite)

    prompts = tmp_path / "prompts.txt"
    prompts.write_text("w1 w2 w3\n")
    main(["serve", "--model", ckpt, "--quantized-ckpt", qdir,
          "--prompts", str(prompts), "--max-new-tokens", "4",
          "--max-seqs", "2", "--page-size", "16", "--decode-chunk", "2"])
    out = capsys.readouterr().out
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["decode_tokens"] > 0


def test_cli_serve_speculative(ckpt, tmp_path, capsys):
    """--draft-model enables speculative decoding from the shell: the
    draft HF dir loads dense, the engine reports an acceptance rate."""
    calib = str(tmp_path / "calib.npz")
    main(["calibrate", "--model", ckpt, "--samples", "2", "--seqlen", "32",
          "--dataset", "synthetic", "--output", calib])
    qdir = str(tmp_path / "quantized")
    main(["quantize", "--model", ckpt, "--calibration", calib,
          "--output", qdir])
    capsys.readouterr()

    prompts = tmp_path / "prompts.txt"
    prompts.write_text("w1 w2 w3\nw4 w5\n")
    # the tiny checkpoint doubles as its own draft (a real deployment
    # would point at a smaller model; the CLI path is identical)
    main(["serve", "--model", ckpt, "--quantized-ckpt", qdir,
          "--prompts", str(prompts), "--max-new-tokens", "4",
          "--max-seqs", "2", "--page-size", "16", "--decode-chunk", "2",
          "--draft-model", ckpt, "--spec-gamma", "2"])
    out = capsys.readouterr().out
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["requests"] == 2
    assert stats["decode_tokens"] > 0
    assert "spec_accept_rate" in stats
    assert 0.0 <= stats["spec_accept_rate"] <= 1.0


def test_cli_serve_plookup(ckpt, tmp_path, capsys):
    """--spec-ngram enables draft-free prompt-lookup speculation from
    the shell (no --draft-model needed)."""
    calib = str(tmp_path / "calib.npz")
    main(["calibrate", "--model", ckpt, "--samples", "2", "--seqlen", "32",
          "--dataset", "synthetic", "--output", calib])
    qdir = str(tmp_path / "quantized")
    main(["quantize", "--model", ckpt, "--calibration", calib,
          "--output", qdir])
    capsys.readouterr()

    prompts = tmp_path / "prompts.txt"
    prompts.write_text("w1 w2 w1 w2 w1\nw4 w5\n")
    main(["serve", "--model", ckpt, "--quantized-ckpt", qdir,
          "--prompts", str(prompts), "--max-new-tokens", "6",
          "--max-seqs", "2", "--page-size", "16", "--decode-chunk", "2",
          "--spec-ngram", "2", "--spec-gamma", "2"])
    out = capsys.readouterr().out
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["requests"] == 2
    assert stats["decode_tokens"] > 0
    assert "spec_accept_rate" in stats
    assert 0.0 <= stats["spec_accept_rate"] <= 1.0


def test_cli_serve_http_api(ckpt, tmp_path):
    """serve --port runs the OpenAI-style HTTP server from the shell:
    boot it as a subprocess over the synthetic checkpoint and hit
    /health and /v1/completions like a client would."""
    import http.client
    import socket
    import subprocess
    import sys
    import time as _time

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [sys.executable, "-m", "micromix_tpu.cli", "--platform", "cpu",
         "serve", "--model", ckpt, "--weight-only", "mxfp8",
         "--max-seqs", "2", "--page-size", "16", "--decode-chunk", "2",
         "--port", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    try:
        line = proc.stdout.readline()  # blocks until the server is up
        if not line:
            raise AssertionError(proc.stderr.read())
        assert json.loads(line)["serving"].endswith(str(port)), line
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("GET", "/health")
        assert conn.getresponse().status == 200
        conn.close()
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/v1/completions",
                     json.dumps({"prompt": "w1 w2 w3", "max_tokens": 3}),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        out = json.loads(resp.read())
        conn.close()
        assert out["usage"]["completion_tokens"] == 3
        assert out["choices"][0]["text"].strip()
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_cli_serve_tensor_parallel(ckpt, tmp_path, capsys):
    """serve --tp 2 quantizes shard-locally at startup and runs the
    shard-mapped engine over the first two (virtual CPU) devices."""
    calib = str(tmp_path / "calib.npz")
    main(["calibrate", "--model", ckpt, "--samples", "2", "--seqlen", "32",
          "--dataset", "synthetic", "--output", calib])
    capsys.readouterr()

    prompts = tmp_path / "prompts.txt"
    prompts.write_text("w1 w2 w3\nw4 w5\n")
    main(["serve", "--model", ckpt, "--do-quant", "--calibration", calib,
          "--tp", "2", "--prompts", str(prompts), "--max-new-tokens", "4",
          "--max-seqs", "2", "--page-size", "16", "--decode-chunk", "2"])
    out = capsys.readouterr().out
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["requests"] == 2
    assert stats["decode_tokens"] > 0

    # hetero representation through the same flag
    main(["serve", "--model", ckpt, "--do-quant", "--hetero",
          "--calibration", calib, "--tp", "2",
          "--prompts", str(prompts), "--max-new-tokens", "3",
          "--max-seqs", "2", "--page-size", "16", "--decode-chunk", "2"])
    out = capsys.readouterr().out
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["decode_tokens"] > 0


@pytest.fixture(scope="module")
def moe_ckpt(tmp_path_factory):
    """Tiny on-disk Mixtral checkpoint (config + safetensors + tokenizer)."""
    from micromix_tpu.models.loader import export_dense_params

    d = tmp_path_factory.mktemp("mixtral-tiny")
    cfg = ModelConfig(arch="mixtral", vocab_size=VOCAB, hidden_size=128,
                      intermediate_size=256, num_layers=2, num_heads=2,
                      num_kv_heads=2, head_dim=64, rope_theta=10000.0,
                      rms_eps=1e-6, num_experts=4, num_experts_per_tok=2)
    params = random_dense_params(cfg, seed=4)
    from safetensors.numpy import save_file
    tensors = {k: v.astype(np.float32)
               for k, v in export_dense_params(params, cfg).items()}
    save_file(tensors, str(d / "model.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump({
            "model_type": "mixtral", "vocab_size": VOCAB,
            "hidden_size": 128, "intermediate_size": 256,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "num_key_value_heads": 2, "rope_theta": 10000.0,
            "rms_norm_eps": 1e-6, "num_local_experts": 4,
            "num_experts_per_tok": 2,
        }, f)
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    words = {f"w{i}": i for i in range(VOCAB - 2)}
    words["[UNK]"] = VOCAB - 2
    words["</s>"] = VOCAB - 1
    tok = Tokenizer(WordLevel(vocab=words, unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(d / "tokenizer.json"))
    with open(d / "tokenizer_config.json", "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "eos_token": "</s>", "unk_token": "[UNK]",
                   "model_max_length": 2048}, f)
    return str(d)


def test_cli_serve_expert_parallel(moe_ckpt, tmp_path, capsys):
    """serve --ep 2: quantizes + groups experts at startup and serves
    through the expert-sharded engine on the first two CPU devices."""
    calib = str(tmp_path / "calib.npz")
    main(["calibrate", "--model", moe_ckpt, "--samples", "2",
          "--seqlen", "32", "--dataset", "synthetic", "--output", calib])
    capsys.readouterr()

    prompts = tmp_path / "prompts.txt"
    prompts.write_text("w1 w2 w3\nw4 w5\n")
    main(["serve", "--model", moe_ckpt, "--do-quant",
          "--calibration", calib, "--ep", "2",
          "--prompts", str(prompts), "--max-new-tokens", "4",
          "--max-seqs", "2", "--page-size", "16", "--decode-chunk", "2"])
    out = capsys.readouterr().out
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["requests"] == 2
    assert stats["decode_tokens"] > 0

    # guard rails: --ep on a dense model / --ep with --tp must refuse
    import pytest as _pt
    with _pt.raises(SystemExit):
        main(["serve", "--model", moe_ckpt, "--do-quant", "--ep", "2",
              "--tp", "2", "--prompts", str(prompts)])
