"""HTTP serving front-end (serve/api.py): OpenAI-style completions API.

Drives a real ThreadingHTTPServer on an ephemeral port over the
continuous-batching engine: blocking and streaming completions,
concurrent clients, stop strings, logprobs, and the ops endpoints.
A whitespace-int "tokenizer" keeps text<->ids trivially invertible.
"""

import http.client
import json
import threading

import numpy as np
import pytest

from micromix_tpu.models import ModelConfig, random_dense_params
from micromix_tpu.serve import ApiServer, Engine


def _cfg():
    return ModelConfig(arch="llama", vocab_size=96, hidden_size=128,
                       intermediate_size=256, num_layers=2, num_heads=2,
                       num_kv_heads=2, head_dim=64, rope_theta=10000.0,
                       rms_eps=1e-6)


def _encode(s):
    return [int(w) for w in s.split()]


def _decode(ids):
    return " ".join(str(int(i)) for i in ids)


@pytest.fixture(scope="module")
def server():
    cfg = _cfg()
    params = random_dense_params(cfg, seed=7)
    eng = Engine(params, cfg, max_seqs=2, page_size=16,
                 max_pages_per_seq=8, prefill_buckets=(16, 32),
                 decode_chunk=2)
    srv = ApiServer(eng, _encode, _decode, model_name="tiny-llama",
                    chat_template=lambda msgs: " ".join(
                        m.get("content", "") for m in msgs))
    srv.start()
    yield srv
    srv.close()


def _post(srv, path, body):
    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=300)
    conn.request("POST", path, json.dumps(body),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def _get(srv, path):
    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=60)
    conn.request("GET", path)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def test_completion_roundtrip(server):
    status, data = _post(server, "/v1/completions",
                         {"prompt": "5 6 7", "max_tokens": 4})
    assert status == 200
    out = json.loads(data)
    assert out["object"] == "text_completion"
    assert out["model"] == "tiny-llama"
    choice = out["choices"][0]
    toks = _encode(choice["text"])
    assert len(toks) == 4
    assert all(0 <= t < 96 for t in toks)
    assert choice["finish_reason"] == "length"
    assert out["usage"] == {"prompt_tokens": 3, "completion_tokens": 4,
                            "total_tokens": 7}


def test_minp_through_api(server):
    """min_p=1.0 at temperature 1.0 keeps only the argmax, so the
    result must equal the greedy completion of the same prompt."""
    _, d1 = _post(server, "/v1/completions",
                  {"prompt": "15 16", "max_tokens": 3,
                   "temperature": 1.0, "min_p": 1.0})
    _, d2 = _post(server, "/v1/completions",
                  {"prompt": "15 16", "max_tokens": 3})
    assert json.loads(d1)["choices"][0]["text"] == \
        json.loads(d2)["choices"][0]["text"]


def test_pretokenized_prompt_and_logprobs(server):
    status, data = _post(server, "/v1/completions",
                         {"prompt": [9, 10, 11], "max_tokens": 3,
                          "logprobs": True})
    assert status == 200
    out = json.loads(data)
    lp = out["choices"][0]["logprobs"]["token_logprobs"]
    assert len(lp) == 3
    assert all(p <= 0.0 for p in lp)


def test_streaming_sse(server):
    conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                      timeout=300)
    conn.request("POST", "/v1/completions",
                 json.dumps({"prompt": "1 2 3", "max_tokens": 4,
                             "stream": True}),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "text/event-stream"
    raw = resp.read().decode()
    conn.close()
    events = [ln[len("data: "):] for ln in raw.splitlines()
              if ln.startswith("data: ")]
    assert events[-1] == "[DONE]"
    deltas, finish = [], None
    for e in events[:-1]:
        obj = json.loads(e)
        deltas.append(obj["choices"][0]["text"])
        if obj["choices"][0]["finish_reason"]:
            finish = obj["choices"][0]["finish_reason"]
    streamed = "".join(deltas)
    assert len(_encode(streamed)) == 4
    assert finish == "length"

    # the streamed text equals the blocking answer for the same prompt
    # (greedy, same engine -> same program)
    _, data = _post(server, "/v1/completions",
                    {"prompt": "1 2 3", "max_tokens": 4})
    assert json.loads(data)["choices"][0]["text"].strip() == \
        streamed.strip()


def test_concurrent_clients(server):
    results = {}

    def go(i):
        _, data = _post(server, "/v1/completions",
                        {"prompt": f"{i} {i + 1}", "max_tokens": 3})
        results[i] = json.loads(data)

    ts = [threading.Thread(target=go, args=(i,)) for i in (20, 30, 40)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert len(results) == 3
    for i, out in results.items():
        assert len(_encode(out["choices"][0]["text"])) == 3


def test_stop_string_truncates(server):
    # find what the model actually emits, then stop on a 2-token
    # substring of it (multi-token stop -> host-side string matching)
    _, data = _post(server, "/v1/completions",
                    {"prompt": "8 9", "max_tokens": 6})
    full = _encode(json.loads(data)["choices"][0]["text"])
    stop = f"{full[2]} {full[3]}"
    _, data = _post(server, "/v1/completions",
                    {"prompt": "8 9", "max_tokens": 6, "stop": stop})
    out = json.loads(data)
    assert out["choices"][0]["finish_reason"] == "stop"
    got = out["choices"][0]["text"]
    # truncated at the EARLIEST stop occurrence: a strict prefix of the
    # unstopped text, free of the stop string (the model may repeat
    # tokens, so the cut can land before position 2)
    assert stop not in got
    assert len(_encode(got)) < len(full)
    assert _decode(full).startswith(got.strip() or got)


def test_stop_token_ids(server):
    _, data = _post(server, "/v1/completions",
                    {"prompt": "3 4", "max_tokens": 6})
    full = _encode(json.loads(data)["choices"][0]["text"])
    _, data = _post(server, "/v1/completions",
                    {"prompt": "3 4", "max_tokens": 6,
                     "stop_token_ids": [full[1]]})
    out = json.loads(data)
    got = _encode(out["choices"][0]["text"])
    # engine stops AT the stop token (not emitted)
    assert got == full[:1]
    assert out["choices"][0]["finish_reason"] == "stop"


def test_chat_completion(server):
    status, data = _post(server, "/v1/chat/completions",
                         {"messages": [{"role": "user",
                                        "content": "12 13 14"}],
                          "max_tokens": 3})
    assert status == 200
    out = json.loads(data)
    assert out["object"] == "chat.completion"
    msg = out["choices"][0]["message"]
    assert msg["role"] == "assistant"
    assert len(_encode(msg["content"])) == 3
    # the fixture template renders messages to just their content, so
    # chat and plain completions over the same text must agree (greedy)
    _, data2 = _post(server, "/v1/completions",
                     {"prompt": "12 13 14", "max_tokens": 3})
    assert json.loads(data2)["choices"][0]["text"].strip() == \
        msg["content"].strip()


def test_chat_streaming(server):
    conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                      timeout=300)
    conn.request("POST", "/v1/chat/completions",
                 json.dumps({"messages": [{"role": "user",
                                           "content": "7 8"}],
                             "max_tokens": 3, "stream": True}),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    raw = resp.read().decode()
    conn.close()
    events = [json.loads(ln[len("data: "):]) for ln in raw.splitlines()
              if ln.startswith("data: ") and not ln.endswith("[DONE]")]
    assert raw.rstrip().splitlines()[-1].endswith("[DONE]") or \
        any("[DONE]" in ln for ln in raw.splitlines())
    assert events[0]["object"] == "chat.completion.chunk"
    assert events[0]["choices"][0]["delta"] == {"role": "assistant"}
    content = "".join(e["choices"][0]["delta"].get("content", "")
                      for e in events)
    assert len(_encode(content)) == 3
    assert events[-1]["choices"][0]["finish_reason"] == "length"


def test_ops_endpoints(server):
    status, data = _get(server, "/health")
    assert status == 200 and json.loads(data)["status"] == "ok"
    status, data = _get(server, "/v1/models")
    assert status == 200
    assert json.loads(data)["data"][0]["id"] == "tiny-llama"
    status, data = _get(server, "/metrics")
    assert status == 200
    text = data.decode()
    assert "micromix_requests_total" in text
    assert "micromix_decode_tokens_total" in text
    status, _ = _get(server, "/nope")
    assert status == 404


def test_bad_request_json(server):
    conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                      timeout=60)
    conn.request("POST", "/v1/completions", "{not json",
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 400
    resp.read()
    conn.close()
