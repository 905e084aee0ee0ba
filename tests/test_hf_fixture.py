"""HF checkpoint-directory fixtures (VERDICT r1 item 4b).

models/loader.py had only ever parsed self-exported flat checkpoints.
These fixtures reproduce the on-disk structure real HF repos ship —
sharded ``model-0000x-of-0000y.safetensors`` + ``model.safetensors.index
.json``, a Llama-3.1-style config.json with a rope_scaling dict and extra
HF keys, tied embeddings, Qwen2 qkv bias — and lock the loaded pytree
against the in-memory source.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from micromix_tpu.models import ModelConfig, random_dense_params
from micromix_tpu.models.loader import (
    config_from_hf, export_dense_params, load_dense_params)
from micromix_tpu.models.transformer import forward


LLAMA31_CONFIG = {
    # verbatim structure of meta-llama/Llama-3.1 config.json files
    "architectures": ["LlamaForCausalLM"],
    "attention_bias": False,
    "attention_dropout": 0.0,
    "bos_token_id": 128000,
    "eos_token_id": 128001,
    "hidden_act": "silu",
    "hidden_size": 128,
    "initializer_range": 0.02,
    "intermediate_size": 256,
    "max_position_embeddings": 131072,
    "mlp_bias": False,
    "model_type": "llama",
    "num_attention_heads": 4,
    "num_hidden_layers": 2,
    "num_key_value_heads": 2,
    "pretraining_tp": 1,
    "rms_norm_eps": 1e-05,
    "rope_scaling": {
        "factor": 8.0,
        "low_freq_factor": 1.0,
        "high_freq_factor": 4.0,
        "original_max_position_embeddings": 8192,
        "rope_type": "llama3",
    },
    "rope_theta": 500000.0,
    "tie_word_embeddings": True,
    "torch_dtype": "bfloat16",
    "transformers_version": "4.43.0",
    "use_cache": True,
    "vocab_size": 128,
}

QWEN2_CONFIG = {
    "architectures": ["Qwen2ForCausalLM"],
    "model_type": "qwen2",
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_attention_heads": 4,
    "num_hidden_layers": 2,
    "num_key_value_heads": 2,
    "rms_norm_eps": 1e-06,
    "rope_theta": 1000000.0,
    "sliding_window": 64,
    "use_sliding_window": True,
    "max_window_layers": 28,
    "tie_word_embeddings": False,
    "torch_dtype": "bfloat16",
    "vocab_size": 128,
}


def _write_sharded_checkpoint(path, tensors, config, n_shards=3):
    """Faithful HF layout: shard files + index.json + config.json."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    names = sorted(tensors)
    shards = [names[i::n_shards] for i in range(n_shards)]
    weight_map = {}
    total = 0
    for si, keys in enumerate(shards):
        fname = f"model-{si + 1:05d}-of-{n_shards:05d}.safetensors"
        save_file({k: np.ascontiguousarray(tensors[k]) for k in keys},
                  os.path.join(path, fname))
        for k in keys:
            weight_map[k] = fname
            total += tensors[k].nbytes
    with open(os.path.join(path, "model.safetensors.index.json"), "w") as f:
        json.dump({"metadata": {"total_size": total},
                   "weight_map": weight_map}, f)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config, f)


def test_llama31_sharded_tied_fixture(tmp_path, rng):
    cfg = config_from_hf(LLAMA31_CONFIG)
    assert cfg.rope_scaling == ("llama3", 8.0, 1.0, 4.0, 8192)
    assert cfg.tie_embeddings
    src = random_dense_params(cfg, seed=50)
    tensors = export_dense_params(src, cfg)
    # tied checkpoints do NOT ship lm_head.weight — drop it like HF does
    del tensors["lm_head.weight"]
    ckpt = str(tmp_path / "llama31")
    _write_sharded_checkpoint(ckpt, tensors, LLAMA31_CONFIG)

    params = load_dense_params(ckpt)
    # lm_head falls back to the tied embedding
    np.testing.assert_array_equal(np.asarray(params["lm_head"]),
                                  np.asarray(params["embed"]))
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 12)), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(forward(params, cfg, toks, use_flash=False)),
        np.asarray(forward(src, cfg, toks, use_flash=False)))


def test_qwen2_fixture_with_bias(tmp_path, rng):
    cfg = config_from_hf(QWEN2_CONFIG)
    assert cfg.qkv_bias and cfg.sliding_window == 64
    src = random_dense_params(cfg, seed=51)
    tensors = export_dense_params(src, cfg)
    assert any(k.endswith("q_proj.bias") for k in tensors)
    ckpt = str(tmp_path / "qwen2")
    _write_sharded_checkpoint(ckpt, tensors, QWEN2_CONFIG, n_shards=2)
    params = load_dense_params(ckpt)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 12)), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(forward(params, cfg, toks, use_flash=False)),
        np.asarray(forward(src, cfg, toks, use_flash=False)))


def test_index_json_missing_shard_raises(tmp_path):
    cfg = config_from_hf(QWEN2_CONFIG)
    tensors = export_dense_params(random_dense_params(cfg, seed=52), cfg)
    ckpt = str(tmp_path / "broken")
    _write_sharded_checkpoint(ckpt, tensors, QWEN2_CONFIG, n_shards=2)
    os.remove(os.path.join(ckpt, "model-00002-of-00002.safetensors"))
    with pytest.raises(FileNotFoundError):
        load_dense_params(ckpt)


def test_index_json_ignores_stray_files(tmp_path, rng):
    """A consolidated duplicate safetensors next to the shards must not be
    merged when index.json is present (real repos ship both layouts)."""
    from safetensors.numpy import save_file

    cfg = config_from_hf(QWEN2_CONFIG)
    src = random_dense_params(cfg, seed=53)
    tensors = export_dense_params(src, cfg)
    ckpt = str(tmp_path / "dup")
    _write_sharded_checkpoint(ckpt, tensors, QWEN2_CONFIG, n_shards=2)
    # a stray file with a conflicting (wrong) tensor under the same name
    bad = {"model.norm.weight":
           np.zeros_like(tensors["model.norm.weight"]) + 99.0}
    save_file(bad, os.path.join(ckpt, "consolidated.safetensors"))
    params = load_dense_params(ckpt)
    np.testing.assert_array_equal(np.asarray(params["final_ln"]),
                                  tensors["model.norm.weight"])
