"""HF checkpoint loader: safetensors -> dense parameter pytree.

Replaces the reference's AutoModelForCausalLM load + in-place surgery
(model/main.py:15-38, model/model_utils.py): reads config.json +
*.safetensors directly from a local checkpoint directory, maps names into
the functional pytree, and (optionally) smooths + quantizes at load.
Architecture is detected from config.json's model_type, not path
name-sniffing (the reference's main.py:93 defect noted in SURVEY §2.3).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, List, Optional

import numpy as np

import jax.numpy as jnp

from .common import DenseLinear, ModelConfig


def config_from_hf(d: Dict[str, Any]) -> ModelConfig:
    mt = d.get("model_type", "llama")
    arch = {"llama": "llama", "qwen2": "qwen2", "mixtral": "mixtral"}.get(mt)
    if arch is None:
        raise ValueError(f"unsupported model_type {mt!r}")
    heads = d["num_attention_heads"]
    head_dim = d.get("head_dim") or d["hidden_size"] // heads
    return ModelConfig(
        arch=arch,
        vocab_size=d["vocab_size"],
        hidden_size=d["hidden_size"],
        intermediate_size=d["intermediate_size"],
        num_layers=d["num_hidden_layers"],
        num_heads=heads,
        num_kv_heads=d.get("num_key_value_heads", heads),
        head_dim=head_dim,
        rope_theta=d.get("rope_theta", 10000.0),
        rms_eps=d.get("rms_norm_eps", 1e-6),
        qkv_bias=(arch == "qwen2"),
        tie_embeddings=d.get("tie_word_embeddings", False),
        sliding_window=(d.get("sliding_window")
                        if d.get("use_sliding_window", False) else None),
        num_experts=d.get("num_local_experts", 0),
        num_experts_per_tok=d.get("num_experts_per_tok", 0),
        max_position_embeddings=d.get("max_position_embeddings", 32768),
        rope_scaling=_parse_rope_scaling(d.get("rope_scaling")),
    )


def _parse_rope_scaling(rs):
    """HF config rope_scaling dict -> ModelConfig tuple (or None)."""
    if not rs:
        return None
    kind = rs.get("rope_type") or rs.get("type")
    if kind in (None, "default"):
        return None
    if kind == "linear":
        return ("linear", float(rs["factor"]))
    if kind == "llama3":
        return ("llama3", float(rs["factor"]),
                float(rs["low_freq_factor"]), float(rs["high_freq_factor"]),
                int(rs["original_max_position_embeddings"]))
    raise ValueError(f"unsupported rope_scaling type {kind!r}")


def _open_safetensors(ckpt_dir: str):
    from safetensors import safe_open
    # sharded checkpoints ship model.safetensors.index.json with a
    # weight_map {tensor name -> shard file}; honor it when present (and
    # validate the referenced shards exist) — real HF directories may also
    # contain consolidated/duplicate safetensors the glob must not merge
    idx_path = os.path.join(ckpt_dir, "model.safetensors.index.json")
    if os.path.exists(idx_path):
        with open(idx_path) as f:
            weight_map = json.load(f)["weight_map"]
        handles: Dict[str, Any] = {}
        index = {}
        for key, fname in weight_map.items():
            path = os.path.join(ckpt_dir, fname)
            if fname not in handles:
                if not os.path.exists(path):
                    raise FileNotFoundError(
                        f"index.json references missing shard {fname}")
                handles[fname] = safe_open(path, framework="np")
            index[key] = handles[fname]
        return index
    files = sorted(glob.glob(os.path.join(ckpt_dir, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no *.safetensors under {ckpt_dir}")
    handles_l = [safe_open(f, framework="np") for f in files]
    index = {}
    for h in handles_l:
        for key in h.keys():
            index[key] = h
    return index


class _TensorSource:
    """Uniform access to either a safetensors dir or an in-memory dict."""

    def __init__(self, ckpt_dir: Optional[str] = None,
                 tensors: Optional[Dict[str, np.ndarray]] = None):
        self._dict = tensors
        self._index = _open_safetensors(ckpt_dir) if ckpt_dir else None

    def get(self, name: str) -> np.ndarray:
        if self._dict is not None:
            return np.asarray(self._dict[name])
        return self._index[name].get_tensor(name)

    def has(self, name: str) -> bool:
        if self._dict is not None:
            return name in self._dict
        return name in self._index


def _lin(src: _TensorSource, prefix: str, dtype=jnp.bfloat16) -> DenseLinear:
    w = jnp.asarray(src.get(prefix + ".weight"), dtype)
    b = (jnp.asarray(src.get(prefix + ".bias"), dtype)
         if src.has(prefix + ".bias") else None)
    return DenseLinear(w=w, bias=b)


def load_dense_params(ckpt_dir: str, cfg: Optional[ModelConfig] = None,
                      tensors: Optional[Dict[str, np.ndarray]] = None,
                      dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Load a Llama/Qwen2/Mixtral HF checkpoint into the dense pytree."""
    if cfg is None:
        with open(os.path.join(ckpt_dir, "config.json")) as f:
            cfg = config_from_hf(json.load(f))
    src = _TensorSource(ckpt_dir, tensors)

    layers: List[Dict[str, Any]] = []
    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}"
        p: Dict[str, Any] = {
            "ln1": jnp.asarray(src.get(f"{pre}.input_layernorm.weight"), dtype),
            "ln2": jnp.asarray(
                src.get(f"{pre}.post_attention_layernorm.weight"), dtype),
            "q": _lin(src, f"{pre}.self_attn.q_proj", dtype),
            "k": _lin(src, f"{pre}.self_attn.k_proj", dtype),
            "v": _lin(src, f"{pre}.self_attn.v_proj", dtype),
            "o": _lin(src, f"{pre}.self_attn.o_proj", dtype),
        }
        if cfg.is_moe:
            p["router"] = _lin(src, f"{pre}.block_sparse_moe.gate", dtype)
            p["experts"] = [
                {
                    "w1": _lin(src, f"{pre}.block_sparse_moe.experts.{e}.w1",
                               dtype),
                    "w3": _lin(src, f"{pre}.block_sparse_moe.experts.{e}.w3",
                               dtype),
                    "w2": _lin(src, f"{pre}.block_sparse_moe.experts.{e}.w2",
                               dtype),
                }
                for e in range(cfg.num_experts)
            ]
        else:
            p["gate"] = _lin(src, f"{pre}.mlp.gate_proj", dtype)
            p["up"] = _lin(src, f"{pre}.mlp.up_proj", dtype)
            p["down"] = _lin(src, f"{pre}.mlp.down_proj", dtype)
        layers.append(p)

    embed = jnp.asarray(src.get("model.embed_tokens.weight"), dtype)
    if cfg.tie_embeddings or not src.has("lm_head.weight"):
        lm_head = embed
    else:
        lm_head = jnp.asarray(src.get("lm_head.weight"), dtype)
    return {
        "embed": embed,
        "final_ln": jnp.asarray(src.get("model.norm.weight"), dtype),
        "lm_head": lm_head,
        "layers": layers,
    }


def export_dense_params(params: Dict[str, Any],
                        cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """Inverse mapping (our pytree -> HF names), for tests and round-trips."""
    out: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": np.asarray(params["embed"]),
        "model.norm.weight": np.asarray(params["final_ln"]),
        "lm_head.weight": np.asarray(params["lm_head"]),
    }

    def put(prefix, lin: DenseLinear):
        out[prefix + ".weight"] = np.asarray(lin.w)
        if lin.bias is not None:
            out[prefix + ".bias"] = np.asarray(lin.bias)

    for i, p in enumerate(params["layers"]):
        pre = f"model.layers.{i}"
        out[f"{pre}.input_layernorm.weight"] = np.asarray(p["ln1"])
        out[f"{pre}.post_attention_layernorm.weight"] = np.asarray(p["ln2"])
        put(f"{pre}.self_attn.q_proj", p["q"])
        put(f"{pre}.self_attn.k_proj", p["k"])
        put(f"{pre}.self_attn.v_proj", p["v"])
        put(f"{pre}.self_attn.o_proj", p["o"])
        if "experts" in p:
            put(f"{pre}.block_sparse_moe.gate", p["router"])
            for e, ep in enumerate(p["experts"]):
                put(f"{pre}.block_sparse_moe.experts.{e}.w1", ep["w1"])
                put(f"{pre}.block_sparse_moe.experts.{e}.w3", ep["w3"])
                put(f"{pre}.block_sparse_moe.experts.{e}.w2", ep["w2"])
        else:
            put(f"{pre}.mlp.gate_proj", p["gate"])
            put(f"{pre}.mlp.up_proj", p["up"])
            put(f"{pre}.mlp.down_proj", p["down"])
    return out
