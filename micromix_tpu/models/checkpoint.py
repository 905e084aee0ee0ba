"""Quantized-checkpoint serialization: bake once, serve many times.

The reference never persists its packed weights — model surgery re-permutes
and re-quantizes every linear at every startup (model/model_utils.py:24-46,
SURVEY.md §5 "Checkpoint / resume").  Here the quantized parameter pytree
(packed MX codes, UE8M0 scales, composed permutations, segment budgets) is
serialized to a self-describing directory:

    <path>/manifest.json   tree structure, static metadata, ModelConfig
    <path>/arrays.npz      every array leaf (bf16 stored as a u16 view)

Round-trips every node kind the model zoo produces (dict / list / tuple /
None / ndarray / MixedTensor / QuantLinear / DenseLinear / QuantSite), so it
also serializes dense (bf16) pytrees and calibration artifacts.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax.numpy as jnp
import ml_dtypes

from ..mx.mxtensor import MixedTensor
from ..mx.scaledw8 import ScaledW8
from .common import (DenseLinear, Int8TurboLinear, ModelConfig,
                     QuantLinear, QuantSite, WeightOnlyLinear)
from .hetero import FakeQuantSite

FORMAT_VERSION = 1

# Dataclass pytree nodes we know how to rebuild: name -> (class, array/data
# fields, static fields).  Statics go into the manifest, not the npz.
_NODE_TYPES = {
    "MixedTensor": (MixedTensor,
                    ("fp4", "fp6", "fp8", "sf4", "sf6", "sf8"),
                    ("fp4_packed", "fp4_only")),
    "ScaledW8": (ScaledW8, ("codes", "base"), ("k4", "k6", "k8")),
    "QuantLinear": (QuantLinear, ("w", "bias"), ()),
    "Int8TurboLinear": (Int8TurboLinear, ("w", "w_scale", "bias"), ()),
    "WeightOnlyLinear": (WeightOnlyLinear, ("w", "bias"), ()),
    "DenseLinear": (DenseLinear, ("w", "bias"), ()),
    # benes absent in pre-r4 manifests -> defaults to None on load
    "QuantSite": (QuantSite, ("perm", "benes"), ("k4", "k6", "k8")),
    "FakeQuantSite": (FakeQuantSite, ("perm", "block_fmt"), ()),
}
_BY_CLASS = {cls: name for name, (cls, _, _) in _NODE_TYPES.items()}

# numpy can't np.save ml_dtypes dtypes; store them as same-width int views.
_VIEW_AS = {"bfloat16": np.uint16, "float8_e4m3fn": np.uint8}


def _encode(node: Any, arrays: Dict[str, np.ndarray], prefix: str):
    if node is None:
        return {"kind": "none"}
    cls = type(node)
    if cls in _BY_CLASS:
        name = _BY_CLASS[cls]
        _, fields, statics = _NODE_TYPES[name]
        return {
            "kind": name,
            "fields": {f: _encode(getattr(node, f), arrays, f"{prefix}.{f}")
                       for f in fields},
            "statics": {s: getattr(node, s) for s in statics},
        }
    if isinstance(node, dict):
        return {"kind": "dict",
                "items": {k: _encode(v, arrays, f"{prefix}.{k}")
                          for k, v in node.items()}}
    if isinstance(node, (list, tuple)):
        return {"kind": "list" if isinstance(node, list) else "tuple",
                "items": [_encode(v, arrays, f"{prefix}.{i}")
                          for i, v in enumerate(node)]}
    x = np.asarray(node)
    dtype = x.dtype.name
    key = f"a{len(arrays)}"
    arrays[key] = x.view(_VIEW_AS[dtype]) if dtype in _VIEW_AS else x
    return {"kind": "array", "key": key, "dtype": dtype, "path": prefix}


def _decode(spec: Dict[str, Any], arrays) -> Any:
    kind = spec["kind"]
    if kind == "none":
        return None
    if kind == "array":
        x = arrays[spec["key"]]
        dtype = spec["dtype"]
        if dtype in _VIEW_AS:
            x = x.view(ml_dtypes.bfloat16 if dtype == "bfloat16"
                       else ml_dtypes.float8_e4m3fn)
        return jnp.asarray(x)
    if kind == "dict":
        return {k: _decode(v, arrays) for k, v in spec["items"].items()}
    if kind == "list":
        return [_decode(v, arrays) for v in spec["items"]]
    if kind == "tuple":
        return tuple(_decode(v, arrays) for v in spec["items"])
    cls, fields, _ = _NODE_TYPES[kind]
    kw = {f: _decode(s, arrays) for f, s in spec["fields"].items()}
    kw.update(spec["statics"])
    return cls(**kw)


def save_params(path: str, params: Any, cfg: Optional[ModelConfig] = None,
                meta: Optional[Dict[str, Any]] = None) -> None:
    """Serialize a (quantized or dense) parameter pytree to ``path``/."""
    os.makedirs(path, exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    tree = _encode(params, arrays, "params")
    manifest = {
        "format_version": FORMAT_VERSION,
        "tree": tree,
        "config": dataclasses.asdict(cfg) if cfg is not None else None,
        "meta": meta or {},
    }
    np.savez(os.path.join(path, "arrays.npz"), **arrays)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f)


def load_params(path: str) -> Tuple[Any, Optional[ModelConfig],
                                    Dict[str, Any]]:
    """Inverse of save_params: -> (params, config | None, meta)."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest["format_version"] != FORMAT_VERSION:
        raise ValueError(
            f"unsupported checkpoint version {manifest['format_version']}")
    with np.load(os.path.join(path, "arrays.npz")) as arrays:
        params = _decode(manifest["tree"], arrays)
    cfg = (ModelConfig(**manifest["config"])
           if manifest["config"] is not None else None)
    return params, cfg, manifest["meta"]


def save_params_async(path: str, params: Any,
                      cfg: Optional[ModelConfig] = None,
                      meta: Optional[Dict[str, Any]] = None):
    """Async checkpoint save via orbax: returns the AsyncCheckpointer.

    The array payload is handed to orbax's background thread (serving
    continues while multi-GB packed weights hit disk); the small manifest
    is written synchronously.  Call ``.wait_until_finished()`` (or rely on
    interpreter exit) to join.  load_params_async restores; the manifest
    format matches save_params, so the sync/async formats differ only in
    the array container (orbax tree dir vs arrays.npz).
    """
    import orbax.checkpoint as ocp

    os.makedirs(path, exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    tree = _encode(params, arrays, "params")
    manifest = {
        "format_version": FORMAT_VERSION,
        "array_container": "orbax",
        "tree": tree,
        "config": dataclasses.asdict(cfg) if cfg is not None else None,
        "meta": meta or {},
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    ckptr.save(os.path.join(os.path.abspath(path), "arrays_ocp"), arrays,
               force=True)
    return ckptr


def load_params_async(path: str) -> Tuple[Any, Optional[ModelConfig],
                                          Dict[str, Any]]:
    """Restore a save_params_async checkpoint."""
    import orbax.checkpoint as ocp

    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest["format_version"] != FORMAT_VERSION:
        raise ValueError(
            f"unsupported checkpoint version {manifest['format_version']}")
    ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
    arrays = ckptr.restore(os.path.join(os.path.abspath(path), "arrays_ocp"))
    params = _decode(manifest["tree"], arrays)
    cfg = (ModelConfig(**manifest["config"])
           if manifest["config"] is not None else None)
    return params, cfg, manifest["meta"]


__all__ = ["save_params", "load_params", "save_params_async",
           "load_params_async", "FORMAT_VERSION"]
