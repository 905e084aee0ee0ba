"""Device mesh construction.

Axes:
  * "data"   — batch (DP); gradients don't exist (inference), so this is
               pure request parallelism
  * "model"  — tensor parallelism (attention heads / MLP rows)
  * "expert" — Mixtral expert parallelism

On a multi-host v5p slice `jax.make_mesh` lays axes out so that "model"
(the highest-traffic axis: per-layer collectives) rides contiguous ICI
rings and "data" spans hosts/DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(data: int = 1, model: int = 1, expert: int = 1,
              seq: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = data * model * expert * seq
    assert len(devices) >= n, (len(devices), n)
    # last axis fastest-varying -> "model" neighbours are adjacent devices;
    # "seq" (one all-gather per layer) sits next-innermost
    arr = np.array(devices[:n]).reshape(data, expert, seq, model)
    return Mesh(arr, ("data", "expert", "seq", "model"))
