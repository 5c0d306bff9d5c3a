"""Mid-run PGD state checkpointing.

The reference persists only configs + final iteration count
(config.py:142-171) and the final control (optimal_control.npy,
GD_1D.py:487) — it has NO mid-run checkpoint/resume (SURVEY.md section 5).
This adds real checkpointing for long batched runs: the optimizer state
(u, alpha, iteration, cost/alpha histories, plateau counters) round-trips
through a single compressed .npz plus a JSON-serializable meta dict.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np


def save_checkpoint(path: str, state: Dict[str, Any],
                    meta: Dict[str, Any] | None = None) -> str:
    """Save arrays in `state` (+ JSON `meta`) atomically."""
    arrays = {k: np.asarray(v) for k, v in state.items()}
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, __meta__=np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8), **arrays)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str):
    """Return (state dict of arrays, meta dict)."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode()) if "__meta__" in data else {}
        state = {k: data[k] for k in data.files if k != "__meta__"}
    return state, meta
