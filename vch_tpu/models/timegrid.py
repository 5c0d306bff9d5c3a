"""Static time-step schedule construction.

The reference marches `while current_time < T - 1e-10` with dt capped to the
remaining time (Forward_solver.py:342-345, Forward2_solver.py:542-543).
Under jit the trip count must be static, so we precompute the exact sequence
of step sizes host-side: M_full whole steps of dt plus at most one final
partial step, replicating the reference's float accumulation semantics.
"""
from __future__ import annotations

import numpy as np


def build_dt_schedule(T: float, dt: float, time_tol: float = 1e-10) -> np.ndarray:
    """Return the array of per-step dt values the reference while-loop takes."""
    dts = []
    current = 0.0
    while current < T - time_tol:
        step = min(dt, T - current)
        dts.append(step)
        current += step
    return np.asarray(dts, dtype=np.float64)


def t_history(dts: np.ndarray, T: float) -> np.ndarray:
    """Time stamps [0, t1, ..., ~T] with the reference's min(t, T) clamp."""
    t = np.concatenate([[0.0], np.cumsum(dts)])
    return np.minimum(t, T)
