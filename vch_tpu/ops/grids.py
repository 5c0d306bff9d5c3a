"""Uniform grids and trapezoidal quadrature weights.

Ref parity: trapz_weights (Forward_solver.py:237-241, Forward2_solver.py:430-441)
are 1 everywhere with 1/2 at both endpoints; spatial grids are
np.linspace(0, L, N+1) (Forward_solver.py:308, Forward2_solver.py:514-515).
Host-side numpy — these are compile-time constants for the jitted solvers.
"""
from __future__ import annotations

import numpy as np


def trapz_weights(n_nodes: int) -> np.ndarray:
    """1D trapezoidal-rule weights: [1/2, 1, ..., 1, 1/2]."""
    w = np.ones(n_nodes)
    w[0] = 0.5
    w[-1] = 0.5
    return w


def grid_1d(N: int, Lx: float):
    """Uniform 1D grid: nodes x, spacing h, quadrature weights h*wts."""
    h = Lx / N
    x = np.linspace(0.0, Lx, N + 1)
    wts_h = h * trapz_weights(N + 1)
    return x, h, wts_h


def grid_2d(Nx: int, Ny: int, Lx: float, Ly: float):
    """Uniform 2D tensor grid: (x, y), spacings (hx, hy), 2D quadrature weights."""
    hx, hy = Lx / Nx, Ly / Ny
    x = np.linspace(0.0, Lx, Nx + 1)
    y = np.linspace(0.0, Ly, Ny + 1)
    wts_h = hx * hy * np.outer(trapz_weights(Nx + 1), trapz_weights(Ny + 1))
    return (x, y), (hx, hy), wts_h
