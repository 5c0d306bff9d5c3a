"""Logarithmic Flory–Huggins potential terms, free energy, and random ICs.

Ref parity:
  - regularized_log: clip phi to +/-(1-eps), eps = max(1e-8, 0.5*delta_sep)
    (Forward_solver.py:57-62; Forward2_solver.py:86-102).
  - f'(phi) = c1 log((1+phi)/(1-phi)) - 2 c2 phi (Forward_solver.py:85,104-105).
  - f''(phi) = 2 c1/(1-phi^2) - 2 c2 with eps=1e-8 clip
    (backward_solver.py:36-46; backward2_solver.py:40-72).
  - free_energy: gradient + safe-log bulk + optional -int(w*phi)
    (Forward_solver.py:243-262; Forward2_solver.py:256-319).
  - init_phi_random: numpy default_rng(seed) Gaussian, trapz zero-mean
    projection, clip into bounds; 2D adds up-to-8-round mass-preserving
    interior correction (Forward_solver.py:264-277; Forward2_solver.py:444-486).

ICs are generated HOST-SIDE with numpy so starting states are bit-identical
to the reference for parity tests (SURVEY.md section 7 'Reproducing ICs').
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from vch_tpu.ops.grids import trapz_weights


def regularized_log(phi: jnp.ndarray, delta_sep: float) -> jnp.ndarray:
    """log((1+phi)/(1-phi)) with clipping away from the +/-1 singularities."""
    eps = max(1e-8, 0.5 * delta_sep)
    phi_s = jnp.clip(phi, -1.0 + eps, 1.0 - eps)
    return jnp.log((1.0 + phi_s) / (1.0 - phi_s))


def f_prime(phi: jnp.ndarray, c1: float, c2: float, delta_sep: float) -> jnp.ndarray:
    """f'(phi) = c1 log((1+phi)/(1-phi)) - 2 c2 phi."""
    return c1 * regularized_log(phi, delta_sep) - 2.0 * c2 * phi


def fpp_log(phi: jnp.ndarray, c1: float, c2: float, eps: float = 1e-8) -> jnp.ndarray:
    """f''(phi) = 2 c1/(1-phi^2) - 2 c2, clipped into (-1+eps, 1-eps)."""
    ph = jnp.clip(phi, -1.0 + eps, 1.0 - eps)
    return 2.0 * c1 / (1.0 - ph * ph) - 2.0 * c2


def free_energy_1d(phi: jnp.ndarray, kappa: float, c1: float, c2: float,
                   h: float, w: jnp.ndarray | None = None,
                   eps: float = 1e-8) -> jnp.ndarray:
    """Discrete free energy E = int (kappa/2)|phi_x|^2 + psi(phi) [- w phi] dx."""
    wts = jnp.asarray(trapz_weights(phi.shape[-1]), dtype=phi.dtype)
    dphi = jnp.diff(phi, axis=-1)
    E_grad = (kappa / (2.0 * h)) * jnp.sum(dphi**2, axis=-1)
    phi_s = jnp.clip(phi, -1.0 + eps, 1.0 - eps)
    psi = c1 * ((1.0 + phi_s) * jnp.log(1.0 + phi_s)
                + (1.0 - phi_s) * jnp.log(1.0 - phi_s)) - c2 * phi_s**2
    E_bulk = h * jnp.sum(wts * psi, axis=-1)
    E = E_grad + E_bulk
    if w is not None:
        E = E - h * jnp.sum(wts * w * phi, axis=-1)
    return E


def free_energy_2d(phi: jnp.ndarray, kappa: float, c1: float, c2: float,
                   hx: float, hy: float, w: jnp.ndarray | None = None,
                   eps: float = 1e-8) -> jnp.ndarray:
    """2D free energy with forward-difference gradient terms (ref :256-319).

    phi has shape [..., Nx+1, Ny+1]; axis -2 is x (spacing hx), -1 is y (hy).
    """
    Nx1, Ny1 = phi.shape[-2], phi.shape[-1]
    wts = jnp.asarray(np.outer(trapz_weights(Nx1), trapz_weights(Ny1)),
                      dtype=phi.dtype)
    dphi_x = jnp.diff(phi, axis=-2)
    dphi_y = jnp.diff(phi, axis=-1)
    E_grad = ((kappa / (2.0 * hx)) * jnp.sum(dphi_x**2, axis=(-2, -1)) * hy
              + (kappa / (2.0 * hy)) * jnp.sum(dphi_y**2, axis=(-2, -1)) * hx)
    phi_s = jnp.clip(phi, -1.0 + eps, 1.0 - eps)
    psi = c1 * ((1.0 + phi_s) * jnp.log(1.0 + phi_s)
                + (1.0 - phi_s) * jnp.log(1.0 - phi_s)) - c2 * phi_s**2
    E_bulk = hx * hy * jnp.sum(wts * psi, axis=(-2, -1))
    E = E_grad + E_bulk
    if w is not None:
        E = E - hx * hy * jnp.sum(wts * w * phi, axis=(-2, -1))
    return E


def init_phi_random_1d(N: int, delta_sep: float, amp: float = 0.01,
                       seed: int = 42, enforce_zero_mean: bool = True) -> np.ndarray:
    """Random Gaussian IC with trapz zero-mean projection (host numpy, f64)."""
    rng = np.random.default_rng(seed)
    phi0 = amp * rng.standard_normal(N + 1)
    if enforce_zero_mean:
        wts = trapz_weights(N + 1)
        phi0 -= np.dot(wts, phi0) / wts.sum()
    return np.clip(phi0, -1.0 + delta_sep, 1.0 - delta_sep)


def init_phi_random_2d(Nx: int, Ny: int, delta_sep: float, amp: float = 0.1,
                       seed: int = 42, enforce_zero_mean: bool = True) -> np.ndarray:
    """2D random IC with mass-preserving interior correction (ref :444-486)."""
    rng = np.random.default_rng(seed)
    phi0 = amp * rng.standard_normal((Nx + 1, Ny + 1))
    wts = np.outer(trapz_weights(Nx + 1), trapz_weights(Ny + 1))
    Wtot = np.sum(wts)
    if enforce_zero_mean:
        phi0 -= np.sum(wts * phi0) / Wtot
    lo, hi = -1.0 + delta_sep, 1.0 - delta_sep
    phi0 = np.clip(phi0, lo, hi)
    if enforce_zero_mean:
        margin = 5e-3
        for _ in range(8):
            M = np.sum(wts * phi0)
            if abs(M) <= 1e-14 * Wtot:
                break
            interior = np.abs(phi0) < (hi - margin)
            Wint = float(np.sum(wts[interior]))
            if Wint <= 0:
                phi0 -= M / Wtot
                phi0 = np.clip(phi0, lo, hi)
                break
            phi0[interior] -= M / Wint
    return phi0
