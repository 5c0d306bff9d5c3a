"""Proximal-gradient primitives: smooth gradient, GD step, prox + projection.

Ref parity: grad = r + b3*u (cost_and_function.py:86-100); u - alpha*grad
(:103-112); soft-threshold by alpha*kappa_spar then clip to [u_min, u_max]
(GD_1D.py:56-71; cost2_and_function.py:153-200). All elementwise jnp —
fuses into surrounding XLA computations.
"""
from __future__ import annotations

import jax.numpy as jnp


def calculate_gradient(r, u, b3):
    """Gradient of the smooth cost part: grad = r + b3 * u."""
    return r + b3 * u


def perform_gradient_step(u, grad_smooth, alpha):
    return u - alpha * grad_smooth


def soft_threshold(u, threshold):
    return jnp.sign(u) * jnp.maximum(jnp.abs(u) - threshold, 0.0)


def proximal_step(u, grad_smooth, alpha, kappa_spar, u_min, u_max):
    """One ISTA step: gradient step, soft-threshold, box projection."""
    u_temp = u - alpha * grad_smooth
    return jnp.clip(soft_threshold(u_temp, alpha * kappa_spar), u_min, u_max)
