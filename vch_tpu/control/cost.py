"""Discrete cost functional J = J1 + J2 + J3 + J4 (trapezoidal quadrature).

J(phi,u) = (b1/2)||phi-phi_Q||^2_Q + (b2/2)||phi(T)-phi_Omega||^2
         + (b3/2)||u||^2_Q + kappa_spar ||u||_{L1(Q)}

Ref parity: nested np.trapezoid space-then-time (cost_and_function.py:26-84;
cost2_and_function.py:19-120). Pure-jnp, jit/vmap-safe; batched fields reduce
over their trailing space/time axes so the scenario batch axis survives.
"""
from __future__ import annotations

import jax.numpy as jnp


def _trapz(y, x, axis):
    return jnp.trapezoid(y, x=x, axis=axis)


def cost_breakdown_1d(phi_hist, u, phi_Q_target, phi_T_target, x, t_hist,
                      b1, b2, b3, kappa_spar):
    """Return (J1, J2, J3, J4) for 1D histories [..., M+1, N+1]."""
    x = jnp.asarray(x, phi_hist.dtype)
    t = jnp.asarray(t_hist, phi_hist.dtype)
    J1 = (b1 / 2.0) * _trapz(_trapz((phi_hist - phi_Q_target) ** 2, x, -1), t, -1)
    J2 = (b2 / 2.0) * _trapz((phi_hist[..., -1, :] - phi_T_target) ** 2, x, -1)
    J3 = (b3 / 2.0) * _trapz(_trapz(u ** 2, x, -1), t, -1)
    J4 = kappa_spar * _trapz(_trapz(jnp.abs(u), x, -1), t, -1)
    return J1, J2, J3, J4


def calculate_cost_1d(phi_hist, u, phi_Q_target, phi_T_target, x, t_hist,
                      b1, b2, b3, kappa_spar, verbose: bool = False):
    J1, J2, J3, J4 = cost_breakdown_1d(phi_hist, u, phi_Q_target, phi_T_target,
                                       x, t_hist, b1, b2, b3, kappa_spar)
    total = J1 + J2 + J3 + J4
    if verbose:
        _print_breakdown(J1, J2, J3, J4, total)
    return total


def cost_breakdown_2d(phi_hist, u, phi_Q_target, phi_T_target, x, y, t_hist,
                      b1, b2, b3, kappa_spar):
    """Return (J1, J2, J3, J4) for 2D histories [..., M+1, Nx+1, Ny+1]."""
    x = jnp.asarray(x, phi_hist.dtype)
    y = jnp.asarray(y, phi_hist.dtype)
    t = jnp.asarray(t_hist, phi_hist.dtype)

    def sp(a):  # integrate over space: y then x
        return _trapz(_trapz(a, y, -1), x, -1)

    J1 = (b1 / 2.0) * _trapz(sp((phi_hist - phi_Q_target) ** 2), t, -1)
    J2 = (b2 / 2.0) * sp((phi_hist[..., -1, :, :] - phi_T_target) ** 2)
    J3 = (b3 / 2.0) * _trapz(sp(u ** 2), t, -1)
    J4 = kappa_spar * _trapz(sp(jnp.abs(u)), t, -1)
    return J1, J2, J3, J4


def calculate_cost_2d(phi_hist, u, phi_Q_target, phi_T_target, x, y, t_hist,
                      b1, b2, b3, kappa_spar, verbose: bool = False):
    J1, J2, J3, J4 = cost_breakdown_2d(phi_hist, u, phi_Q_target, phi_T_target,
                                       x, y, t_hist, b1, b2, b3, kappa_spar)
    total = J1 + J2 + J3 + J4
    if verbose:
        _print_breakdown(J1, J2, J3, J4, total)
    return total


def _print_breakdown(J1, J2, J3, J4, total):
    print(f"  Tracking Cost (J1): {float(J1):.6g}")
    print(f"  Terminal Cost (J2): {float(J2):.6g}")
    print(f"  Control Energy (J3): {float(J3):.6g}")
    print(f"  Sparsity Cost (J4): {float(J4):.6g}")
    print("-----------------------------")
    print(f"  Total Cost: {float(total):.6g}")
