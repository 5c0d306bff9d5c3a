"""Pallas TPU kernels for the Newton/Krylov hot path.

The inner BiCGStab iteration applies two operators per half-step:

  S v   = (1/dt) v - L[(tau/dt + d) v - (kappa/2) L v]      (Schur operator)
  P^-1 v = Vx ( (Vx^-1 v Vy^-T) / denom ) Vy^T              (preconditioner)

In XLA each is ~6-10 separate HLO ops (4 matmuls + elementwise) with
intermediate HBM round-trips between fusions. These kernels compute each
apply in ONE pallas_call: the field and the small (N+1)^2 operator matrices
live in VMEM, the four matmuls run back-to-back on the MXU, and the
elementwise work happens in registers between them — no intermediate HBM
traffic. Scalar step parameters arrive via SMEM so the same compiled kernel
serves every (traced) dt.

Batching: kernels are written for a single (n, m) field; `jax.vmap` maps
them over scenario batches via pallas_call's batching rule.

CPU/tests run the same kernels with interpret=True (no TPU required).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only module; absent on CPU-only installs
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _vmem_spec():
    if _HAS_PLTPU:
        return pl.BlockSpec(memory_space=pltpu.ANY if False else pltpu.VMEM)
    return pl.BlockSpec()


def _smem_spec():
    if _HAS_PLTPU:
        return pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.BlockSpec()


def _schur_apply_kernel(scal_ref, Lx_ref, LyT_ref, d_ref, v_ref, out_ref):
    """out = (1/dt) v - L[(tau/dt + d) v - (kappa/2) L v]."""
    inv_dt = scal_ref[0, 0]
    tau_dt = scal_ref[0, 1]
    half_kappa = scal_ref[0, 2]
    v = v_ref[:]
    Lx = Lx_ref[:]
    LyT = LyT_ref[:]
    acc = jnp.dot(Lx, v, preferred_element_type=v.dtype)
    lap_v = acc + jnp.dot(v, LyT, preferred_element_type=v.dtype)
    u = (tau_dt + d_ref[:]) * v - half_kappa * lap_v
    lap_u = (jnp.dot(Lx, u, preferred_element_type=v.dtype)
             + jnp.dot(u, LyT, preferred_element_type=v.dtype))
    out_ref[:] = inv_dt * v - lap_u


def schur_apply_pallas(Lx, LyT, d, v, inv_dt, tau_dt, half_kappa,
                       interpret: bool = False):
    """Fused S-operator apply. Shapes: Lx (n,n), LyT (m,m), d,v (n,m)."""
    dtype = v.dtype
    scal = jnp.stack([jnp.asarray(inv_dt, dtype) + jnp.zeros((), dtype),
                      jnp.asarray(tau_dt, dtype) + jnp.zeros((), dtype),
                      jnp.asarray(half_kappa, dtype) + jnp.zeros((), dtype)]
                     ).reshape(1, 3)
    return pl.pallas_call(
        _schur_apply_kernel,
        out_shape=jax.ShapeDtypeStruct(v.shape, dtype),
        in_specs=[_smem_spec(), _vmem_spec(), _vmem_spec(), _vmem_spec(),
                  _vmem_spec()],
        out_specs=_vmem_spec(),
        interpret=interpret,
    )(scal, Lx, LyT, d, v)


def _adjoint_apply_kernel(scal_ref, Lx_ref, LyT_ref, fpp_ref, v_ref, out_ref):
    """out = v - tau (L v) + (dt/2)(L(Lv) - fpp * (Lv))  — the adjoint A."""
    tau = scal_ref[0, 0]
    half_dt = scal_ref[0, 1]
    v = v_ref[:]
    Lx = Lx_ref[:]
    LyT = LyT_ref[:]
    w = (jnp.dot(Lx, v, preferred_element_type=v.dtype)
         + jnp.dot(v, LyT, preferred_element_type=v.dtype))
    lap_w = (jnp.dot(Lx, w, preferred_element_type=v.dtype)
             + jnp.dot(w, LyT, preferred_element_type=v.dtype))
    out_ref[:] = v - tau * w + half_dt * (lap_w - fpp_ref[:] * w)


def adjoint_apply_pallas(Lx, LyT, fpp, v, tau, half_dt,
                         interpret: bool = False):
    """Fused adjoint-operator apply A(phi_n) v (backward2_solver.py:195-198)."""
    dtype = v.dtype
    scal = jnp.stack([jnp.asarray(tau, dtype) + jnp.zeros((), dtype),
                      jnp.asarray(half_dt, dtype) + jnp.zeros((), dtype)]
                     ).reshape(1, 2)
    return pl.pallas_call(
        _adjoint_apply_kernel,
        out_shape=jax.ShapeDtypeStruct(v.shape, dtype),
        in_specs=[_smem_spec(), _vmem_spec(), _vmem_spec(), _vmem_spec(),
                  _vmem_spec()],
        out_specs=_vmem_spec(),
        interpret=interpret,
    )(scal, Lx, LyT, fpp, v)


def _spectral_solve_kernel(Vxi_ref, VyiT_ref, Vx_ref, VyT_ref, denom_ref,
                           v_ref, out_ref):
    """out = Vx ((Vx^-1 v Vy^-T) / denom) Vy^T — exact poly(L) solve."""
    v = v_ref[:]
    vhat = jnp.dot(Vxi_ref[:], v, preferred_element_type=v.dtype)
    vhat = jnp.dot(vhat, VyiT_ref[:], preferred_element_type=v.dtype)
    vhat = vhat / denom_ref[:]
    out = jnp.dot(Vx_ref[:], vhat, preferred_element_type=v.dtype)
    out_ref[:] = jnp.dot(out, VyT_ref[:], preferred_element_type=v.dtype)


def spectral_solve_pallas(Vx_inv, Vy_inv_T, Vx, VyT, denom, v,
                          interpret: bool = False):
    """Fused cosine-diagonal solve (the BiCGStab preconditioner apply)."""
    return pl.pallas_call(
        _spectral_solve_kernel,
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        in_specs=[_vmem_spec()] * 6,
        out_specs=_vmem_spec(),
        interpret=interpret,
    )(Vx_inv, Vy_inv_T, Vx, VyT, denom, v)
