"""Pallas kernel correctness (interpret mode — no TPU needed).

The fused Schur-operator, adjoint-operator, and spectral-solve kernels must
match their XLA compositions exactly; they are alternative schedules of the
same math (ops/pallas_kernels.py).
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from vch_tpu.ops.laplacian import apply_laplacian_2d
from vch_tpu.ops.linsolve import from_spectral, make_spectral_op_2d, to_spectral
from vch_tpu.ops.pallas_kernels import (
    adjoint_apply_pallas,
    schur_apply_pallas,
    spectral_solve_pallas,
)


def _setup(N=24):
    op = make_spectral_op_2d(N, N, 1 / N, 1 / N)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((N + 1, N + 1)))
    d = jnp.asarray(1.5 + rng.random((N + 1, N + 1)))
    return op, v, d, rng


def test_schur_apply_matches_xla():
    op, v, d, _ = _setup()
    dt, tau, kappa = 1e-2, 0.05, 1e-4
    lap = partial(apply_laplacian_2d, op.Lx, op.Ly)
    ref = (1 / dt) * v - lap((tau / dt + d) * v - 0.5 * kappa * lap(v))
    got = schur_apply_pallas(op.Lx, op.Ly.T, d, v, 1 / dt, tau / dt,
                             0.5 * kappa, interpret=True)
    assert float(jnp.abs(got - ref).max()) < 1e-10 * float(jnp.abs(ref).max())


def test_adjoint_apply_matches_xla():
    op, v, _, rng = _setup()
    dt, tau = 1e-2, 0.05
    fpp = jnp.asarray(rng.standard_normal(v.shape))
    lap = partial(apply_laplacian_2d, op.Lx, op.Ly)
    w = lap(v)
    ref = v - tau * w + 0.5 * dt * (lap(w) - fpp * w)
    got = adjoint_apply_pallas(op.Lx, op.Ly.T, fpp, v, tau, 0.5 * dt,
                               interpret=True)
    assert float(jnp.abs(got - ref).max()) < 1e-10 * float(jnp.abs(ref).max())


def test_spectral_solve_matches_xla():
    op, v, _, _ = _setup()
    denom = 1.0 + jnp.abs(op.lam)
    ref = from_spectral(op, to_spectral(op, v) / denom)
    got = spectral_solve_pallas(op.Vx_inv, op.Vy_inv.T, op.Vx, op.Vy.T,
                                denom, v, interpret=True)
    assert float(jnp.abs(got - ref).max()) < 1e-10 * float(jnp.abs(ref).max())


def test_schur_apply_vmaps_over_batch():
    op, _, _, rng = _setup(16)
    dt, tau, kappa = 1e-2, 0.05, 1e-4
    vb = jnp.asarray(rng.standard_normal((3, 17, 17)))
    db = jnp.asarray(1.5 + rng.random((3, 17, 17)))
    lap = partial(apply_laplacian_2d, op.Lx, op.Ly)
    f = jax.vmap(lambda dd, vv: schur_apply_pallas(
        op.Lx, op.Ly.T, dd, vv, 1 / dt, tau / dt, 0.5 * kappa,
        interpret=True))
    got = f(db, vb)
    ref = jax.vmap(lambda dd, vv: (1 / dt) * vv
                   - lap((tau / dt + dd) * vv - 0.5 * kappa * lap(vv)))(db, vb)
    assert float(jnp.abs(got - ref).max()) < 1e-10
