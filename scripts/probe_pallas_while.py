"""Probe: lax.while_loop support inside Pallas TPU kernels (axon service).

Checks the primitives the fused-march kernel needs:
  1. while_loop with a dynamic trip count and a VECTOR (65x65) carry
  2. a NESTED while_loop (Armijo-inside-Newton shape)
  3. scalar SMEM output blocks accumulated across grid steps
  4. VMEM scratch persisting across grid steps (time-marching carry)
Run on the real chip: python scripts/probe_pallas_while.py
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, out_ref, ns_ref, state, interpret: bool = False):
    b = pl.program_id(0)
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        state[0] = x_ref[0]
        ns_ref[b, 0] = jnp.int32(0)

    phi = state[0]

    # outer while: "Newton" — iterate until norm < tol (dynamic trips)
    def outer_cond(c):
        phi, k, done = c
        return (~done) & (k < 50)

    def outer_body(c):
        phi, k, done = c

        # inner while: "Armijo" — halve alpha until accept
        def inner_cond(ci):
            alpha, j, acc = ci
            return (~acc) & (j < 12)

        def inner_body(ci):
            alpha, j, acc = ci
            trial = phi * (1.0 - 0.3 * alpha)
            acc = jnp.sum(trial * trial) <= jnp.sum(phi * phi)
            alpha = jnp.where(acc, alpha, alpha * 0.5)
            return (alpha, j + 1, acc)

        alpha, _, _ = jax.lax.while_loop(
            inner_cond, inner_body,
            (jnp.float32(1.0), jnp.int32(0), jnp.bool_(False)))
        phi = phi * (1.0 - 0.3 * alpha)
        norm = jnp.sqrt(jnp.sum(phi * phi))
        return (phi, k + 1, norm < 1e-3)

    phi, k, _ = jax.lax.while_loop(
        outer_cond, outer_body, (phi, jnp.int32(0), jnp.bool_(False)))
    state[0] = phi
    ns_ref[b, 0] = ns_ref[b, 0] + k
    out_ref[0] = phi


def run(B=2, M=3, n=65, interpret=False):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, n, n)),
                    jnp.float32)
    out, ns = pl.pallas_call(
        functools.partial(kernel, interpret=interpret),
        grid=(B, M),
        in_specs=[pl.BlockSpec((1, n, n), lambda b, m: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, n, n), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, n, n), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((1, n, n), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(x)
    return np.asarray(out), np.asarray(ns), np.asarray(x)


def reference(x, M):
    phi = x.copy().astype(np.float64)
    B = x.shape[0]
    ns = np.zeros((B, 1), np.int32)
    for b in range(B):
        for m in range(M):
            k = 0
            while k < 50:
                phi[b] *= 0.7
                k += 1
                if np.sqrt((phi[b] ** 2).sum()) < 1e-3:
                    break
            ns[b, 0] += k
    return phi, ns


if __name__ == "__main__":
    backend = jax.default_backend()
    print("backend:", backend)
    interp = backend == "cpu"
    out, ns, x = run(interpret=interp)
    ref, ns_ref = reference(np.asarray(x), M=3)
    print("max|diff| =", np.abs(out - ref).max())
    print("ns =", ns.ravel(), "expected", ns_ref.ravel())
    assert np.abs(out - ref).max() < 1e-4
    assert (ns == ns_ref).all()
    print("PROBE OK:", "interpret" if interp else "compiled on-chip")
