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

def kernel_vmem_fits(n: int, m: int, dtype_bytes: int = 4,
                     vmem_limit: int = 100 * 2**20) -> bool:
    """Whether the fused BiCGStab kernels fit the per-core VMEM budget.

    The whole solve is VMEM-resident: the operator matrices plus the
    Krylov carry and its temporaries — Mosaic's measured stack allocation
    at n=m=257 f32 is 19.22 MB (~47 field-sized buffers after (8,128)
    tiling pads); model it as 48 buffers. The kernels raise their scoped
    vmem limit to 100 MB via _compiler_params (v5e has ~128 MB physical
    VMEM; Mosaic's 16 MB default used to push 256x256 off the fused
    path), so grids up to ~512x512 now stay VMEM-resident.
    """
    pad = lambda a, k: -(-a // k) * k
    field = pad(n, 8) * pad(m, 128) * dtype_bytes
    return 48 * field <= int(0.95 * vmem_limit)


# Mosaic lowers only DEFAULT (bf16 passes) and HIGHEST (fp32) dot precision;
# an ambient jax.default_matmul_precision("high") context (the forward path's
# auto-resolved setting) would otherwise leak into the kernel and fail to
# lower. The spectral transforms need f32 accuracy (bf16 passes NaN the
# condition-1e6 adjoint solve), so pin every kernel dot to HIGHEST.
_PREC = jax.lax.Precision.HIGHEST


def _compiler_params(interpret: bool):
    """Raise the per-kernel scoped-VMEM limit from Mosaic's 16 MB default.

    A v5e core has ~128 MB of physical VMEM; the fused whole-solve kernels
    at 256x256 were measured needing 19.22 MB and used to be gated OFF by
    the 16 MB default. 100 MB keeps generous headroom for the framework's
    own double-buffering while letting every solve up to ~512x512 stay
    VMEM-resident."""
    if _HAS_PLTPU and not interpret:
        return {"compiler_params":
                pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)}
    return {}


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
    acc = jnp.dot(Lx, v, preferred_element_type=v.dtype, precision=_PREC)
    lap_v = acc + jnp.dot(v, LyT, preferred_element_type=v.dtype, precision=_PREC)
    u = (tau_dt + d_ref[:]) * v - half_kappa * lap_v
    lap_u = (jnp.dot(Lx, u, preferred_element_type=v.dtype, precision=_PREC)
             + jnp.dot(u, LyT, preferred_element_type=v.dtype, precision=_PREC))
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
    w = (jnp.dot(Lx, v, preferred_element_type=v.dtype, precision=_PREC)
         + jnp.dot(v, LyT, preferred_element_type=v.dtype, precision=_PREC))
    lap_w = (jnp.dot(Lx, w, preferred_element_type=v.dtype, precision=_PREC)
             + jnp.dot(w, LyT, preferred_element_type=v.dtype, precision=_PREC))
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


def _bicgstab_schur_kernel_factory(n_iter: int, eps_mach: float):
    """Build the fused BiCGStab kernel body for the 2D Newton Schur solve.

    One kernel call = one COMPLETE fixed-trip Krylov solve of S dphi = rhs
    (ops/linsolve.bicgstab_fixed semantics: freeze at the dtype noise floor,
    reject non-finite excursions, return the best iterate). Every operand —
    the field, the four transform matrices, the Laplacian factors, and all
    Krylov vectors — stays in VMEM for the whole solve; the ~16 small
    matmuls per iteration run back-to-back on the MXU with zero HBM traffic
    between them. This is the TPU-native replacement for the role scipy's
    spsolve plays in the reference (Forward2_solver.py:370), fused end-to-end
    instead of op-by-op.
    """

    def kernel(scal_ref, Lx_ref, LyT_ref, Vxi_ref, VyiT_ref, Vx_ref, VyT_ref,
               denom_ref, d_ref, b_ref, out_ref):
        inv_dt = scal_ref[0, 0]
        tau_dt = scal_ref[0, 1]
        half_kappa = scal_ref[0, 2]
        Lx = Lx_ref[:]
        LyT = LyT_ref[:]
        Vxi = Vxi_ref[:]
        VyiT = VyiT_ref[:]
        Vx = Vx_ref[:]
        VyT = VyT_ref[:]
        denom = denom_ref[:]
        dcoef = d_ref[:]
        b = b_ref[:]
        dt_ = b.dtype

        def mm(a, c):
            return jnp.dot(a, c, preferred_element_type=dt_, precision=_PREC)

        def lap(v):
            return mm(Lx, v) + mm(v, LyT)

        def apply_S(v):
            u = (tau_dt + dcoef) * v - half_kappa * lap(v)
            return inv_dt * v - lap(u)

        def apply_M(v):
            vhat = mm(mm(Vxi, v), VyiT) / denom
            return mm(mm(Vx, vhat), VyT)

        dot = lambda a, c: jnp.sum(a * c)
        eps_div = jnp.asarray(1e-30, dt_)
        one = jnp.asarray(1.0, dt_)
        r0 = b  # x0 = 0
        floor2 = (50.0 * eps_mach) ** 2 * jnp.maximum(dot(b, b), eps_div)

        def body(_, carry):
            x, r, p, v, rho, alpha, omega, best_x, best_r2 = carry
            active = dot(r, r) > floor2
            rho_new = dot(r0, r)
            beta = (rho_new / (rho + eps_div)) * (alpha / (omega + eps_div))
            p_n = r + beta * (p - omega * v)
            phat = apply_M(p_n)
            v_n = apply_S(phat)
            alpha_n = rho_new / (dot(r0, v_n) + eps_div)
            s = r - alpha_n * v_n
            shat = apply_M(s)
            t = apply_S(shat)
            omega_n = dot(t, s) / (dot(t, t) + eps_div)
            x_n = x + alpha_n * phat + omega_n * shat
            r_n = s - omega_n * t
            r2_n = dot(r_n, r_n)
            ok = active & jnp.isfinite(r2_n)
            sel = lambda a, bb: jnp.where(ok, a, bb)
            better = ok & (r2_n < best_r2)
            best_x = jnp.where(better, x_n, best_x)
            best_r2 = jnp.where(better, r2_n, best_r2)
            return (sel(x_n, x), sel(r_n, r), sel(p_n, p), sel(v_n, v),
                    jnp.where(ok, rho_new, rho), jnp.where(ok, alpha_n, alpha),
                    jnp.where(ok, omega_n, omega), best_x, best_r2)

        z = jnp.zeros_like(b)
        init = (z, r0, z, z, one, one, one, z, dot(r0, r0))
        out = jax.lax.fori_loop(0, n_iter, body, init)
        out_ref[:] = out[7]

    return kernel


def bicgstab_schur_pallas(Lx, LyT, Vx_inv, Vy_inv_T, Vx, VyT, denom, d, rhs,
                          inv_dt, tau_dt, half_kappa, n_iter: int,
                          interpret: bool = False):
    """Fused fixed-trip BiCGStab solve of the 2D Newton Schur system.

    Matches ops/linsolve.bicgstab_fixed(apply_S, rhs, apply_M, n_iter) with
    x0=0. Shapes: Lx,Vx* (n,n); LyT,Vy* (m,m); denom,d,rhs (n,m). Scalars
    ride in SMEM so one compiled kernel serves every traced dt. Batching:
    vmap maps the (n,m) operands over scenarios via pallas_call's batching
    rule (the operator matrices broadcast).
    """
    dtype = rhs.dtype
    eps_mach = 2.2e-16 if dtype == jnp.float64 else 1.2e-7
    scal = jnp.stack([jnp.asarray(inv_dt, dtype) + jnp.zeros((), dtype),
                      jnp.asarray(tau_dt, dtype) + jnp.zeros((), dtype),
                      jnp.asarray(half_kappa, dtype) + jnp.zeros((), dtype)]
                     ).reshape(1, 3)
    kernel = _bicgstab_schur_kernel_factory(int(n_iter), eps_mach)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(rhs.shape, dtype),
        in_specs=[_smem_spec()] + [_vmem_spec()] * 9,
        out_specs=_vmem_spec(),
        interpret=interpret,
        **_compiler_params(interpret),
    )(scal, Lx, LyT, Vx_inv, Vy_inv_T, Vx, VyT, denom, d, rhs)


def batched_kernel_vmem_fits(n: int, m: int, block_b: int,
                             dtype_bytes: int = 4,
                             vmem_limit: int = 100 * 2**20) -> bool:
    """VMEM-fit model for the BATCHED fused BiCGStab kernel.

    Measured Mosaic stack at 64x64 f32 block_b=8: 18.96 MB = ~66 padded
    field buffers per member (the Krylov carry plus transpose scratch and
    Mosaic's conservative stack accounting). The kernel raises its scoped
    vmem limit to 100 MB (v5e has ~128 MB physical VMEM), so the model
    gates against that."""
    pad = lambda a, k: -(-a // k) * k
    field = pad(n, 8) * pad(m, 128) * dtype_bytes
    gmat = pad(block_b * n, 8) * pad(block_b * n, 128) * dtype_bytes
    mats = 6 * max(pad(n, 8) * pad(n, 128), pad(m, 8) * pad(m, 128)) \
        * dtype_bytes
    return 66 * block_b * field + gmat + mats <= int(0.95 * vmem_limit)


def pick_batch_block(B: int, n: int, m: int, dtype_bytes: int = 4) -> int:
    """Largest member-tile size in {8,4,2,1} that fits VMEM; callers pad
    B up to a multiple of the returned block."""
    for bb in (8, 4, 2, 1):
        if batched_kernel_vmem_fits(n, m, bb, dtype_bytes):
            return bb
    return 0


def _bicgstab_schur_batched_kernel_factory(n_iter: int, eps_mach: float,
                                           block_b: int, n: int, m: int):
    """Member-tiled variant of _bicgstab_schur_kernel_factory.

    The serial kernel runs one whole solve per (vmap-induced) grid program:
    its (n,m)-sized matmuls use a sliver of the MXU (n=m=65 pads to
    (72,128)) and its 6 per-trip dot-product reductions run one field at a
    time on the VPU. This kernel holds a block_b-member tile in VMEM in a
    FLAT (block_b*n, m) layout: every right-multiply is one (block_b*n, m)
    matmul, every left-multiply one (block_b*m, n) matmul (via a
    member-local swapaxes through the rank-3 view), and per-member inner
    products are a lane reduction followed by one block-diag-of-ones
    matmul that replicates each member's sum down its rows — Mosaic
    rejects (block_b,1,1)-shaped scalar tensors, so per-member scalars
    live as member-replicated (block_b*n, 1) columns instead. Same
    fixed-trip bicgstab_fixed semantics (noise-floor freeze, non-finite
    rejection, best-iterate return) applied per member via those columns.
    """

    def mml(M, v):
        # member-batched left-multiply on the flat layout: out[b] = M @ v[b]
        vt = jnp.swapaxes(v.reshape(block_b, n, m), 1, 2)
        out = jnp.dot(vt.reshape(block_b * m, n), M.T,
                      preferred_element_type=v.dtype, precision=_PREC)
        return jnp.swapaxes(out.reshape(block_b, m, n), 1, 2).reshape(
            block_b * n, m)

    def mmr(v, M):
        # member-batched right-multiply: out[b] = v[b] @ M
        return jnp.dot(v, M, preferred_element_type=v.dtype, precision=_PREC)

    def kernel(scal_ref, Lx_ref, LyT_ref, Vxi_ref, VyiT_ref, Vx_ref, VyT_ref,
               G_ref, denom_ref, d_ref, b_ref, out_ref):
        inv_dt = scal_ref[0, 0]
        tau_dt = scal_ref[0, 1]
        half_kappa = scal_ref[0, 2]
        Lx = Lx_ref[:]
        LyT = LyT_ref[:]
        Vxi = Vxi_ref[:]
        VyiT = VyiT_ref[:]
        Vx = Vx_ref[:]
        VyT = VyT_ref[:]
        G = G_ref[:]                 # (block_b*n, block_b*n) block-ones
        flat = lambda ref: ref[:].reshape(block_b * n, m)
        denom = flat(denom_ref)
        dcoef = flat(d_ref)
        b = flat(b_ref)
        dt_ = b.dtype

        def lap(v):
            return mml(Lx, v) + mmr(v, LyT)

        def apply_S(v):
            u = (tau_dt + dcoef) * v - half_kappa * lap(v)
            return inv_dt * v - lap(u)

        def apply_M(v):
            vhat = mmr(mml(Vxi, v), VyiT) / denom
            return mmr(mml(Vx, vhat), VyT)

        def dot(a, c):
            # per-member inner product replicated down each member's rows:
            # lane-reduce to (block_b*n, 1), then the block-ones matmul sums
            # within each member block and broadcasts the total
            rows = jnp.sum(a * c, axis=1, keepdims=True)
            return jnp.dot(G, rows, preferred_element_type=dt_,
                           precision=_PREC)

        eps_div = jnp.asarray(1e-30, dt_)
        ones = jnp.ones((block_b * n, 1), dt_)
        r0 = b  # x0 = 0
        floor2 = (50.0 * eps_mach) ** 2 * jnp.maximum(dot(b, b), eps_div)

        def body(_, carry):
            x, r, p, v, rho, alpha, omega, best_x, best_r2 = carry
            active = dot(r, r) > floor2
            rho_new = dot(r0, r)
            beta = (rho_new / (rho + eps_div)) * (alpha / (omega + eps_div))
            p_n = r + beta * (p - omega * v)
            phat = apply_M(p_n)
            v_n = apply_S(phat)
            alpha_n = rho_new / (dot(r0, v_n) + eps_div)
            s = r - alpha_n * v_n
            shat = apply_M(s)
            t = apply_S(shat)
            omega_n = dot(t, s) / (dot(t, t) + eps_div)
            x_n = x + alpha_n * phat + omega_n * shat
            r_n = s - omega_n * t
            r2_n = dot(r_n, r_n)
            ok = active & jnp.isfinite(r2_n)
            sel = lambda a, bb_: jnp.where(ok, a, bb_)
            better = ok & (r2_n < best_r2)
            best_x = jnp.where(better, x_n, best_x)
            best_r2 = jnp.where(better, r2_n, best_r2)
            return (sel(x_n, x), sel(r_n, r), sel(p_n, p), sel(v_n, v),
                    jnp.where(ok, rho_new, rho), jnp.where(ok, alpha_n, alpha),
                    jnp.where(ok, omega_n, omega), best_x, best_r2)

        z = jnp.zeros_like(b)
        init = (z, r0, z, z, ones, ones, ones, z, dot(r0, r0))
        out = jax.lax.fori_loop(0, n_iter, body, init)
        out_ref[:] = out[7].reshape(block_b, n, m)

    return kernel


def bicgstab_schur_pallas_batched(Lx, LyT, Vx_inv, Vy_inv_T, Vx, VyT, denom,
                                  d, rhs, inv_dt, tau_dt, half_kappa,
                                  n_iter: int, block_b: int | None = None,
                                  interpret: bool = False):
    """Member-tiled fused fixed-trip BiCGStab Schur solve.

    denom, d, rhs are (B, n, m); the operator matrices are shared across
    members. Equivalent to jax.vmap(bicgstab_schur_pallas) over the batch
    (same math per member) but tiles block_b members into each grid
    program for MXU-sized matmuls and tile-wide reductions. B is padded
    up to a multiple of the block internally (padding rows solve rhs=0
    and are dropped)."""
    dtype = rhs.dtype
    B, n, m = rhs.shape
    eps_mach = 2.2e-16 if dtype == jnp.float64 else 1.2e-7
    bb = block_b or pick_batch_block(B, n, m, jnp.dtype(dtype).itemsize)
    if bb <= 0:
        raise ValueError(f"batched kernel does not fit VMEM at {n}x{m}")
    bb = min(bb, B)
    Bp = -(-B // bb) * bb
    if Bp != B:
        padw = [(0, Bp - B), (0, 0), (0, 0)]
        denom = jnp.pad(denom, padw, constant_values=1.0)
        d = jnp.pad(d, padw)
        rhs = jnp.pad(rhs, padw)
    scal = jnp.stack([jnp.asarray(inv_dt, dtype) + jnp.zeros((), dtype),
                      jnp.asarray(tau_dt, dtype) + jnp.zeros((), dtype),
                      jnp.asarray(half_kappa, dtype) + jnp.zeros((), dtype)]
                     ).reshape(1, 3)
    kernel = _bicgstab_schur_batched_kernel_factory(int(n_iter), eps_mach,
                                                    bb, n, m)
    # block-diag-of-ones member-sum replicator (see kernel dot()); built
    # host-side once per (bb, n) shape, shared by every grid program
    import numpy as _np
    G = jnp.asarray(_np.kron(_np.eye(bb), _np.ones((n, n))), dtype)

    def fullspec(r, c):
        if _HAS_PLTPU:
            return pl.BlockSpec((r, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((r, c), lambda i: (0, 0))

    def batchspec():
        if _HAS_PLTPU:
            return pl.BlockSpec((bb, n, m), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((bb, n, m), lambda i: (i, 0, 0))

    smem = (pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM) if _HAS_PLTPU
            else pl.BlockSpec((1, 3), lambda i: (0, 0)))
    # Mosaic's default scoped-VMEM limit is 16 MB; the member tile needs
    # ~2.4 MB/member at 64x64 (measured 18.96 MB at block_b=8), well under
    # the physical ~128 MB VMEM of a v5e core. Raise the per-kernel limit
    # with headroom instead of shrinking the tile.
    params = None
    if _HAS_PLTPU and not interpret:
        params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // bb,),
        out_shape=jax.ShapeDtypeStruct((Bp, n, m), dtype),
        in_specs=[smem, fullspec(n, n), fullspec(m, m), fullspec(n, n),
                  fullspec(m, m), fullspec(n, n), fullspec(m, m),
                  fullspec(bb * n, bb * n),
                  batchspec(), batchspec(), batchspec()],
        out_specs=batchspec(),
        interpret=interpret,
        **({"compiler_params": params} if params is not None else {}),
    )(scal, Lx, LyT, Vx_inv, Vy_inv_T, Vx, VyT, G, denom, d, rhs)
    return out[:B]


def _spectral_solve_kernel(Vxi_ref, VyiT_ref, Vx_ref, VyT_ref, denom_ref,
                           v_ref, out_ref):
    """out = Vx ((Vx^-1 v Vy^-T) / denom) Vy^T — exact poly(L) solve."""
    v = v_ref[:]
    vhat = jnp.dot(Vxi_ref[:], v, preferred_element_type=v.dtype, precision=_PREC)
    vhat = jnp.dot(vhat, VyiT_ref[:], preferred_element_type=v.dtype, precision=_PREC)
    vhat = vhat / denom_ref[:]
    out = jnp.dot(Vx_ref[:], vhat, preferred_element_type=v.dtype, precision=_PREC)
    out_ref[:] = jnp.dot(out, VyT_ref[:], preferred_element_type=v.dtype, precision=_PREC)


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


def _bicgstab_adjoint_kernel_factory(n_iter: int, eps_mach: float):
    """Fused split-preconditioned BiCGStab for the 2D adjoint step solve.

    Solves A(phi_n) p = rhs with A = I - tau L + (dt/2) L^2 - (dt/2) fpp L
    (backward2_solver.py:195-198 scheme) on the SPLIT-preconditioned system
    P^-1/2 A P^-1/2 (ops/linsolve.bicgstab_split semantics: f32 Krylov on
    the raw biharmonic-dominated operator stalls at eps*cond — conditioning
    the system first keeps iterates O(1)). Fixed trip count with the
    bicgstab_fixed noise-floor freeze + best-iterate tracking; warm-started
    from the next time level. Whole solve in one VMEM-resident kernel.
    """

    def kernel(scal_ref, Lx_ref, LyT_ref, Vxi_ref, VyiT_ref, Vx_ref, VyT_ref,
               isd_ref, fpp_ref, b_ref, x0_ref, out_ref):
        tau = scal_ref[0, 0]
        half_dt = scal_ref[0, 1]
        Lx = Lx_ref[:]
        LyT = LyT_ref[:]
        Vxi = Vxi_ref[:]
        VyiT = VyiT_ref[:]
        Vx = Vx_ref[:]
        VyT = VyT_ref[:]
        isd = isd_ref[:]            # 1/sqrt(|denom|) on the eigen grid
        fpp = fpp_ref[:]
        dt_ = b_ref.dtype

        def mm(a, c):
            return jnp.dot(a, c, preferred_element_type=dt_, precision=_PREC)

        def lap(v):
            return mm(Lx, v) + mm(v, LyT)

        def to_s(v):
            return mm(mm(Vxi, v), VyiT)

        def from_s(vh):
            return mm(mm(Vx, vh), VyT)

        def Phalf(v):
            return from_s(to_s(v) * isd)

        def Phalf_inv(v):
            return from_s(to_s(v) / isd)

        def apply_A(v):
            w = lap(v)
            return v - tau * w + half_dt * (lap(w) - fpp * w)

        def apply_At(v):
            return Phalf(apply_A(Phalf(v)))

        bt = Phalf(b_ref[:])
        y0 = Phalf_inv(x0_ref[:])

        dot = lambda a, c: jnp.sum(a * c)
        eps_div = jnp.asarray(1e-30, dt_)
        one = jnp.asarray(1.0, dt_)
        r0 = bt - apply_At(y0)
        floor2 = (50.0 * eps_mach) ** 2 * jnp.maximum(dot(bt, bt), eps_div)

        def body(_, carry):
            x, r, p, v, rho, alpha, omega, best_x, best_r2 = carry
            active = dot(r, r) > floor2
            rho_new = dot(r0, r)
            beta = (rho_new / (rho + eps_div)) * (alpha / (omega + eps_div))
            p_n = r + beta * (p - omega * v)
            v_n = apply_At(p_n)
            alpha_n = rho_new / (dot(r0, v_n) + eps_div)
            s = r - alpha_n * v_n
            t = apply_At(s)
            omega_n = dot(t, s) / (dot(t, t) + eps_div)
            x_n = x + alpha_n * p_n + omega_n * s
            r_n = s - omega_n * t
            r2_n = dot(r_n, r_n)
            ok = active & jnp.isfinite(r2_n)
            sel = lambda a, bb: jnp.where(ok, a, bb)
            better = ok & (r2_n < best_r2)
            best_x = jnp.where(better, x_n, best_x)
            best_r2 = jnp.where(better, r2_n, best_r2)
            return (sel(x_n, x), sel(r_n, r), sel(p_n, p), sel(v_n, v),
                    jnp.where(ok, rho_new, rho), jnp.where(ok, alpha_n, alpha),
                    jnp.where(ok, omega_n, omega), best_x, best_r2)

        z = jnp.zeros_like(bt)
        init = (y0, r0, z, z, one, one, one, y0, dot(r0, r0))
        out = jax.lax.fori_loop(0, n_iter, body, init)
        out_ref[:] = Phalf(out[7])

    return kernel


def bicgstab_adjoint_pallas(Lx, LyT, Vx_inv, Vy_inv_T, Vx, VyT,
                            inv_sqrt_denom, fpp, rhs, x0, tau, half_dt,
                            n_iter: int, interpret: bool = False):
    """Fused fixed-trip split-preconditioned adjoint solve (see factory)."""
    dtype = rhs.dtype
    eps_mach = 2.2e-16 if dtype == jnp.float64 else 1.2e-7
    scal = jnp.stack([jnp.asarray(tau, dtype) + jnp.zeros((), dtype),
                      jnp.asarray(half_dt, dtype) + jnp.zeros((), dtype)]
                     ).reshape(1, 2)
    kernel = _bicgstab_adjoint_kernel_factory(int(n_iter), eps_mach)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(rhs.shape, dtype),
        in_specs=[_smem_spec()] + [_vmem_spec()] * 10,
        out_specs=_vmem_spec(),
        interpret=interpret,
        **_compiler_params(interpret),
    )(scal, Lx, LyT, Vx_inv, Vy_inv_T, Vx, VyT, inv_sqrt_denom, fpp, rhs, x0)


def _bicgstab_schur_spectral_kernel_factory(n_iter: int, eps_mach: float):
    """Spectral-basis variant of the fused BiCGStab Schur solve.

    Change of variables yhat = Vx^-1 dphi Vy^-T turns the Schur system into
    Shat yhat = bhat with

      Shat yhat = poly(lam) * yhat - lam * to_spectral(d * from_spectral(yhat)),
      poly(lam) = 1/dt - (tau/dt) lam + (kappa/2) lam^2,

    so the cosine-diagonal preconditioner becomes a FREE pointwise divide
    (yhat / denom) and each operator apply costs 4 matmuls (one real-space
    round trip for the varying-d term) instead of the raw-basis kernel's 8
    (4 preconditioner + 4 operator): 8 matmuls/trip instead of 16. The
    rhs/solution transforms happen once inside the kernel. Same
    bicgstab_fixed policy (noise-floor freeze, non-finite rejection,
    best-iterate) but measured in the spectral residual metric — the
    returned iterate solves the same system; only the Krylov path differs
    (quality is gated by the outer Newton tolerance, which operates on the
    true nonlinear residual)."""

    def kernel(scal_ref, Vxi_ref, VyiT_ref, Vx_ref, VyT_ref, lam_ref,
               denom_ref, d_ref, b_ref, out_ref):
        inv_dt = scal_ref[0, 0]
        tau_dt = scal_ref[0, 1]
        half_kappa = scal_ref[0, 2]
        Vxi = Vxi_ref[:]
        VyiT = VyiT_ref[:]
        Vx = Vx_ref[:]
        VyT = VyT_ref[:]
        lam = lam_ref[:]
        denom = denom_ref[:]
        dcoef = d_ref[:]
        dt_ = d_ref.dtype
        poly = inv_dt - tau_dt * lam + half_kappa * lam * lam

        def mm(a, c):
            return jnp.dot(a, c, preferred_element_type=dt_, precision=_PREC)

        def to_s(v):
            return mm(mm(Vxi, v), VyiT)

        def from_s(vh):
            return mm(mm(Vx, vh), VyT)

        def apply_S(yh):
            return poly * yh - lam * to_s(dcoef * from_s(yh))

        def apply_M(yh):
            return yh / denom

        b = to_s(b_ref[:])
        dot = lambda a, c: jnp.sum(a * c)
        eps_div = jnp.asarray(1e-30, dt_)
        one = jnp.asarray(1.0, dt_)
        r0 = b  # x0 = 0
        floor2 = (50.0 * eps_mach) ** 2 * jnp.maximum(dot(b, b), eps_div)

        def body(_, carry):
            x, r, p, v, rho, alpha, omega, best_x, best_r2 = carry
            active = dot(r, r) > floor2
            rho_new = dot(r0, r)
            beta = (rho_new / (rho + eps_div)) * (alpha / (omega + eps_div))
            p_n = r + beta * (p - omega * v)
            phat = apply_M(p_n)
            v_n = apply_S(phat)
            alpha_n = rho_new / (dot(r0, v_n) + eps_div)
            s = r - alpha_n * v_n
            shat = apply_M(s)
            t = apply_S(shat)
            omega_n = dot(t, s) / (dot(t, t) + eps_div)
            x_n = x + alpha_n * phat + omega_n * shat
            r_n = s - omega_n * t
            r2_n = dot(r_n, r_n)
            ok = active & jnp.isfinite(r2_n)
            sel = lambda a, bb: jnp.where(ok, a, bb)
            better = ok & (r2_n < best_r2)
            best_x = jnp.where(better, x_n, best_x)
            best_r2 = jnp.where(better, r2_n, best_r2)
            return (sel(x_n, x), sel(r_n, r), sel(p_n, p), sel(v_n, v),
                    jnp.where(ok, rho_new, rho), jnp.where(ok, alpha_n, alpha),
                    jnp.where(ok, omega_n, omega), best_x, best_r2)

        z = jnp.zeros_like(b)
        init = (z, r0, z, z, one, one, one, z, dot(r0, r0))
        out = jax.lax.fori_loop(0, n_iter, body, init)
        out_ref[:] = from_s(out[7])

    return kernel


def bicgstab_schur_spectral_pallas(Vx_inv, Vy_inv_T, Vx, VyT, lam, denom, d,
                                   rhs, inv_dt, tau_dt, half_kappa,
                                   n_iter: int, interpret: bool = False):
    """Fused fixed-trip spectral-basis BiCGStab Schur solve (see factory)."""
    dtype = rhs.dtype
    eps_mach = 2.2e-16 if dtype == jnp.float64 else 1.2e-7
    scal = jnp.stack([jnp.asarray(inv_dt, dtype) + jnp.zeros((), dtype),
                      jnp.asarray(tau_dt, dtype) + jnp.zeros((), dtype),
                      jnp.asarray(half_kappa, dtype) + jnp.zeros((), dtype)]
                     ).reshape(1, 3)
    kernel = _bicgstab_schur_spectral_kernel_factory(int(n_iter), eps_mach)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(rhs.shape, dtype),
        in_specs=[_smem_spec()] + [_vmem_spec()] * 8,
        out_specs=_vmem_spec(),
        interpret=interpret,
        **_compiler_params(interpret),
    )(scal, Vx_inv, Vy_inv_T, Vx, VyT, lam, denom, d, rhs)


def _bicgstab_adjoint_spectral_kernel_factory(n_iter: int, eps_mach: float):
    """Spectral-basis split-preconditioned adjoint solve.

    Both the similarity transform (cosine basis) and the split
    preconditioner P^-1/2 = diag(1/sqrt|denom|) are diagonal in spectral
    coordinates, so the preconditioned operator apply

      At yhat = isd * [poly_A(lam) * (isd*yhat)
                       - (dt/2) to_spectral(fpp * from_spectral(lam * isd*yhat))]
      poly_A(lam) = 1 - tau lam + (dt/2) lam^2

    costs 4 matmuls (one real-space round trip for the varying-fpp term)
    instead of the raw-basis kernel's 12 (two Phalf conjugations + the
    operator). The rhs / warm-start / solution transforms happen once.
    Same bicgstab_fixed policy; the Krylov residual lives in the
    preconditioned spectral metric (same metric as bicgstab_split up to
    the basis change)."""

    def kernel(scal_ref, Vxi_ref, VyiT_ref, Vx_ref, VyT_ref, lam_ref,
               isd_ref, fpp_ref, b_ref, x0_ref, out_ref):
        tau = scal_ref[0, 0]
        half_dt = scal_ref[0, 1]
        Vxi = Vxi_ref[:]
        VyiT = VyiT_ref[:]
        Vx = Vx_ref[:]
        VyT = VyT_ref[:]
        lam = lam_ref[:]
        isd = isd_ref[:]            # 1/sqrt(|denom|) on the eigen grid
        fpp = fpp_ref[:]
        dt_ = b_ref.dtype
        poly = 1.0 - tau * lam + half_dt * lam * lam

        def mm(a, c):
            return jnp.dot(a, c, preferred_element_type=dt_, precision=_PREC)

        def to_s(v):
            return mm(mm(Vxi, v), VyiT)

        def from_s(vh):
            return mm(mm(Vx, vh), VyT)

        def apply_At(yh):
            z = isd * yh
            w = to_s(fpp * from_s(lam * z))
            return isd * (poly * z - half_dt * w)

        bt = isd * to_s(b_ref[:])
        y0 = to_s(x0_ref[:]) / isd

        dot = lambda a, c: jnp.sum(a * c)
        eps_div = jnp.asarray(1e-30, dt_)
        one = jnp.asarray(1.0, dt_)
        r0 = bt - apply_At(y0)
        floor2 = (50.0 * eps_mach) ** 2 * jnp.maximum(dot(bt, bt), eps_div)

        def body(_, carry):
            x, r, p, v, rho, alpha, omega, best_x, best_r2 = carry
            active = dot(r, r) > floor2
            rho_new = dot(r0, r)
            beta = (rho_new / (rho + eps_div)) * (alpha / (omega + eps_div))
            p_n = r + beta * (p - omega * v)
            v_n = apply_At(p_n)
            alpha_n = rho_new / (dot(r0, v_n) + eps_div)
            s = r - alpha_n * v_n
            t = apply_At(s)
            omega_n = dot(t, s) / (dot(t, t) + eps_div)
            x_n = x + alpha_n * p_n + omega_n * s
            r_n = s - omega_n * t
            r2_n = dot(r_n, r_n)
            ok = active & jnp.isfinite(r2_n)
            sel = lambda a, bb: jnp.where(ok, a, bb)
            better = ok & (r2_n < best_r2)
            best_x = jnp.where(better, x_n, best_x)
            best_r2 = jnp.where(better, r2_n, best_r2)
            return (sel(x_n, x), sel(r_n, r), sel(p_n, p), sel(v_n, v),
                    jnp.where(ok, rho_new, rho), jnp.where(ok, alpha_n, alpha),
                    jnp.where(ok, omega_n, omega), best_x, best_r2)

        z = jnp.zeros_like(bt)
        init = (y0, r0, z, z, one, one, one, y0, dot(r0, r0))
        out = jax.lax.fori_loop(0, n_iter, body, init)
        out_ref[:] = from_s(isd * out[7])

    return kernel


def bicgstab_adjoint_spectral_pallas(Vx_inv, Vy_inv_T, Vx, VyT, lam,
                                     inv_sqrt_denom, fpp, rhs, x0, tau,
                                     half_dt, n_iter: int,
                                     interpret: bool = False):
    """Fused fixed-trip spectral-basis split-preconditioned adjoint solve.

    inv_sqrt_denom is 1/sqrt(|denom(lam)|) on the EIGENVALUE grid (spectral
    coordinates), unlike bicgstab_adjoint_pallas which takes it as a
    real-space preconditioner field."""
    dtype = rhs.dtype
    eps_mach = 2.2e-16 if dtype == jnp.float64 else 1.2e-7
    scal = jnp.stack([jnp.asarray(tau, dtype) + jnp.zeros((), dtype),
                      jnp.asarray(half_dt, dtype) + jnp.zeros((), dtype)]
                     ).reshape(1, 2)
    kernel = _bicgstab_adjoint_spectral_kernel_factory(int(n_iter), eps_mach)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(rhs.shape, dtype),
        in_specs=[_smem_spec()] + [_vmem_spec()] * 9,
        out_specs=_vmem_spec(),
        interpret=interpret,
        **_compiler_params(interpret),
    )(scal, Vx_inv, Vy_inv_T, Vx, VyT, lam, inv_sqrt_denom, fpp, rhs, x0)
