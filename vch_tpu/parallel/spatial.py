"""Spatial (grid) sharding: halo-exchange Neumann Laplacian under shard_map.

For very large grids (256x256+, BASELINE.md config 5) the scenario batch
alone may not saturate a slice; the grid's x-axis can be sharded across
chips. The 5-point stencil then needs one row of halo from each neighbor
per apply — exchanged with `lax.ppermute` over the mesh axis (ICI
neighbor-to-neighbor traffic, no all-to-all). Global Neumann boundaries
keep their mirrored-ghost form automatically: the first/last shard
substitutes its own second/second-to-last row for the missing halo, which
is exactly the reflection stencil (ops/laplacian.py).

This is the SURVEY.md section 7 stretch goal; round 1 ships the sharded
operator + parity gate (vs the unsharded stencil), with full solver
integration as follow-up.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _halo_laplacian_local(v, hx, hy, axis_name):
    """Per-shard 2D Laplacian with ppermute halo exchange along axis 0."""
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)

    up_halo = lax.ppermute(v[-1:], axis_name,
                           [(i, i + 1) for i in range(n - 1)])
    down_halo = lax.ppermute(v[:1], axis_name,
                             [(i, i - 1) for i in range(1, n)])
    # global boundaries: mirrored ghost row (Neumann)
    up = jnp.where(idx == 0, v[1:2], up_halo)
    down = jnp.where(idx == n - 1, v[-2:-1], down_halo)

    pad = jnp.concatenate([up, v, down], axis=0)
    lap_x = (pad[:-2] - 2.0 * v + pad[2:]) / (hx * hx)

    pady = jnp.concatenate([v[:, 1:2], v, v[:, -2:-1]], axis=1)
    lap_y = (pady[:, :-2] - 2.0 * v + pady[:, 2:]) / (hy * hy)
    return lap_x + lap_y


def sharded_laplacian_2d(mesh: Mesh, axis_name: str, hx: float, hy: float):
    """Build a jitted Laplacian whose x-axis is sharded over `axis_name`.

    Returns fn(v) for global fields v of shape (Nx+1, Ny+1) with Nx+1
    divisible by the mesh axis size; the apply runs fully distributed with
    one ppermute halo exchange.
    """
    fn = jax.shard_map(
        partial(_halo_laplacian_local, hx=hx, hy=hy, axis_name=axis_name),
        mesh=mesh, in_specs=P(axis_name, None), out_specs=P(axis_name, None))
    sharding = NamedSharding(mesh, P(axis_name, None))

    @jax.jit
    def apply(v):
        v = jax.device_put(v, sharding)
        return fn(v)

    return apply
