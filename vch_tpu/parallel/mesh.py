"""Device mesh construction and batch-axis sharding helpers.

Design (SURVEY.md section 7): a 1D mesh over the scenario batch; arrays with
a leading batch axis are placed with NamedSharding(P("scenarios")), so every
elementwise/matmul op in the solvers runs embarrassingly parallel per chip
and scalar reductions (cost sums, convergence tests) become psums over ICI.
For multi-host, `jax.distributed.initialize()` + the same mesh spans hosts
(DCN between hosts, ICI within).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "scenarios"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1D mesh over the scenario-batch axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=(BATCH_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays whose LEADING axis is the scenario batch."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host bring-up for pod slices (BASELINE.md weak-scaling runs).

    Wraps `jax.distributed.initialize`; with no arguments, TPU pod
    environments auto-discover peers. After this, `make_mesh()` over
    `jax.devices()` spans all hosts: the scenario axis crosses hosts via DCN
    while per-host shards communicate over ICI. Safe to call on CPU-only
    test environments (no-ops on failure).
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return True
    except Exception as e:  # single-process / already initialized
        print(f"[parallel] distributed init skipped: {e}")
        return False


def shard_batch(tree, mesh: Mesh):
    """Place every array in `tree` with its leading axis sharded over the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)
