"""Device meshes and shardings for multi-chip execution.

The reference has no distributed execution at all (SURVEY.md §2c).  Here the
scaling dimension is the *graph*: node and edge arrays are sharded along a 1-D
``graph`` mesh axis (the spatial version of the reference's METIS cluster
minibatching-in-time, train.py:335), while the ~220k dense parameters are
replicated.  XLA's SPMD partitioner inserts the halo collectives (all-gathers
for neighbour feature reads, reduce-scatters for segment sums, psums for
gradients) from these annotations.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh()`` —
``jax.devices()`` then spans all hosts and the same code runs unchanged, with
intra-host traffic on ICI and cross-host on DCN.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

GRAPH_AXIS = "graph"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"mesh of {n_devices} devices requested but only "
                f"{len(devices)} available (on CPU set jax_num_cpu_devices "
                "before backend init; multi-host: jax.distributed.initialize)")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (GRAPH_AXIS,))


def graph_sharding(mesh: Mesh) -> NamedSharding:
    """First-axis sharding for node/edge arrays."""
    return NamedSharding(mesh, P(GRAPH_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
