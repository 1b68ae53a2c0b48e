"""Device mesh setup and relation sharding.

The reference is single-node shared-memory: its "topology layer" is NUMA
core pinning (cpu_mapping.cpp, ocalls.cpp:71-91).  The TPU analog is a named
device mesh: the intra-host axis rides ICI (NUMA-local analog), the
inter-host axis DCN (cross-NUMA analog).  Relations are sharded row-wise
across the mesh; shuffles are `all_to_all` collectives on a named axis.

Multi-host bring-up: `jax.distributed.initialize()` is called by the launch
environment; this module only assumes `jax.devices()` reflects the slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aqp_tpu.relation import Relation

DEFAULT_AXIS = "shard"
HOST_AXIS = "host"   # inter-host axis: collectives ride DCN (cross-NUMA analog)
CHIP_AXIS = "chip"   # intra-host axis: collectives ride ICI (NUMA-local analog)


def make_mesh(n_devices: Optional[int] = None, axis: str = DEFAULT_AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def make_mesh_2d(n_hosts: Optional[int] = None,
                 chips_per_host: Optional[int] = None,
                 axes=(HOST_AXIS, CHIP_AXIS)) -> Mesh:
    """Two-axis (host × chip) mesh — the ICI/DCN topology analog of the
    reference's NUMA layer (cpu_mapping.cpp, cross-NUMA study 3_numa.sh).

    On a real multi-host slice jax.devices() is ordered process-major, so
    reshaping to (n_hosts, chips_per_host) puts each row on one host: the
    chip axis is intra-host (ICI), the host axis inter-host (DCN).  On the
    virtual CPU mesh the split is logical but exercises the same two-level
    collective program."""
    devs = jax.devices()
    if n_hosts is None:
        n_hosts = max(1, jax.process_count())
    if chips_per_host is None:
        chips_per_host = len(devs) // n_hosts
    grid = np.asarray(devs[: n_hosts * chips_per_host]).reshape(
        n_hosts, chips_per_host)
    return Mesh(grid, axes)


def _row_spec(mesh: Mesh):
    """PartitionSpec sharding rows over every mesh axis."""
    return P(tuple(mesh.axis_names)) if len(mesh.axis_names) > 1 else P(
        mesh.axis_names[0])


def shard_relation(rel: Relation, mesh: Mesh, axis: Optional[str] = None
                   ) -> Relation:
    """Row-shard a relation across the mesh (pad to a multiple of the shard
    count with negative sentinel keys, which every shuffle/join stage
    drops).  axis=None shards rows over ALL mesh axes jointly; an explicit
    axis shards over that axis only (the other axes replicate)."""
    import jax.numpy as jnp

    if axis is None:
        spec = _row_spec(mesh)
        n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    else:
        spec = P(axis)
        n = mesh.shape[axis]
    pad = (-rel.num_tuples) % n
    key, payload = rel.key, rel.payload
    if pad:
        key = jnp.concatenate([key, jnp.full((pad,), -1, key.dtype)])
        payload = jnp.concatenate([payload, jnp.zeros((pad,), payload.dtype)])
    sh = NamedSharding(mesh, spec)
    return Relation(jax.device_put(key, sh), jax.device_put(payload, sh))
