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


def make_mesh(n_devices: Optional[int] = None, axis: str = DEFAULT_AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_relation(rel: Relation, mesh: Mesh, axis: str = DEFAULT_AXIS) -> Relation:
    """Row-shard a relation across the mesh (pad to a multiple of the axis
    size with non-matching sentinel keys)."""
    n = mesh.shape[axis]
    import jax.numpy as jnp

    pad = (-rel.num_tuples) % n
    key, payload = rel.key, rel.payload
    if pad:
        key = jnp.concatenate([key, jnp.full((pad,), -1, key.dtype)])
        payload = jnp.concatenate([payload, jnp.zeros((pad,), payload.dtype)])
    sh = NamedSharding(mesh, P(axis))
    return Relation(jax.device_put(key, sh), jax.device_put(payload, sh))
