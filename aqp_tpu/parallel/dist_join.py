"""Distributed joins: hash-shuffle + local join under shard_map.

Distributed RHO: the first radix pass becomes the inter-chip hash shuffle
(all_to_all over the mesh axis), local passes and build/probe run per shard
(SURVEY.md §2c).  Counts and checksums reduce with psum — the cross-chip
analog of the reference's "sum results over threads" (radix_join.cpp:1542-1557).

Exactness across shardings: matches/checksums are order-invariant sums, so
the result is bit-identical to the single-chip engine for any mesh size.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from aqp_tpu.ops import mergejoin
from aqp_tpu.parallel.mesh import DEFAULT_AXIS, make_mesh, shard_relation
from aqp_tpu.parallel.shuffle import PAD_R, PAD_S, shuffle_relation
from aqp_tpu.relation import Relation


def _dist_join_count_body(rk, rp, sk, sp, axis: str, cap_r: int, cap_s: int):
    rk2, rp2, ovf_r = shuffle_relation(rk, rp, axis, cap_r, PAD_R)
    sk2, sp2, ovf_s = shuffle_relation(sk, sp, axis, cap_s, PAD_S)
    local = mergejoin.merge_join_count(rk2, rp2, sk2, sp2)
    matches = jax.lax.psum(local.matches, axis)
    checksum = jax.lax.psum(local.checksum, axis)
    return matches, checksum, ovf_r, ovf_s


def make_dist_join_count(mesh: Mesh, nr_shard: int, ns_shard: int,
                         axis: str = DEFAULT_AXIS, safety: float = 2.0):
    """Build the jitted SPMD distributed join for given per-shard sizes.

    Capacity per destination bucket = (rows_per_shard / n) * safety, the
    static-shape analog of the reference's partition padding
    (radix_join.cpp:339-345).
    """
    n = mesh.shape[axis]
    cap_r = max(8, int(nr_shard / n * safety))
    cap_s = max(8, int(ns_shard / n * safety))

    body = functools.partial(
        _dist_join_count_body, axis=axis, cap_r=cap_r, cap_s=cap_s
    )
    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P(), P()),
    )
    return jax.jit(sharded)


def dist_join_count(relR: Relation, relS: Relation,
                    mesh: Optional[Mesh] = None, axis: str = DEFAULT_AXIS):
    """Convenience wrapper: shard, shuffle, join, reduce.  Returns
    (matches, checksum, overflow_r, overflow_s)."""
    mesh = mesh or make_mesh(axis=axis)
    n = mesh.shape[axis]
    R = shard_relation(relR, mesh, axis)
    S = shard_relation(relS, mesh, axis)
    fn = make_dist_join_count(mesh, R.num_tuples // n, S.num_tuples // n, axis)
    return fn(R.key, R.payload, S.key, S.payload)
