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
from aqp_tpu.parallel.mesh import (
    CHIP_AXIS, DEFAULT_AXIS, HOST_AXIS, make_mesh, shard_relation)
from aqp_tpu.parallel.shuffle import (
    PAD_R, PAD_S, shuffle_relation, shuffle_relation_hier)
from aqp_tpu.relation import Relation


def _dist_join_count_body(rk, rp, sk, sp, axis: str, cap_r: int, cap_s: int,
                          salt: int = 0):
    rk2, rp2, ovf_r = shuffle_relation(rk, rp, axis, cap_r, PAD_R, salt=salt)
    sk2, sp2, ovf_s = shuffle_relation(sk, sp, axis, cap_s, PAD_S, salt=salt)
    local = mergejoin.merge_join_count(rk2, rp2, sk2, sp2)
    matches = jax.lax.psum(local.matches, axis)
    checksum = jax.lax.psum(local.checksum, axis)
    return matches, checksum, ovf_r, ovf_s


def make_dist_join_count(mesh: Mesh, nr_shard: int, ns_shard: int,
                         axis: str = DEFAULT_AXIS, safety: float = 2.0,
                         salt: int = 0):
    """Build the jitted SPMD distributed join for given per-shard sizes.

    Capacity per destination bucket = (rows_per_shard / n) * safety, the
    static-shape analog of the reference's partition padding
    (radix_join.cpp:339-345).
    """
    n = mesh.shape[axis]
    cap_r = max(8, int(nr_shard / n * safety))
    cap_s = max(8, int(ns_shard / n * safety))

    body = functools.partial(
        _dist_join_count_body, axis=axis, cap_r=cap_r, cap_s=cap_s, salt=salt
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


# Salt ladder for shuffle-overflow retries (the promise of shuffle.py's
# docstring, now kept): distinct keys that collide into one destination
# bucket under one mixer salt spread under another.  TRUE heavy hitters
# (single-key mass) overflow under every salt — those route to the skew
# engine (parallel/skew.py), the SPMD replacement for the reference's
# dynamic task stealing (radix_join.cpp:1086-1335).
SHUFFLE_SALTS = (0, 0x5BD1E995, 0x27D4EB2F)


@functools.lru_cache(maxsize=64)
def _cached_dist_join_count(mesh, nr_shard, ns_shard, axis, safety, salt):
    """Per-(mesh, shapes, salt) compiled-program cache: the common
    no-overflow case pays one trace+compile ever, not one per call."""
    return make_dist_join_count(mesh, nr_shard, ns_shard, axis, safety,
                                salt=salt)


def dist_join_count_auto(relR: Relation, relS: Relation,
                         mesh: Optional[Mesh] = None,
                         axis: str = DEFAULT_AXIS, safety: float = 2.0,
                         skew_threshold: float = 8.0):
    """Distributed count join with automatic overflow recovery.

    Escalation: hash shuffle → salted re-shuffle (×2) → skew-aware
    heavy-hitter join.  Never returns a silently-wrong count: every tier
    either reports overflow=0 or escalates; the skew tier's result carries
    its own overflow counter.  Returns (matches, checksum, tier) where
    tier is "hash", "hash+salt", or "skew".

    skew_threshold: a key counts as a heavy hitter when its global S mass
    exceeds this multiple of the mean per-key rows (|S|/|R|) — the analog
    of the reference's MWAY skew constants (joincommon.h:25-29) and the
    dynamic-stealing crossover.
    """
    from aqp_tpu.parallel.skew import make_dist_join_count_skew

    mesh = mesh or make_mesh(axis=axis)
    n = mesh.shape[axis]
    R = shard_relation(relR, mesh, axis)
    S = shard_relation(relS, mesh, axis)
    nr_s, ns_s = R.num_tuples // n, S.num_tuples // n
    for i, salt in enumerate(SHUFFLE_SALTS):
        fn = _cached_dist_join_count(mesh, nr_s, ns_s, axis, safety, salt)
        m, ck, ovf_r, ovf_s = fn(R.key, R.payload, S.key, S.payload)
        if int(ovf_r) == 0 and int(ovf_s) == 0:
            return int(m), int(ck), ("hash" if i == 0 else "hash+salt")
    heavy_threshold = max(
        32, int(skew_threshold * S.num_tuples / max(1, R.num_tuples)))
    fn = make_dist_join_count_skew(mesh, nr_s, ns_s, axis, safety,
                                   heavy_threshold=heavy_threshold)
    m, ck, ovf = fn(R.key, R.payload, S.key, S.payload)
    if int(ovf) != 0:
        raise RuntimeError(
            f"distributed join overflow beyond every tier: {int(ovf)} rows")
    return int(m), int(ck), "skew"


# ---------------------------------------------------------------------------
# Two-axis (host × chip) distributed join — DCN/ICI hierarchy


def _dist_join_count_2d_body(rk, rp, sk, sp, host_axis, chip_axis,
                             cap_hr, cap_cr, cap_hs, cap_cs, salt: int = 0):
    rk2, rp2, ovf_r = shuffle_relation_hier(
        rk, rp, host_axis, chip_axis, cap_hr, cap_cr, PAD_R, salt=salt)
    sk2, sp2, ovf_s = shuffle_relation_hier(
        sk, sp, host_axis, chip_axis, cap_hs, cap_cs, PAD_S, salt=salt)
    local = mergejoin.merge_join_count(rk2, rp2, sk2, sp2)
    matches = jax.lax.psum(jax.lax.psum(local.matches, host_axis), chip_axis)
    checksum = jax.lax.psum(
        jax.lax.psum(local.checksum, host_axis), chip_axis)
    return matches, checksum, ovf_r, ovf_s


def make_dist_join_count_2d(mesh: Mesh, nr_shard: int, ns_shard: int,
                            host_axis: str = HOST_AXIS,
                            chip_axis: str = CHIP_AXIS,
                            safety: float = 2.0, salt: int = 0):
    """Jitted SPMD join over a (host × chip) mesh with the hierarchical
    DCN→ICI shuffle (SURVEY.md §2c rows 5/8: the NUMA→topology analog).

    Level-1 capacity: each program sends ~rows/nh per host; level-2: the
    post-level-1 shard holds ~rows·nc... both padded by `safety`."""
    nh, nc = mesh.shape[host_axis], mesh.shape[chip_axis]
    cap_hr = max(8, int(nr_shard / nh * safety))
    cap_cr = max(8, int(cap_hr * nh / nc * safety))
    cap_hs = max(8, int(ns_shard / nh * safety))
    cap_cs = max(8, int(cap_hs * nh / nc * safety))
    body = functools.partial(
        _dist_join_count_2d_body, host_axis=host_axis, chip_axis=chip_axis,
        cap_hr=cap_hr, cap_cr=cap_cr, cap_hs=cap_hs, cap_cs=cap_cs, salt=salt)
    spec = P((host_axis, chip_axis))
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(P(), P(), P(), P()),
    )
    return jax.jit(sharded)


def dist_join_count_2d(relR: Relation, relS: Relation, mesh: Mesh):
    """Convenience wrapper for the 2-axis mesh."""
    nh = mesh.shape[HOST_AXIS]
    nc = mesh.shape[CHIP_AXIS]
    n = nh * nc
    R = shard_relation(relR, mesh)
    S = shard_relation(relS, mesh)
    fn = make_dist_join_count_2d(mesh, R.num_tuples // n, S.num_tuples // n)
    return fn(R.key, R.payload, S.key, S.payload)


# ---------------------------------------------------------------------------
# Distributed materializing join


def _dist_join_mat_body(rk, rp, sk, sp, axis, cap_r, cap_s, out_cap,
                        salt: int = 0):
    rk2, rp2, ovf_r = shuffle_relation(rk, rp, axis, cap_r, PAD_R, salt=salt)
    sk2, sp2, ovf_s = shuffle_relation(sk, sp, axis, cap_s, PAD_S, salt=salt)
    out = mergejoin.merge_join_materialize(rk2, rp2, sk2, sp2, out_cap)
    matches = jax.lax.psum(out.matches, axis)
    checksum = jax.lax.psum(out.checksum, axis)
    ovf_out = jnp.maximum(out.matches - out_cap, 0)
    ovf = ovf_r + ovf_s + jax.lax.psum(ovf_out, axis)
    return matches, checksum, out.key, out.r_payload, out.s_payload, ovf


def make_dist_join_materialize(mesh: Mesh, nr_shard: int, ns_shard: int,
                               axis: str = DEFAULT_AXIS,
                               safety: float = 2.0, salt: int = 0):
    """Distributed materializing join: hash shuffle + local materialize.

    Output columns stay SHARDED (each shard holds the matches of its key
    range — the cluster analog of the reference's per-thread chunked tables
    spliced by `concatenate`, ChunkedTable.cpp:146-171; here the splice is
    free because the output is a sharded array).  Per-shard capacity =
    ns_shard * safety; overflow (shuffle drops or output-capacity clip)
    is reported, never silent.
    """
    n = mesh.shape[axis]
    cap_r = max(8, int(nr_shard / n * safety))
    cap_s = max(8, int(ns_shard / n * safety))
    out_cap = max(8, int(ns_shard * safety))
    body = functools.partial(
        _dist_join_mat_body, axis=axis, cap_r=cap_r, cap_s=cap_s,
        out_cap=out_cap, salt=salt)
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P(axis), P(axis), P(axis), P()),
    )
    return jax.jit(sharded)


def dist_join_materialize(relR: Relation, relS: Relation,
                          mesh: Optional[Mesh] = None,
                          axis: str = DEFAULT_AXIS, safety: float = 2.0):
    """Convenience wrapper.  Returns (matches, checksum, key, r_payload,
    s_payload, overflow); output columns are sharded over `axis`, padded
    with sentinel keys (< 0) in unused capacity slots."""
    mesh = mesh or make_mesh(axis=axis)
    n = mesh.shape[axis]
    R = shard_relation(relR, mesh, axis)
    S = shard_relation(relS, mesh, axis)
    fn = make_dist_join_materialize(
        mesh, R.num_tuples // n, S.num_tuples // n, axis, safety)
    return fn(R.key, R.payload, S.key, S.payload)
