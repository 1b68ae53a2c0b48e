"""Columnar relations and join results.

The reference's core data model is the row-oriented `row_t {key, payload}` /
`table_t` (lib/SharedHeaders/include/data-types.h:44-97) with join output in
16 KiB chunked tables (`chunked_table_t`, data-types.h:74-92,
lib/Joins/src/ChunkedTable.cpp:20-171).  The TPU-native model is columnar:
a Relation is a pair of device arrays (structure-of-arrays), and join results
are fixed-capacity compacted columns + a validity count (XLA static shapes),
which plays the role of the chunked table without pointer chasing.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Relation:
    """A columnar relation: parallel `key` and `payload` device arrays.

    Equivalent of `table_t` (data-types.h:94-97); `num_tuples` is implicit in
    the array shape (shapes are static under jit).
    """

    key: jax.Array
    payload: jax.Array

    @property
    def num_tuples(self) -> int:
        return self.key.shape[0]

    @property
    def nbytes(self) -> int:
        return self.key.nbytes + self.payload.nbytes

    def __len__(self) -> int:
        return self.num_tuples

    @staticmethod
    def from_keys(key: jax.Array, payload: Optional[jax.Array] = None) -> "Relation":
        if payload is None:
            # Reference generators leave payloads zero (generator.cpp only
            # writes keys); TPC-H uses payload=rowID instead.
            payload = jnp.zeros_like(key)
        return Relation(key=key, payload=payload)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class JoinResult:
    """Result of a join: always-exact `matches` + `checksum`, and optionally
    materialized output columns (analog of result_t + chunked tables,
    data-types.h:104-121).

    Materialized columns are fixed-capacity (static shape) and CHUNKED:
    exactly `matches` rows are live, and a hole carries the sentinel key
    -3 (never a real key) with zero payloads.  The XLA engines emit live
    rows first (holes = tail); the Pallas RHO materializer emits
    region-chunked holes (ops/pallas/rho3.rho_join_materialize_v3) — the
    direct analog of the reference's spliced per-thread chunk lists
    (ChunkedTable.cpp:146-171), whose consumers likewise iterate chunks
    rather than assume density.  Downstream joins accept -3 directly (it
    can never match); dense consumers compact with
    ops/mergejoin.compact_matches.  `checksum` accumulates
    sum(r_payload + s_payload) over matches mod 2^32 — the reference's CHT
    checksum oracle (CHTJoin.hpp:154-178) generalized to all algorithms.
    """

    matches: jax.Array  # scalar int64
    checksum: jax.Array  # scalar uint64
    key: Optional[jax.Array] = None
    r_payload: Optional[jax.Array] = None
    s_payload: Optional[jax.Array] = None
    # Deferred-validation channel (JoinConfig.defer): the serving tier's
    # device-resident overflow counter.  None = already validated.  A
    # deferred result is valid iff int(overflow) == 0; otherwise the
    # caller re-runs via joins.api.finalize_join (escalation ladder) —
    # overflow is REPORTED, never silent (rho3 contract).
    overflow: Optional[jax.Array] = None

    @property
    def materialized(self) -> bool:
        return self.key is not None

    def to_relation_rp(self) -> Relation:
        """Next-join input keyed by the matched key, payload = r_payload.

        Mirrors result-transformer `copy_Sp_Sp`-family semantics
        (lib/TPCH-Queries/src/result_transformers.cpp:33-116) — the TPC-H
        plans re-key intermediate join outputs before the next join.
        """
        assert self.materialized
        return Relation(key=self.key, payload=self.r_payload)

    def to_relation_sp(self) -> Relation:
        assert self.materialized
        return Relation(key=self.key, payload=self.s_payload)
