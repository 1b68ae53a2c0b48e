"""CrkJoin mechanics: partition tree, lazy cross-query reuse, windowed
per-partition join (CrkJoin/Join.hpp semantics, TPU re-design)."""

import numpy as np
import pytest

from aqp_tpu.config import JoinConfig
from aqp_tpu.data import create_relation_pk, create_relation_fk
from aqp_tpu.joins.crk import (
    CrackedRelation, crack_relation, crack_to, crk_join_cracked)
from aqp_tpu.ops.mergejoin import merge_join_count
from aqp_tpu.utils.timing import PhaseTimer


def _workload(nr=1 << 10, ns=1 << 12):
    r = create_relation_pk(nr, seed=201)
    s = create_relation_fk(ns, nr, seed=202)
    return r, s


def test_tree_bounds_are_partition_spans():
    """bounds[p]..bounds[p+1] must exactly span the rows whose top-depth
    key bits equal p (the PTreeNode start/num contract)."""
    r, _ = _workload()
    cr = crack_to(crack_relation(r), 3)
    key = np.asarray(cr.key)
    bounds = np.asarray(cr.bounds)
    bucket = key >> (cr.key_bits - 3)
    assert bounds[0] == 0 and bounds[-1] == key.shape[0]
    for p in range(1 << 3):
        seg = bucket[bounds[p]:bounds[p + 1]]
        assert (seg == p).all()
    # grouped: bucket ids non-decreasing after cracking
    assert (np.diff(bucket) >= 0).all()


def test_crack_reuse_is_lazy():
    """A second join on the SAME cracked stores must pay zero crack rounds
    — cracking state persists across queries (the paper's core property)."""
    r, s = _workload()
    cfg = JoinConfig()
    import math
    kb = max(1, math.ceil(math.log2(r.num_tuples))) + 1
    crR, crS = crack_relation(r, kb), crack_relation(s, kb)
    pt1 = PhaseTimer()
    out1, crR, crS = crk_join_cracked(crR, crS, cfg, 4, pt1)
    assert "partition" in pt1.t.phases  # first query cracks
    pt2 = PhaseTimer()
    out2, crR2, crS2 = crk_join_cracked(crR, crS, cfg, 4, pt2)
    assert "partition" not in pt2.t.phases  # second query reuses
    assert crR2 is crR and crS2 is crS  # crack_to returned the same stores
    assert int(out1.matches) == int(out2.matches) == s.num_tuples
    assert int(out1.checksum) == int(out2.checksum)


def test_deeper_query_refines_incrementally():
    """A deeper query on a shallow-cracked store cracks only the missing
    levels (depth 2 -> 4: exactly 2 rounds per side)."""
    r, s = _workload()
    import math
    kb = max(1, math.ceil(math.log2(r.num_tuples))) + 1
    crR = crack_to(crack_relation(r, kb), 2)
    assert crR.depth == 2
    pt = PhaseTimer()
    crR2 = crack_to(crR, 4, pt)
    assert crR2.depth == 4
    assert "partition" in pt.t.phases  # the 2 missing rounds ran
    # and the refinement is real: grouped by top-4 bits now
    key = np.asarray(crR2.key)
    bucket = key >> (crR2.key_bits - 4)
    assert (np.diff(bucket) >= 0).all()


def test_windowed_materialize_multiset():
    """Windowed per-partition materialize must multiset-equal the global
    materialized join (holes keyed -3, chunked-table contract)."""
    import jax.numpy as jnp
    from aqp_tpu.ops.mergejoin import merge_join_materialize

    r, s = _workload()
    cfg = JoinConfig(materialize=True)
    import math
    kb = max(1, math.ceil(math.log2(r.num_tuples))) + 1
    out, _, _ = crk_join_cracked(
        crack_relation(r, kb), crack_relation(s, kb), cfg, 3)
    ref = merge_join_materialize(r.key, r.payload, s.key, s.payload,
                                 s.num_tuples)
    assert int(out.matches) == int(ref.matches) == s.num_tuples
    assert int(out.checksum) == int(ref.checksum)
    live = np.asarray(out.key) != -3
    assert live.sum() == s.num_tuples
    got = sorted(zip(np.asarray(out.key)[live].tolist(),
                     np.asarray(out.r_payload)[live].tolist(),
                     np.asarray(out.s_payload)[live].tolist()))
    want = sorted(zip(np.asarray(ref.key).tolist(),
                      np.asarray(ref.r_payload).tolist(),
                      np.asarray(ref.s_payload).tolist()))
    assert got == want


def test_npbc_chain_counts_duplicates():
    """NPBC's chain walk must count EVERY duplicate R key in a bucket —
    the semantic the open-addressing engines can't provide."""
    import jax.numpy as jnp
    from aqp_tpu.joins.api import run_join
    from aqp_tpu.ops.mergejoin import merge_join_count_general
    from aqp_tpu.relation import Relation

    rk = jnp.array([1, 1, 2, 3, 3, 3, 9], jnp.int32)
    rp = jnp.array([10, 11, 20, 30, 31, 32, 90], jnp.int32)
    sk = jnp.array([1, 3, 3, 4, 9, 2], jnp.int32)
    sp = jnp.array([100, 300, 301, 400, 900, 200], jnp.int32)
    ref = merge_join_count_general(rk, rp, sk, sp)
    res, _ = run_join(Relation(rk, rp), Relation(sk, sp), "NPBC_st")
    assert int(res.matches) == int(ref.matches) == 2 + 3 + 3 + 0 + 1 + 1
    assert int(res.checksum) == int(ref.checksum)


def test_mway_merge_path_levels():
    """The large-width merge tree (merge-path levels) must agree with the
    small-width bitonic tree and the oracle — including duplicate keys
    (tie interleaving must not drop or collide rows)."""
    import jax.numpy as jnp
    from aqp_tpu.joins import sortmerge
    from aqp_tpu.ops.mergejoin import merge_join_count

    r = create_relation_pk(1 << 11, seed=401)
    s = create_relation_fk(1 << 13, 1 << 11, seed=402)
    ref = merge_join_count(r.key, r.payload, s.key, s.payload)
    old = sortmerge._BITONIC_MAX_ELEMS
    try:
        sortmerge._BITONIC_MAX_ELEMS = 0  # force merge-path levels
        got, _ = sortmerge._mway_join.__wrapped__(
            r.key, r.payload, s.key, s.payload)
    finally:
        sortmerge._BITONIC_MAX_ELEMS = old
    assert int(got.matches) == int(ref.matches) == s.num_tuples
    assert int(got.checksum) == int(ref.checksum)
