"""Distributed join over the virtual 8-device CPU mesh: exact parity with
the single-device engine (the multi-device test net the reference lacks —
SURVEY.md §4)."""

import numpy as np
import pytest

from aqp_tpu.data import create_relation_pk, create_relation_fk, create_relation_zipf
from aqp_tpu.ops.mergejoin import merge_join_count
from aqp_tpu.parallel import make_mesh, dist_join_count


def test_dist_join_exact_parity():
    import jax

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    r = create_relation_pk(1 << 12, seed=11111)
    s = create_relation_fk(1 << 14, 1 << 12, seed=22222)
    ref = merge_join_count(r.key, r.payload, s.key, s.payload)
    mesh = make_mesh(8)
    m, ck, ovf_r, ovf_s = dist_join_count(r, s, mesh)
    assert int(ovf_r) == 0 and int(ovf_s) == 0
    assert int(m) == int(ref.matches) == s.num_tuples
    assert int(ck) == int(ref.checksum)


def test_dist_join_2d_hierarchical_parity():
    """2-axis (host × chip) mesh: the hierarchical DCN→ICI shuffle must give
    bit-identical counts/checksums to the single-device engine."""
    from aqp_tpu.parallel.mesh import make_mesh_2d
    from aqp_tpu.parallel.dist_join import dist_join_count_2d

    r = create_relation_pk(1 << 12, seed=31)
    s = create_relation_fk(1 << 14, 1 << 12, seed=32)
    ref = merge_join_count(r.key, r.payload, s.key, s.payload)
    mesh = make_mesh_2d(2, 4)
    m, ck, ovr, ovs = dist_join_count_2d(r, s, mesh)
    assert int(ovr) == 0 and int(ovs) == 0
    assert int(m) == int(ref.matches) == s.num_tuples
    assert int(ck) == int(ref.checksum)


def test_dist_join_materialize_parity():
    """Distributed materialize: sharded output columns must multiset-equal
    the single-device materialized join (nonzero payloads so routing is
    actually verified)."""
    import jax
    import jax.numpy as jnp
    from aqp_tpu.ops.mergejoin import merge_join_materialize
    from aqp_tpu.parallel.dist_join import dist_join_materialize
    from aqp_tpu.relation import Relation

    nr, ns = 1 << 11, 1 << 13
    r0 = create_relation_pk(nr, seed=41)
    s0 = create_relation_fk(ns, nr, seed=42)
    kr = jax.random.PRNGKey(7)
    r = Relation(r0.key, jax.random.randint(kr, (nr,), 1, 1 << 20, jnp.int32))
    s = Relation(s0.key, jax.random.randint(
        jax.random.PRNGKey(8), (ns,), 1, 1 << 20, jnp.int32))
    ref = merge_join_materialize(r.key, r.payload, s.key, s.payload, ns)
    mesh = make_mesh(8)
    m, ck, ok, orp, osp, ovf = dist_join_materialize(r, s, mesh)
    assert int(ovf) == 0
    assert int(m) == int(ref.matches) == ns
    assert int(ck) == int(ref.checksum)
    live = np.asarray(ok) >= 0
    assert int(live.sum()) == ns
    # multiset equality of (key, rp, sp) triples vs the reference output
    def trip(k, a, b):
        t = np.stack([np.asarray(k), np.asarray(a), np.asarray(b)], 1)
        return t[np.lexsort(t.T)]
    got = trip(np.asarray(ok)[live], np.asarray(orp)[live],
               np.asarray(osp)[live])
    want = trip(np.asarray(ref.key)[:ns], np.asarray(ref.r_payload)[:ns],
                np.asarray(ref.s_payload)[:ns])
    np.testing.assert_array_equal(got, want)


def test_dist_join_auto_escalates_on_skew():
    """Zipf z=1.5 overloads one destination bucket under every salt; the
    auto path must escalate to the skew tier and still return the exact
    count (closing shuffle.py's salted-retry promise)."""
    from aqp_tpu.parallel.dist_join import dist_join_count_auto

    nr, ns = 1 << 12, 1 << 14
    r = create_relation_pk(nr, seed=51)
    s = create_relation_zipf(ns, nr, 1.5, seed=52)
    ref = merge_join_count(r.key, r.payload, s.key, s.payload)
    mesh = make_mesh(8)
    m, ck, tier = dist_join_count_auto(r, s, mesh)
    assert m == int(ref.matches) == ns
    assert ck == int(ref.checksum)
    # the workload is engineered to need escalation; if the hash tier fit,
    # the test is vacuous — assert it didn't
    assert tier == "skew", tier


def test_dist_join_skewed_overflow_reported():
    """The shuffle's overflow counter must be EXACT, not merely non-zero:
    expected drops are computed host-side from the same hash + capacity
    math (per source shard, per destination bucket), so a capacity
    regression (silently larger or smaller buffers) fails this test —
    round-2 verdict flagged the earlier either-outcome version as vacuous."""
    import jax.numpy as jnp
    from aqp_tpu.ops.hashing import partition_hash

    nr, ns, n = 1 << 12, 1 << 14, 8
    r = create_relation_pk(nr)
    s = create_relation_zipf(ns, nr, 1.25)
    mesh = make_mesh(n)
    m, ck, ovf_r, ovf_s = dist_join_count(r, s, mesh)
    # replicate the pipeline's routing exactly: contiguous row split into
    # n source shards; per (source, dest) bucket capacity = ns/n/n*safety
    cap_s = max(8, int(ns / n / n * 2.0))
    dest = np.asarray(partition_hash(s.key, 3) % n)
    shard_rows = ns // n
    expected_drop = 0
    for src in range(n):
        d = dest[src * shard_rows:(src + 1) * shard_rows]
        cnt = np.bincount(d, minlength=n)
        expected_drop += int(np.maximum(cnt - cap_s, 0).sum())
    assert int(ovf_s) == expected_drop
    assert int(ovf_r) == 0  # R is a dense PK: near-uniform under the hash
    # dropped rows each lose exactly one match on this FK workload
    assert int(m) == s.num_tuples - expected_drop
    # the workload is engineered to overflow; if it fits, the test is vacuous
    assert expected_drop > 0


def test_dist_join_non_divisible_sizes():
    """Row counts NOT divisible by the device count: shard_relation pads
    with negative sentinel keys, which the pack step must drop — a padded
    S row must never phantom-match an R receive-buffer pad slot (round-2
    advisor finding)."""
    nr, ns = (1 << 12) - 3, (1 << 14) - 5
    r = create_relation_pk(nr, seed=61)
    s = create_relation_fk(ns, nr, seed=62)
    ref = merge_join_count(r.key, r.payload, s.key, s.payload)
    mesh = make_mesh(8)
    m, ck, ovf_r, ovf_s = dist_join_count(r, s, mesh)
    assert int(ovf_r) == 0 and int(ovf_s) == 0
    assert int(m) == int(ref.matches) == ns
    assert int(ck) == int(ref.checksum)


def test_dist_join_ring_parity():
    """Ring-rotation join (overlapped ppermute): exact parity with the
    single-device engine — no capacities, no overflow path at all."""
    from aqp_tpu.parallel.dist_join import dist_join_count_ring

    nr, ns = 1 << 12, 1 << 14
    r = create_relation_pk(nr, seed=71)
    s = create_relation_fk(ns, nr, seed=72)
    ref = merge_join_count(r.key, r.payload, s.key, s.payload)
    mesh = make_mesh(8)
    m, ck = dist_join_count_ring(r, s, mesh)
    assert int(m) == int(ref.matches) == ns
    assert int(ck) == int(ref.checksum)


def test_dist_join_ring_skew_immune():
    """The ring join never shuffles by key, so the zipf workload that
    overflows the hash shuffle (see test_dist_join_skewed_overflow_reported)
    is exact here — the skew-defeating property the overlap tier buys."""
    from aqp_tpu.parallel.dist_join import dist_join_count_ring

    nr, ns = 1 << 12, 1 << 14
    r = create_relation_pk(nr, seed=81)
    s = create_relation_zipf(ns, nr, 1.25, seed=82)
    ref = merge_join_count(r.key, r.payload, s.key, s.payload)
    mesh = make_mesh(8)
    m, ck = dist_join_count_ring(r, s, mesh)
    assert int(m) == int(ref.matches)
    assert int(ck) == int(ref.checksum)


def test_dist_join_ring_non_divisible():
    """Pad rows (key -1 on BOTH sides from shard_relation) must not
    phantom-match inside the ring body, which sees them raw (no shuffle
    pack drops them here)."""
    from aqp_tpu.parallel.dist_join import dist_join_count_ring

    nr, ns = (1 << 12) - 7, (1 << 14) - 3
    r = create_relation_pk(nr, seed=91)
    s = create_relation_fk(ns, nr, seed=92)
    ref = merge_join_count(r.key, r.payload, s.key, s.payload)
    mesh = make_mesh(8)
    m, ck = dist_join_count_ring(r, s, mesh)
    assert int(m) == int(ref.matches) == ns
    assert int(ck) == int(ref.checksum)


def test_dist_join_pallas_engine_cpu_mesh_parity():
    """Pallas-engine shard_map path on the CPU mesh (interpret mode): the
    vma typing of the pallas tier (lax.pvary re-typing in _local_count)
    must pass check_vma AND the counts must match the XLA tier exactly
    (ADVICE.md r3: never run the production multi-chip path with the
    replication check off)."""
    from aqp_tpu.parallel.dist_join import make_dist_join_count
    from aqp_tpu.parallel.mesh import shard_relation

    r = create_relation_pk(1 << 9, seed=424)
    s = create_relation_fk(1 << 11, 1 << 9, seed=525)
    ref = merge_join_count(r.key, r.payload, s.key, s.payload)
    mesh = make_mesh(8)
    R = shard_relation(r, mesh)
    S = shard_relation(s, mesh)
    fn = make_dist_join_count(mesh, R.num_tuples, S.num_tuples,
                              engine="pallas")
    m, ck, ovf_r, ovf_s = fn(R.key, R.payload, S.key, S.payload)
    assert int(ovf_r) == 0 and int(ovf_s) == 0
    assert int(m) == int(ref.matches) == s.num_tuples
    assert int(ck) == int(ref.checksum)
