"""Beyond-HBM streaming join: host-chunked probe side vs the in-memory
oracle (the EPC/cache-exceed regime's long-axis analog, SURVEY §5)."""

import numpy as np

from aqp_tpu.data import create_relation_pk, create_relation_fk
from aqp_tpu.ops.mergejoin import merge_join_count
from aqp_tpu.ops.streamjoin import chunk_host_relation, streaming_join_count


def test_streaming_join_matches_oracle():
    nr, ns = 1 << 12, 1 << 15
    r = create_relation_pk(nr, seed=301)
    s = create_relation_fk(ns, nr, seed=302)
    ref = merge_join_count(r.key, r.payload, s.key, s.payload)
    sk = np.asarray(s.key)
    sp = np.asarray(s.payload)
    # chunk size NOT dividing ns: exercises the short tail chunk
    m, ck = streaming_join_count(
        r, chunk_host_relation(sk, sp, 5000))
    assert m == int(ref.matches) == ns
    assert ck == int(ref.checksum)


def test_streaming_join_single_chunk_and_misses():
    """Probe keys outside R's domain must not match; one-chunk stream."""
    nr = 1 << 10
    r = create_relation_pk(nr, seed=311)
    sk = np.arange(nr // 2, nr * 2, dtype=np.int32) + 1  # half miss
    sp = np.ones_like(sk)
    m, ck = streaming_join_count(r, [(sk, sp)])
    expected = nr - nr // 2  # keys (nr//2+1)..nr exist; > nr miss
    assert m == expected
