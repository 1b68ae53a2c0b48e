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


def test_dist_join_skewed_overflow_reported():
    """Zipf z=1.5: the hash shuffle must either fit (good hash spreads
    distinct keys) or report overflow honestly."""
    r = create_relation_pk(1 << 12)
    s = create_relation_zipf(1 << 14, 1 << 12, 1.25)
    mesh = make_mesh(8)
    m, ck, ovf_r, ovf_s = dist_join_count(r, s, mesh)
    # heavy hitters all go to one shard: with default safety=2 the S side may
    # overflow; the count must then be < |S| and overflow must be non-zero —
    # never a silent wrong answer.
    if int(ovf_s) == 0:
        assert int(m) == s.num_tuples
    else:
        assert int(m) < s.num_tuples
