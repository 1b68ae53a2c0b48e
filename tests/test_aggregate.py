"""Group-by aggregate vs numpy oracle."""

import numpy as np
import jax.numpy as jnp

from aqp_tpu.ops.aggregate import groupby_aggregate, radix_sort_pairs


def test_groupby_matches_numpy():
    rng = np.random.default_rng(3)
    k = rng.integers(1, 300, 5000).astype(np.int32)
    v = rng.integers(0, 1000, 5000).astype(np.int32)
    res = groupby_aggregate(jnp.asarray(k), jnp.asarray(v), capacity=512)
    ng = int(res.num_groups)
    uk = np.unique(k)
    assert ng == len(uk)
    got_k = np.asarray(res.key)[:ng]
    assert np.array_equal(got_k, uk)
    for i, kk in enumerate(uk):
        sel = v[k == kk]
        assert int(np.asarray(res.count)[i]) == len(sel)
        assert int(np.asarray(res.sum)[i]) == int(sel.sum()) % (1 << 32)
        assert int(np.asarray(res.min)[i]) == int(sel.min())
        assert int(np.asarray(res.max)[i]) == int(sel.max())


def test_groupby_single_group():
    k = np.full(1000, 7, np.int32)
    v = np.arange(1000, dtype=np.int32)[::-1].copy()
    res = groupby_aggregate(jnp.asarray(k), jnp.asarray(v), capacity=8)
    assert int(res.num_groups) == 1
    assert int(res.key[0]) == 7 and int(res.count[0]) == 1000
    assert int(res.sum[0]) == 999 * 1000 // 2
    assert int(res.min[0]) == 0 and int(res.max[0]) == 999
    assert int(res.count[1]) == 0 and int(res.key[1]) == -3


def test_groupby_capacity_overflow_keeps_first_groups():
    # more distinct keys than capacity: the first `capacity` sorted groups
    # must still be exact (pos[capacity] = next-start of group capacity-1)
    k = np.arange(100, dtype=np.int32).repeat(3)
    v = np.ones(300, np.int32)
    res = groupby_aggregate(jnp.asarray(k), jnp.asarray(v), capacity=16)
    assert int(res.num_groups) == 100
    got_k = np.asarray(res.key)[:16]
    assert np.array_equal(got_k, np.arange(16))
    assert np.all(np.asarray(res.count)[:16] == 3)
    assert np.all(np.asarray(res.sum)[:16] == 3)


def test_radix_sort_pairs():
    rng = np.random.default_rng(4)
    k = rng.integers(0, 1 << 30, 10000).astype(np.int32)
    v = rng.integers(0, 1 << 30, 10000).astype(np.int32)
    sk, sv = radix_sort_pairs(jnp.asarray(k), jnp.asarray(v))
    order = np.argsort(k, kind="stable")
    assert np.array_equal(np.asarray(sk), k[order])
    # pair integrity: multiset of pairs preserved
    got = sorted(zip(np.asarray(sk).tolist(), np.asarray(sv).tolist()))
    exp = sorted(zip(k.tolist(), v.tolist()))
    assert got == exp
