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
