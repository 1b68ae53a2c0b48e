"""Routed Pallas aggregate vs the XLA aggregate oracle (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from aqp_tpu.ops.aggregate import groupby_aggregate
from aqp_tpu.ops.pallas.aggpipe import HOLE, groupby_aggregate_routed
from aqp_tpu.ops.pallas.rho3 import Rho3Params

PRM = Rho3Params(block_rows=64, slot_rows=16, f1=6, f2=4,
                 kd_slot_rows=32)


def _dense(res, cap):
    """(key -> (count, sum, min, max)) for live slots."""
    out = {}
    k = np.asarray(res.key)
    for i in range(cap):
        if k[i] != HOLE and k[i] != -3:
            out[int(k[i])] = (int(res.count[i]), int(res.sum[i]),
                              int(res.min[i]), int(res.max[i]))
    return out


@pytest.mark.parametrize("n,ngroups", [(1 << 13, 64), (1 << 14, 1000),
                                       ((1 << 13) + 321, 17)])
def test_routed_aggregate_oracle(n, ngroups):
    rng = np.random.default_rng(5)
    key = rng.integers(0, ngroups, n).astype(np.int32) * 3  # sparse keys
    val = rng.integers(-1000, 1000, n).astype(np.int32)
    cap = 4096
    ref = groupby_aggregate(jnp.asarray(key), jnp.asarray(val), cap)
    got = groupby_aggregate_routed(jnp.asarray(key), jnp.asarray(val), cap,
                                   prm=PRM, interpret=True)
    assert int(got.num_groups) == int(ref.num_groups)
    dref = _dense(ref, cap)
    dgot = _dense(got, cap)
    assert dref.keys() == dgot.keys()
    for k in dref:
        assert dref[k] == dgot[k], (k, dref[k], dgot[k])
    # group keys sorted ascending among live slots
    keys = [k for k in np.asarray(got.key) if k != HOLE]
    # remove trailing/boundary holes already; check monotonic
    ks = [k for k in keys]
    assert ks == sorted(ks)


def test_routed_aggregate_holes_dropped():
    rng = np.random.default_rng(8)
    n = 1 << 13
    key = rng.integers(0, 50, n).astype(np.int32)
    val = rng.integers(0, 100, n).astype(np.int32)
    holes = rng.random(n) < 0.4
    key_h = np.where(holes, -3, key).astype(np.int32)
    ref = groupby_aggregate(jnp.asarray(np.where(holes, -3, key)),
                            jnp.asarray(val), 8192)
    got = groupby_aggregate_routed(jnp.asarray(key_h), jnp.asarray(val),
                                   8192, prm=PRM, interpret=True)
    # ref groups the holes under key -3; routed drops them
    assert int(got.num_groups) == int(ref.num_groups) - 1
    dref = _dense(ref, 8192)
    dref.pop(-3, None)
    assert _dense(got, 8192) == dref


def test_routed_auto_low_cardinality_jitter():
    """Jittered routing: low-cardinality aggregates (massive per-key
    duplicate mass) split into pseudo-groups and recombine exactly."""
    import numpy as np
    import jax.numpy as jnp
    from aqp_tpu.ops.pallas.aggpipe import groupby_aggregate_routed_auto

    rng = np.random.default_rng(3)
    n = 1 << 14
    k = 8
    key = rng.integers(0, k, n).astype(np.int32)
    val = rng.integers(-1000, 1000, n).astype(np.int32)
    cap = 512  # -> jitter = 64
    g = groupby_aggregate_routed_auto(jnp.asarray(key), jnp.asarray(val),
                                      cap, interpret=True)
    assert int(g.num_groups) == k
    gk = np.asarray(g.key)
    live = gk != -3
    order = np.argsort(gk[live])
    gkl = gk[live][order]
    np.testing.assert_array_equal(gkl, np.arange(k))
    for i, kk in enumerate(gkl):
        m = key == kk
        j = np.nonzero(live)[0][order][i]
        assert int(g.count[j]) == int(m.sum())
        assert int(g.sum[j]) == int(np.uint32(val[m].astype(np.int64).sum()
                                             & 0xFFFFFFFF))
        assert int(g.min[j]) == int(val[m].min())
        assert int(g.max[j]) == int(val[m].max())
