"""Dense-PK fast path (joins/dense.py) + deferred dispatch contract."""

import jax
import jax.numpy as jnp
import numpy as np

from aqp_tpu.config import JoinConfig
from aqp_tpu.data import create_relation_fk, create_relation_fk_sel, \
    create_relation_pk
from aqp_tpu.joins.api import finalize_join, run_join
from aqp_tpu.joins.dense import _dense_proof, dense_pk_join
from aqp_tpu.ops.mergejoin import merge_join_count
from aqp_tpu.relation import Relation


def test_dense_proof_accepts_and_rejects():
    r = create_relation_pk(1 << 10, seed=7)
    assert _dense_proof(r.key)
    hole = r.key.at[17].set(jnp.int32(1 << 20))  # not dense anymore
    assert not _dense_proof(hole)
    dup = r.key.at[17].set(r.key[18])  # duplicate: sum/max could fool,
    assert not _dense_proof(dup)       # sorted-equality cannot


def test_dense_join_exact_vs_oracle():
    nr, ns = 1 << 10, 1 << 13
    r0 = create_relation_pk(nr, seed=70)
    s = create_relation_fk_sel(ns, nr, 50.0, seed=71)
    r = Relation(r0.key, jax.random.randint(
        jax.random.PRNGKey(5), (nr,), 1, 1 << 20, jnp.int32))
    ref = merge_join_count(r.key, r.payload, s.key, s.payload)
    out = dense_pk_join(r, s, JoinConfig())
    assert out is not None
    res, _ = out
    assert int(res.matches) == int(ref.matches)
    assert int(res.checksum) == int(ref.checksum)
    # materialized: multiset equality of live rows
    res_m, _ = dense_pk_join(r, s, JoinConfig(materialize=True))
    k, a, b = map(np.asarray, (res_m.key, res_m.r_payload, res_m.s_payload))
    live = k != -3
    assert live.sum() == int(ref.matches)
    # every live row's r_payload is the payload of its key in R
    pk = np.asarray(r.key)
    pp = np.asarray(r.payload)
    lut = np.zeros(nr + 1, np.int64)
    lut[pk] = pp
    np.testing.assert_array_equal(a[live], lut[k[live]])


def test_dense_join_refuses_nondense():
    nr, ns = 1 << 10, 1 << 12
    r = create_relation_pk(nr, seed=72)
    r = Relation(r.key + 5, r.payload)  # shifted: not {1..n}
    s = create_relation_fk(ns, nr, seed=73)
    assert dense_pk_join(r, s, JoinConfig()) is None


def test_rho_small_r_uses_dense_and_matches():
    nr, ns = 1 << 10, 1 << 13
    r = create_relation_pk(nr, seed=74)
    s = create_relation_fk(ns, nr, seed=75)
    res, t = run_join(r, s, "RHO", JoinConfig())
    assert t.matches == ns


def test_deferred_dispatch_and_finalize():
    nr, ns = 1 << 10, 1 << 13
    r = create_relation_pk(nr, seed=76)
    s = create_relation_fk(ns, nr, seed=77)
    cfg = JoinConfig(defer=True)
    res, t = run_join(r, s, "RHO", cfg)
    assert t.matches == -1  # no host sync happened inside run_join
    res, t = finalize_join(r, s, res, t, "RHO", cfg)
    assert t.matches == ns
