"""64-bit key support (reference KEY_8B, data-types.h:6-12).

Engines must be dtype-generic: these workloads place keys ABOVE 2^32 and
include pairs that ALIAS under 32-bit truncation (k and k + 2^32), so any
engine that folds keys through 32 bits produces a wrong count — the
regression the round-2 verdict flagged (key64 was only ever used to
disable the fast path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aqp_tpu import run_join, JoinConfig
from aqp_tpu.relation import Relation


@pytest.fixture(scope="module", autouse=True)
def _x64():
    """int64 arrays need jax_enable_x64; scope it to this module so the
    int32 suite keeps its default promotion semantics."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)

NR = 1 << 10
NS = 1 << 12
HI = 1 << 40  # keys live above 2^32

# Engines exercised with sparse high keys.  CHT is dense-domain by design
# (bitmap indexed by key, as the reference CHT) and CRKJ cracks dense key
# bits — both get the dense-int64 test instead.
SPARSE_ALGS = ["RHO", "RHT", "RSM", "PHT", "NPO_st", "PSM", "MWAY", "NL",
               "INL"]


@pytest.fixture(scope="module")
def workload64():
    rng = np.random.default_rng(42)
    rk = (rng.permutation(NR).astype(np.int64) + 1) + HI
    rp = rng.integers(1, 1 << 20, NR).astype(np.int64)
    sk = rk[rng.integers(0, NR, NS)].astype(np.int64)
    # aliasing trap: R contains HI+1 but NOT (HI+1) + 2^32; these probes
    # must NOT match (32-bit truncation would make them match).
    sk[:16] = (HI + 1) + (1 << 32)
    sp = rng.integers(1, 1 << 20, NS).astype(np.int64)
    r = Relation(jnp.asarray(rk), jnp.asarray(rp))
    s = Relation(jnp.asarray(sk), jnp.asarray(sp))
    lut = dict(zip(rk.tolist(), rp.tolist()))
    matches = sum(1 for k in sk.tolist() if k in lut)
    checksum = sum((lut[k] + p) for k, p in zip(sk.tolist(), sp.tolist())
                   if k in lut) % (1 << 32)
    return r, s, matches, checksum


@pytest.mark.parametrize("alg", SPARSE_ALGS)
def test_key64_sparse_high_keys(workload64, alg):
    r, s, matches, checksum = workload64
    res, _ = run_join(r, s, alg, JoinConfig(key64=True))
    assert int(res.matches) == matches, f"{alg}: wrong count under int64"
    assert int(res.checksum) == checksum, f"{alg}: wrong checksum"


@pytest.mark.parametrize("alg", ["CHT", "CRKJ"])
def test_key64_dense_domain(alg):
    """Dense-domain engines under the int64 dtype (small key values)."""
    rng = np.random.default_rng(7)
    rk = (rng.permutation(NR).astype(np.int64) + 1)
    rp = rng.integers(1, 1 << 20, NR).astype(np.int64)
    sk = rk[rng.integers(0, NR, NS)].astype(np.int64)
    sp = rng.integers(1, 1 << 20, NS).astype(np.int64)
    r = Relation(jnp.asarray(rk), jnp.asarray(rp))
    s = Relation(jnp.asarray(sk), jnp.asarray(sp))
    res, _ = run_join(r, s, alg, JoinConfig(key64=True))
    assert int(res.matches) == NS
    lut = dict(zip(rk.tolist(), rp.tolist()))
    checksum = sum((lut[k] + p)
                   for k, p in zip(sk.tolist(), sp.tolist())) % (1 << 32)
    assert int(res.checksum) == checksum


def test_key64_materialize():
    rng = np.random.default_rng(9)
    rk = (rng.permutation(NR).astype(np.int64) + 1) + HI
    rp = rng.integers(1, 1 << 20, NR).astype(np.int64)
    sk = rk[rng.integers(0, NR, NS)].astype(np.int64)
    sp = rng.integers(1, 1 << 20, NS).astype(np.int64)
    r = Relation(jnp.asarray(rk), jnp.asarray(rp))
    s = Relation(jnp.asarray(sk), jnp.asarray(sp))
    res, _ = run_join(r, s, "RHO", JoinConfig(key64=True, materialize=True))
    assert int(res.matches) == NS
    allk = np.asarray(res.key)
    live = allk != -3
    assert int(live.sum()) == NS
    lut = dict(zip(rk.tolist(), rp.tolist()))
    assert np.array_equal(np.asarray(res.r_payload)[live],
                          np.vectorize(lut.get)(allk[live]))
