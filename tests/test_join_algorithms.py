"""Cross-algorithm consistency: all registered join algorithms must agree
with the closed-form oracle and with each other (the reference's de-facto
integration test — SURVEY.md §4.2: runs across 13 algorithms must agree)."""

import numpy as np
import pytest

from aqp_tpu import run_join, JoinConfig, JOIN_ALGORITHMS
from aqp_tpu.data import create_relation_pk, create_relation_fk, create_relation_zipf

NR = 1 << 12
NS = 1 << 14

ALL_ALGS = sorted(JOIN_ALGORITHMS)


@pytest.fixture(scope="module")
def workload():
    """Reference workload shape but with RANDOM payloads: the reference
    generators leave payloads zero (generator.cpp writes keys only), which
    makes checksum assertions vacuous — non-zero payloads make the checksum
    actually verify payload ROUTING through every probe path."""
    import jax.numpy as jnp
    from aqp_tpu.relation import Relation

    rng = np.random.default_rng(99)
    r = create_relation_pk(NR, seed=11111)
    s = create_relation_fk(NS, NR, seed=22222)
    r = Relation(key=r.key, payload=jnp.asarray(
        rng.integers(1, 1 << 20, NR, dtype=np.int32)))
    s = Relation(key=s.key, payload=jnp.asarray(
        rng.integers(1, 1 << 20, NS, dtype=np.int32)))
    return r, s


@pytest.fixture(scope="module")
def expected_checksum(workload):
    r, s = workload
    rk = np.asarray(r.key)
    rp = np.asarray(r.payload)
    sk = np.asarray(s.key)
    sp = np.asarray(s.payload)
    lut = dict(zip(rk.tolist(), rp.tolist()))
    ck = 0
    for k, p in zip(sk.tolist(), sp.tolist()):
        ck = (ck + lut[k] + p) % (1 << 32)
    return ck


@pytest.mark.parametrize("alg", ALL_ALGS)
def test_algorithm_exact_count_and_checksum(workload, expected_checksum, alg):
    r, s = workload
    res, t = run_join(r, s, alg, JoinConfig())
    assert int(res.matches) == NS, f"{alg}: wrong cardinality"
    assert int(res.checksum) == expected_checksum, f"{alg}: wrong checksum"
    assert t.phases.get("total", 0) > 0


@pytest.mark.parametrize("alg", ["RHO", "PHT", "PSM", "CHT"])
def test_algorithm_materialize(workload, alg):
    r, s = workload
    if alg == "CHT":
        pass
    res, _ = run_join(r, s, alg, JoinConfig(materialize=True))
    if res.key is None:
        pytest.skip(f"{alg} has no materialize path")
    m = int(res.matches)
    assert m == NS
    rk = np.asarray(r.key)
    rp = np.asarray(r.payload)
    lut = dict(zip(rk.tolist(), rp.tolist()))
    # chunked output contract: live rows are key != -3 (holes may be a
    # dense tail OR region-chunked, see JoinResult docstring)
    allk = np.asarray(res.key)
    live = allk != -3
    assert int(live.sum()) == m
    k = allk[live]
    rpay = np.asarray(res.r_payload)[live]
    # every output row's r_payload must be the build row's payload
    assert np.array_equal(rpay, np.vectorize(lut.get)(k))


@pytest.mark.parametrize("alg", ["RHO", "PHT"])
def test_skewed_workload(alg):
    """Zipf z=1.5 workload (skew study, paper-revision-9-skew.py)."""
    r = create_relation_pk(NR)
    s = create_relation_zipf(NS, NR, 1.5)
    res, _ = run_join(r, s, alg, JoinConfig())
    assert int(res.matches) == NS  # all Zipf keys are in {1..NR}


def test_unknown_algorithm_raises(workload):
    r, s = workload
    with pytest.raises(ValueError, match="Algorithm not found"):
        run_join(r, s, "NOPE")
