"""Merge-join core vs. numpy oracle and closed-form cardinality oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from aqp_tpu.data import (
    create_relation_pk,
    create_relation_fk,
    create_relation_fk_sel,
    create_relation_zipf,
)
from aqp_tpu.ops.mergejoin import (
    merge_join_count,
    merge_join_count_general,
    merge_join_materialize,
)


def numpy_join_oracle(rk, rp, sk, sp):
    """Exact reference join (hash map) for small inputs."""
    lut = {int(k): int(p) for k, p in zip(rk, rp)}
    matches = 0
    checksum = 0
    rows = []
    for k, p in zip(sk, sp):
        if int(k) in lut:
            matches += 1
            checksum = (checksum + lut[int(k)] + int(p)) % (1 << 32)
            rows.append((int(k), lut[int(k)], int(p)))
    return matches, checksum, rows


def test_fk_oracle_exact_cardinality():
    """FK workload ⇒ matches == |S| exactly (generator.cpp:143-152)."""
    r = create_relation_pk(1 << 12, seed=11111)
    s = create_relation_fk(1 << 14, 1 << 12, seed=22222)
    res = merge_join_count(r.key, r.payload, s.key, s.payload)
    assert int(res.matches) == s.num_tuples


def test_vs_numpy_oracle_random():
    rng = np.random.default_rng(0)
    rk = rng.permutation(5000).astype(np.int32) + 1
    rp = rng.integers(0, 1 << 30, 5000).astype(np.int32)
    sk = rng.integers(1, 12000, 20000).astype(np.int32)
    sp = rng.integers(0, 1 << 30, 20000).astype(np.int32)
    m, ck, rows = numpy_join_oracle(rk, rp, sk, sp)
    res = merge_join_count(jnp.asarray(rk), jnp.asarray(rp), jnp.asarray(sk), jnp.asarray(sp))
    assert int(res.matches) == m
    assert int(res.checksum) == ck


def test_materialize_matches_oracle():
    rng = np.random.default_rng(1)
    rk = rng.permutation(1000).astype(np.int32) + 1
    rp = rng.integers(0, 1000, 1000).astype(np.int32)
    sk = rng.integers(1, 3000, 4000).astype(np.int32)
    sp = rng.integers(0, 1000, 4000).astype(np.int32)
    m, ck, rows = numpy_join_oracle(rk, rp, sk, sp)
    res = merge_join_materialize(
        jnp.asarray(rk), jnp.asarray(rp), jnp.asarray(sk), jnp.asarray(sp), capacity=4096
    )
    assert int(res.matches) == m
    assert int(res.checksum) == ck
    got = sorted(
        zip(
            np.asarray(res.key)[:m].tolist(),
            np.asarray(res.r_payload)[:m].tolist(),
            np.asarray(res.s_payload)[:m].tolist(),
        )
    )
    assert got == sorted(rows)
    # invalid tail carries the non-joinable sentinel key
    assert np.all(np.asarray(res.key)[m:] == -3)
    assert np.all(np.asarray(res.r_payload)[m:] == 0)


def test_selectivity_oracle():
    """fk_sel ⇒ expected matches ≈ sel% · |S| (App.cpp:150-153)."""
    r = create_relation_pk(1 << 13)
    s = create_relation_fk_sel(1 << 13, 1 << 13, selectivity=50.0)
    res = merge_join_count(r.key, r.payload, s.key, s.payload)
    frac = int(res.matches) / s.num_tuples
    assert 0.45 < frac < 0.55


def test_zipf_keys_in_domain():
    s = create_relation_zipf(1 << 12, 1 << 10, 1.5)
    k = np.asarray(s.key)
    assert k.min() >= 1 and k.max() <= 1 << 10
    # skew: top key should be much more frequent than uniform
    _, counts = np.unique(k, return_counts=True)
    assert counts.max() > 5 * (len(k) / (1 << 10))


def test_general_join_with_duplicate_r_keys():
    rng = np.random.default_rng(2)
    rk = rng.integers(1, 500, 2000).astype(np.int32)  # duplicates in R
    rp = rng.integers(0, 1000, 2000).astype(np.int32)
    sk = rng.integers(1, 1500, 3000).astype(np.int32)
    sp = rng.integers(0, 1000, 3000).astype(np.int32)
    # oracle with multiplicity
    matches = 0
    checksum = 0
    from collections import defaultdict

    lut = defaultdict(list)
    for k, p in zip(rk, rp):
        lut[int(k)].append(int(p))
    for k, p in zip(sk, sp):
        for q in lut.get(int(k), ()):
            matches += 1
            checksum = (checksum + q + int(p)) % (1 << 32)
    res = merge_join_count_general(
        jnp.asarray(rk), jnp.asarray(rp), jnp.asarray(sk), jnp.asarray(sp)
    )
    assert int(res.matches) == matches
    assert int(res.checksum) == checksum
