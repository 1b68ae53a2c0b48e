"""Correctness tests for the v3 fixed-slot fused RHO pipeline (CPU,
interpret mode, small geometry)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aqp_tpu.ops.pallas.rho3 import Rho3Params, rho_join_count_v3

SMALL = Rho3Params(block_rows=64, slot_rows=8, f1=16, f2=4, kd_slot_rows=16)
# block_rows % 128 == 0 -> exercises the hybrid-layout network + MXU
# one-hot extraction path (the TPU production path)
HYBRID = Rho3Params(block_rows=128, slot_rows=8, f1=20, f2=4, kd_slot_rows=16)


def oracle_count_checksum(rk, rp, sk, sp):
    lut = {}
    for k, p in zip(rk.tolist(), rp.tolist()):
        lut[k] = p
    m = 0
    c = 0
    for k, p in zip(sk.tolist(), sp.tolist()):
        if k in lut:
            m += 1
            c = (c + lut[k] + p) & 0xFFFFFFFF
    return m, c


@pytest.mark.parametrize("prm", [SMALL, HYBRID], ids=["small", "hybrid"])
@pytest.mark.parametrize("nr,ns", [(1 << 12, 1 << 14), (5000, 17777)])
def test_rho3_fk_oracle(nr, ns, prm):
    rng = np.random.default_rng(7)
    rk = rng.permutation(nr).astype(np.int32) + 1  # dense PK 1..nr
    rp = rng.integers(0, 1 << 20, nr, dtype=np.int32)
    sk = np.concatenate([rng.permutation(nr) + 1 for _ in
                         range(-(-ns // nr))])[:ns].astype(np.int32)
    sp = rng.integers(0, 1 << 20, ns, dtype=np.int32)

    m, c, ovf = rho_join_count_v3(
        jnp.asarray(rk), jnp.asarray(rp), jnp.asarray(sk), jnp.asarray(sp),
        prm=prm, interpret=True)
    assert int(ovf) == 0
    em, ec = oracle_count_checksum(rk, rp, sk, sp)
    assert int(m) == em == ns
    assert int(c) == ec


def test_rho3_selective():
    """S keys partially outside R's domain -> partial matches."""
    rng = np.random.default_rng(3)
    nr, ns = 4096, 20000
    rk = rng.permutation(nr).astype(np.int32) + 1
    rp = rng.integers(0, 1 << 20, nr, dtype=np.int32)
    sk = rng.integers(1, 3 * nr, ns, dtype=np.int32)  # ~1/3 hit rate
    sp = rng.integers(0, 1 << 20, ns, dtype=np.int32)

    m, c, ovf = rho_join_count_v3(
        jnp.asarray(rk), jnp.asarray(rp), jnp.asarray(sk), jnp.asarray(sp),
        prm=SMALL, interpret=True)
    assert int(ovf) == 0
    em, ec = oracle_count_checksum(rk, rp, sk, sp)
    assert int(m) == em
    assert int(c) == ec


def test_rho3_skew_overflow_reported():
    """Extreme skew must overflow a slot and be reported, not silent."""
    nr, ns = 4096, 1 << 15
    rng = np.random.default_rng(5)
    rk = rng.permutation(nr).astype(np.int32) + 1
    rp = jnp.zeros((nr,), jnp.int32)
    sk = np.full(ns, 77, dtype=np.int32)  # all S on one key
    sp = jnp.zeros((ns,), jnp.int32)
    m, c, ovf = rho_join_count_v3(
        jnp.asarray(rk), rp, jnp.asarray(sk), sp, prm=SMALL, interpret=True)
    assert int(ovf) > 0


@pytest.mark.parametrize("prm", [SMALL, HYBRID], ids=["small", "hybrid"])
def test_rho3_materialize(prm):
    """Materialized output: every matched S row appears exactly once as
    (key, R payload, S payload); non-match slots carry the -3 sentinel."""
    from aqp_tpu.ops.pallas.rho3 import rho_join_materialize_v3

    rng = np.random.default_rng(11)
    nr, ns = 3000, 10000
    rk = rng.permutation(nr).astype(np.int32) + 1
    rp = rng.integers(1, 1 << 20, nr, dtype=np.int32)
    sk = rng.integers(1, 2 * nr, ns, dtype=np.int32)  # ~50% hit rate
    sp = rng.integers(1, 1 << 20, ns, dtype=np.int32)

    m, c, ok, orp, osp, ovf = rho_join_materialize_v3(
        jnp.asarray(rk), jnp.asarray(rp), jnp.asarray(sk), jnp.asarray(sp),
        prm=prm, interpret=True)
    assert int(ovf) == 0
    em, ec = oracle_count_checksum(rk, rp, sk, sp)
    assert int(m) == em
    assert int(c) == ec

    ok = np.asarray(ok)
    orp = np.asarray(orp)
    osp = np.asarray(osp)
    live = ok != -3
    assert live.sum() == em
    # multiset of output (key, rp, sp) triples == oracle join output
    lut = dict(zip(rk.tolist(), rp.tolist()))
    want = sorted((int(k), lut[int(k)], int(p))
                  for k, p in zip(sk, sp) if int(k) in lut)
    got = sorted(zip(ok[live].tolist(), orp[live].tolist(),
                     osp[live].tolist()))
    assert got == want
