"""Fused Tier-2 RHO pipeline vs XLA core, interpret mode (small blocks)."""

import numpy as np
import jax.numpy as jnp
import pytest

from aqp_tpu.ops.mergejoin import merge_join_count
from aqp_tpu.ops.pallas.radix_pipeline import rho_join_count_tier2


def _workload(nr, ns, seed=0, domain=None):
    rng = np.random.default_rng(seed)
    domain = domain or (4 * nr)
    rk = rng.choice(domain, nr, replace=False).astype(np.int32) + 1
    rp = rng.integers(0, 1 << 30, nr).astype(np.int32)
    sk = rng.integers(1, domain + 1, ns).astype(np.int32)
    sp = rng.integers(0, 1 << 30, ns).astype(np.int32)
    return map(jnp.asarray, (rk, rp, sk, sp))


@pytest.mark.parametrize("nr,ns", [(5000, 20000), (20000, 50000)])
def test_tier2_matches_xla_core(nr, ns):
    rk, rp, sk, sp = _workload(nr, ns)
    ref = merge_join_count(rk, rp, sk, sp)
    m, c, ovf = rho_join_count_tier2(rk, rp, sk, sp, sub1=128, sub2=128,
                                     interpret=True)
    assert int(ovf) == 0
    assert int(m) == int(ref.matches)
    assert int(c) == int(ref.checksum)


def test_tier2_fk_oracle():
    from aqp_tpu.data import create_relation_pk, create_relation_fk

    r = create_relation_pk(1 << 12)
    s = create_relation_fk(1 << 14, 1 << 12)
    m, c, ovf = rho_join_count_tier2(
        r.key, r.payload, s.key, s.payload, sub1=128, sub2=128, interpret=True
    )
    assert int(ovf) == 0
    assert int(m) == 1 << 14


def test_tier2_overflow_detected():
    # all S keys equal → one region overflows (sub=128 → region 16384 rows)
    rk = jnp.arange(1, 101, dtype=jnp.int32)
    rp = jnp.zeros(100, jnp.int32)
    sk = jnp.full((40000,), 50, jnp.int32)
    sp = jnp.zeros(40000, jnp.int32)
    m, c, ovf = rho_join_count_tier2(rk, rp, sk, sp, sub1=128, sub2=128,
                                     interpret=True)
    assert int(ovf) > 0  # must be reported, not silently wrong
